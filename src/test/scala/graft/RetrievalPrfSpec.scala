package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

class RetrievalPrfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("prfExpand: feedback set = top-fbK by (rounded bm25, id), " +
      "query terms excluded, candidates ranked (df, tf, term)") {
    val docs = Seq(
      (1L, "q q q alpha beta"),     // strongest match
      (2L, "q alpha gamma"),        // same score as d3, id breaks tie
      (3L, "q beta gamma"),
      (4L, "delta epsilon"))        // no match — never in feedback
      .toDF("doc_id", "text")
    val got = Curation.prfExpand(docs, "doc_id", "text", Seq("q"),
        fbK = 2, nExpand = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // feedback = {d1, d2}: alpha df=2 tf=2; beta/gamma df=1 -> term asc
    assert(got == Seq(("alpha", 2L, 2L), ("beta", 1L, 1L)), s"got $got")
  }

  test("prfExpand: expansion never echoes a query term even when it " +
      "dominates the feedback set") {
    val docs = Seq((1L, "q q q q"), (2L, "q q x")).toDF("doc_id", "text")
    val got = Curation.prfExpand(docs, "doc_id", "text", Seq("q"),
        fbK = 2, nExpand = 5).collect().map(_.getString(0)).toSeq
    assert(got == Seq("x"))
  }

  test("gazetteerTag: multi-token exact matches with count and first " +
      "position, misses absent, empty-gazetteer refusal") {
    val docs = Seq(
      (1L, "the new york city of new york is big"),
      (2L, "paris and new yorkshire"),     // substring must NOT match
      (3L, "paris paris paris"))
      .toDF("doc_id", "text")
    val gaz = Seq(("NYC", "new york"), ("PAR", "paris"))
      .toDF("entity", "phrase")
    val got = Curation.gazetteerTag(docs, "doc_id", "text", gaz,
        "entity", "phrase").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getInt(2), r.getInt(3)))).toMap
    assert(got((1L, "NYC")) == ((2, 2)))   // starts at tokens 2 and 6
    assert(got((3L, "PAR")) == ((3, 1)))
    assert(got((2L, "PAR")) == ((1, 1)))
    assert(!got.contains((2L, "NYC")), "token match, not substring")
    assert(got.size == 3)
    // null and whitespace-only phrases match nowhere (a "  " phrase
    // would otherwise bucket under the "" token and hit docs with
    // consecutive spaces)
    val junk = gaz.unionByName(Seq(("WS", "   "),
      ("NUL", null.asInstanceOf[String])).toDF("entity", "phrase"))
    val docsWs = docs.unionByName(
      Seq((4L, "double  space  here")).toDF("doc_id", "text"))
    val got2 = Curation.gazetteerTag(docsWs, "doc_id", "text", junk,
        "entity", "phrase").collect().map(_.getString(1)).toSet
    assert(!got2.contains("WS") && !got2.contains("NUL"), s"$got2")
    intercept[IllegalArgumentException] {
      Curation.gazetteerTag(docs, "doc_id", "text",
        gaz.filter(col("entity") === "NONE"), "entity", "phrase")
    }
  }

  test("gazetteerTag: tab/newline whitespace tokenizes like spaces " +
      "on BOTH sides, and caseFold folds both sides") {
    // round-15 split the doc on single spaces: "new\nyork" became one
    // pseudo-token and an exactly-occurring phrase silently missed
    val docs = Seq(
      (1L, "the new\tyork   skyline at\nnew york"),
      (2L, "NEW YORK in caps"))
      .toDF("doc_id", "text")
    val gaz = Seq(("NYC", "new york"), ("TABBED", "new\tyork"))
      .toDF("entity", "phrase")
    val got = Curation.gazetteerTag(docs, "doc_id", "text", gaz,
        "entity", "phrase").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getInt(2), r.getInt(3)))).toMap
    // both phrase spellings tokenize to [new, york]; doc 1 positions
    // in its \s+ token stream: [the,new,york,skyline,at,new,york]
    assert(got((1L, "NYC")) == ((2, 2)), s"$got")
    assert(got((1L, "TABBED")) == ((2, 2)), s"$got")
    assert(!got.contains((2L, "NYC")), "case-sensitive by default")
    val folded = Curation.gazetteerTag(docs, "doc_id", "text", gaz,
        "entity", "phrase", caseFold = true).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(folded.contains((2L, "NYC")), s"$folded")
    assert(folded.contains((1L, "NYC")), s"$folded")
  }

  test("snippets: earliest max-hit window, short docs clamp, " +
      "misses absent") {
    val docs = Seq(
      (1L, "a b Q c d Q Q e f g h"),   // best 3-hit window
      (2L, "x y z"),                    // no hits -> absent
      (3L, "Q q"))                      // short doc, case-folded
      .toDF("doc_id", "text")
    val got = Curation.snippets(docs, "doc_id", "text", Seq("q"),
        window = 4).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
        r.getString(3)))).toMap
    // windows of 4: [3..6]="q c d q" 2 hits, [4..7]="c d q q" 2,
    // [6..9]? positions 6,7 are q,q -> window starting 6: "q q e f"
    // 2 hits... earliest max: start 3
    assert(got(1L)._1 == 3 && got(1L)._2 == 2, s"got ${got(1L)}")
    assert(got(3L) == ((1, 2, "q q")))
    assert(!got.contains(2L))
  }

  test("mmrSelect: relevance-first seed, diversity penalty reorders, " +
      "deterministic ties, lambda/zero-norm guards") {
    import graft.operators.Similarity
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)),          // zero norm: excluded
      (1L, Seq(1.0, 0.0)),          // rel 1.0 -> seed
      (2L, Seq(3.0, 4.0)),          // rel 0.6, cos to v1 = 0.6
      (3L, Seq(0.0, 1.0)))          // rel 0.0, cos to v1 = 0.0
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(vecs, "vec_id", "embedding",
        Array(1.0, 0.0), k = 3).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toSeq
      .sortBy(_._1)
    // pick 1: v2 score .5*.6-.5*.6 = 0; v3 score .5*0-.5*0 = 0 ->
    // tie, smaller id wins. pick 2: v3 smax = cos(v3,v2) = 0.8
    assert(got(0) == ((0, (1L, 1.0))))
    assert(got(1) == ((1, (2L, 0.0))))
    assert(got(2)._2._1 == 3L && math.abs(got(2)._2._2 + 0.4) < 1e-12)
    intercept[IllegalArgumentException] {
      Similarity.mmrSelect(vecs, "vec_id", "embedding",
        Array(1.0, 0.0), k = 2, lambda = 0.7)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrSelect(vecs, "vec_id", "embedding",
        Array(0.0, 0.0), k = 2)
    }
  }
}
