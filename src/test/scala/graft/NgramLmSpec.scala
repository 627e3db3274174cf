package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NgramLm

class NgramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("positionedWithContext truncates context at doc start") {
    val d = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val p = NgramLm.positionedWithContext(d, "doc_id", "text")
      .orderBy("pos")
      .collect().map(r => (r.getInt(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4))))
    assert(p === Array(
      (0, "a", None, None),
      (1, "b", Some("a"), None),
      (2, "c", Some("b"), Some("a")),
      (3, "d", Some("c"), Some("b"))))
  }

  test("backoff picks the highest order with a nonzero count; OOV " +
      "falls to (0, N)") {
    val lm = Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF(
      "doc_id", "text") // N=6; c(the cat)=2, c(the cat sat)=1, c(cat)=2
    val scored = Seq((10L, "the cat sat"), (11L, "a cat sat"),
      (12L, "zebra")).toDF("doc_id", "text")
    val rows = NgramLm.backoffPositions(scored, lm, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 10: pos0 uni(the: c=2, N=6); pos1 bi(the cat: 2 / the: 2);
    //         pos2 tri(the cat sat: 1 / the cat: 2)
    assert(rows((10L, 0)) == ((1L, 2L, 6L)))
    assert(rows((10L, 1)) == ((2L, 2L, 2L)))
    assert(rows((10L, 2)) == ((3L, 1L, 2L)))
    // doc 11: pos0 'a' OOV -> (1, 0, 6); pos1 'cat' after 'a': no bigram
    //         (a cat) -> uni(cat)=2; pos2 'sat' after (a cat): no trigram,
    //         bigram (cat sat)=1 with den c(cat)=2
    assert(rows((11L, 0)) == ((1L, 0L, 6L)))
    assert(rows((11L, 1)) == ((1L, 2L, 6L)))
    assert(rows((11L, 2)) == ((2L, 1L, 2L)))
    // doc 12: single OOV token
    assert(rows((12L, 0)) == ((1L, 0L, 6L)))
  }

  test("backoffDocStats aggregates exactly and is partitioning-invariant") {
    val docs = (0 until 60).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${(i * j) % 19}").mkString(" ")))
      .toDF("doc_id", "text")
    val lm = docs.filter(col("doc_id") % 2 === 0)
    val a = NgramLm.backoffDocStats(docs.repartition(1), lm, "doc_id",
      "text").collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val b = NgramLm.backoffDocStats(docs.repartition(7), lm, "doc_id",
      "text").collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(a == b)
    assert(a.size == 60)
    // every doc's per-order counts sum to its position count
    a.values.foreach { v =>
      val Seq(nPos, nTri, nBi, nUni, _, _) = v.map(_.asInstanceOf[Long])
      assert(nPos == nTri + nBi + nUni)
    }
  }

  test("lmFitScores: exact floor(1e6·n_tri/n_pos) lattice, including the " +
      "power-of-two denominators where 6-dp rounding would tie") {
    val docs = (0 until 40).map(i =>
      (i.toLong, (0 until 128 + i).map(j => s"w${(i + j) % 11}")
        .mkString(" "))).toDF("doc_id", "text")
    val lm = docs.filter(col("doc_id") % 2 === 0)
    val rows = NgramLm.lmFitScores(docs, lm, "doc_id", "text")
      .select("doc_id", "n_pos", "n_tri", "lm_fit_ppm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nPos, nTri, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ppm == nTri * 1000000L / nPos, // exact integer reference
        s"doc ${r.getLong(0)}: ppm $ppm != ${nTri * 1000000L / nPos}")
    }
  }

  test("collocations: a glued pair is flagged, an independent pair is " +
      "not, and lift matches the integer reference") {
    // Engineered counts in one doc (N = 49): "new york" glued — c2=4,
    // cx=cy=4, lift = 4·49/16 = 12.25; "the cat" adjacent 3 times but
    // both words occur 10 times — lift = 3·49/100 = 1.47 < 2.
    val text = ((1 to 4).map(i => s"new york a$i") ++
      (1 to 3).map(i => s"the cat b$i") ++
      (1 to 7).map(i => s"the c$i") ++
      (1 to 7).map(i => s"cat d$i")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = NgramLm.collocations(docs, "doc_id", "text",
      minCount = 3L, liftNum = 2L, liftDen = 1L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.contains(("new", "york")))
    val (cp, cl, cr, lift) = got(("new", "york"))
    assert(cp == 4L && cl == 4L && cr == 4L)
    assert(lift == 1000000L * 4L * 49L / 16L)
    assert(!got.contains(("the", "cat")),
      "frequent-but-independent pair must fail the lift test")
  }

  test("collocationsFromCounts over a unified count relation equals the " +
      "direct corpus form (the stream-maintained path)") {
    val docs = (1L to 20L).map(i =>
      (i, (1 to 30).map(j => s"t${(i + j * 3) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    val direct = NgramLm.collocations(docs, "doc_id", "text", 2L, 1L, 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5))).toSet
    val viaCounts = NgramLm.collocationsFromCounts(
      NgramLm.countsUnified(docs, "doc_id", "text"), 2L, 1L, 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5))).toSet
    assert(direct.nonEmpty && direct == viaCounts)
  }
}
