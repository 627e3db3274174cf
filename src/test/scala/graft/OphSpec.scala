package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns
import graft.operators.Dedup

class OphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 16

  /** Definitional reference: one permutation-0 hash per shingle, min per
    * (h mod k) bucket, rotation densification with distance·p offset.
    */
  private def ref(text: String, shingleN: Int): Seq[Long] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
      .filter(_.nonEmpty)
    val shingles =
      if (toks.isEmpty) Seq("")
      else if (toks.length < shingleN) Seq(toks.mkString(" "))
      else toks.sliding(shingleN).map(_.mkString(" ")).toSeq
    val mins = Array.fill(K)(Long.MaxValue)
    shingles.foreach { s =>
      val h = TextFns.minhashPerm(0, TextFns.polyHash(s))
      val b = (h % K).toInt
      if (h < mins(b)) mins(b) = h
    }
    (0 until K).map { j =>
      if (mins(j) != Long.MaxValue) mins(j)
      else {
        var t = 1
        while (mins((j + t) % K) == Long.MaxValue) t += 1
        mins((j + t) % K) + t.toLong * TextFns.HashP
      }
    }
  }

  test("signatures match the definitional reimplementation, including " +
      "densified buckets") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running",
      "one two", "single", "", "x y z x y z x y z")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.ophSignatures(docs, "doc_id", "text", 2, K).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = ref(t, 2)
      (0 until K).foreach { j =>
        assert(got((i.toLong, j.toLong)) == want(j), s"doc $i bucket $j")
      }
    }
    // short docs necessarily densify: "one two" has 1 shingle → 15 of 16
    // buckets borrowed, all present
    assert((0 until K).forall(j => got.contains((1L, j.toLong))))
  }

  test("identical docs collide on all k entries; disjoint docs on none") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    val docs = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    val sigs = Dedup.ophSignatures(docs, "doc_id", "text", 2, K)
    val pairs = Dedup.ophMatchPairs(sigs, minMatch = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == K.toLong)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("match count tracks resemblance: small edit keeps most entries") {
    val base = (1 to 60).map(j => s"w${(j * 7) % 53}").mkString(" ")
    val edited = base.replace("w14", "CHANGED")
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val sigs = Dedup.ophSignatures(docs, "doc_id", "text", 2, K)
    val m = Dedup.ophMatchPairs(sigs, minMatch = 1L).collect()
    assert(m.length == 1)
    val n = m.head.getLong(2)
    assert(n >= K / 2 && n < K.toLong, s"n_match $n implausible for a " +
      "small edit")
  }

  test("containment flags a short doc quoted inside a long one where " +
      "Jaccard reads low") {
    val short = (1 to 20).map(j => s"quote$j").mkString(" ")
    val long = (1 to 100).map(j => s"body$j").mkString(" ") + " " + short
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val r = Dedup.containmentOnPairs(pairs, docs, "doc_id", "text",
      shingleN = 2, num = 4L, den = 5L).head()
    // short doc: 19 bigrams, all inside long (plus the stitch bigram)
    assert(r.getLong(2) == 19L && r.getLong(3) == 19L)
    assert(r.getLong(5) == 1L, "containment must flag the quote")
    val j = Dedup.jaccardOnPairs(pairs, docs, "doc_id", "text", 2).head()
    assert(j.getDouble(4) < 0.2, "Jaccard misses what containment flags")
  }

  test("containment matches manual distinct-shingle set arithmetic") {
    val a = "p q r s t"
    val b = "x y p q r z"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val r = Dedup.containmentOnPairs(pairs, docs, "doc_id", "text",
      shingleN = 2, num = 1L, den = 2L).head()
    // a bigrams: {p q, q r, r s, s t}; b: {x y, y p, p q, q r, r z};
    // inter = {p q, q r} = 2; min = 4; 2*2 >= 1*4 → contained
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((2L, 4L, 5L, 1L)))
  }

  test("multiset minhash separates repetition that set minhash cannot " +
      "see, and matches the definitional reference") {
    import graft.functions.TextFns
    val once = "the boiler plate line"
    val many = Array.fill(30)(once).mkString(" ")
    val docs = Seq((1L, once), (2L, many)).toDF("doc_id", "text")
    def sigsOf(f: org.apache.spark.sql.expressions.UserDefinedFunction) =
      docs.select(col("doc_id"),
        f(TextFns.tokens(lower(col("text")))).as("s")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val set = sigsOf(TextFns.minhashSigUdf(2, 16))
    val bag = sigsOf(TextFns.multisetMinhashSigUdf(2, 16))
    // set minhash: "many" has extra stitch shingles but is dominated by
    // the same elements; bag minhash sees 30 distinct occurrences
    assert(set(1L) != bag(1L) || set(2L) != bag(2L))
    val bagAgree = bag(1L).zip(bag(2L)).count { case (a, b) => a == b }
    val setAgree = set(1L).zip(set(2L)).count { case (a, b) => a == b }
    assert(bagAgree < setAgree,
      s"bag minhash ($bagAgree/16) must separate repetition more than " +
        s"set minhash ($setAgree/16)")
    // definitional reference for doc 1 (4 tokens → 3 bigrams, each once)
    val toks = once.split(" ").toSeq
    val want = (0 until 16).map { i =>
      toks.sliding(2).map(_.mkString(" ")).map(s =>
        TextFns.minhashPerm(i,
          (TextFns.polyHash(s) * 31L + 1L) % TextFns.HashP)).min
    }
    assert(bag(1L) == want)
  }

  test("simhash Hamming-ball pairs: complete vs brute force, blanks " +
      "excluded") {
    import graft.functions.TextFns
    val base = (1 to 80).map(j => s"word${(j * 11) % 61}").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base),                               // exact dup → hamming 0
      (3L, base.replace("word11", "swapped")),  // small edit
      (4L, (1 to 80).map(j => s"other${(j * 7) % 59}").mkString(" ")),
      (5L, ""), (6L, null.asInstanceOf[String]), (7L, "   "))
      .toDF("doc_id", "text")
    val got = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // brute force over the engine's own simhashes
    val sh = docs.filter(coalesce(trim(col("text")), lit("")) =!= "")
      .select(col("doc_id"), TextFns.simhash64(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val want = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib) -> h.toLong).toMap
    assert(got == want)
    assert(got((1L, 2L)) == 0L)
    assert(!got.keys.exists(p => p._1 >= 5L || p._2 >= 5L),
      "blank/null docs must never pair")
  }

  test("dedupCorpusOph: exact dups collapse, verified near-dups lose to " +
      "the smaller id, distinct docs and null docs survive") {
    val base = (1 to 60).map(j => s"tok${(j * 7) % 41}").mkString(" ")
    val near = base.split(" ").drop(1).mkString(" ") // first token removed
    val docs = Seq(
      (1L, base), (2L, base),          // exact dups → 1 survives
      (3L, near),                      // near-dup of 1 → removed
      (4L, "completely different content with its own unique tokens"),
      (5L, null.asInstanceOf[String]), // null: its own singleton
      (6L, null.asInstanceOf[String])) // second null also survives
      .toDF("doc_id", "text")
    val got = Dedup.dedupCorpusOph(docs, "doc_id", "text",
      threshold = 0.6, shingleN = 2, k = 16, minMatch = 4L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L, 5L, 6L), s"survivors $got")
  }

  test("skew guard: buckets above maxBucket are dropped, not exploded") {
    val docs = (1L to 10L).map(i => (i, "same text everywhere"))
      .toDF("doc_id", "text")
    val sigs = Dedup.ophSignatures(docs, "doc_id", "text", 2, K)
    assert(Dedup.ophMatchPairs(sigs, 1L, maxBucket = 5).count() == 0)
    assert(Dedup.ophMatchPairs(sigs, 1L).count() == 45)
  }
}
