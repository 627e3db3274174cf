package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramTok

class UnigramTokSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wordCounts: dedupes to the vocabulary relation, drops empties " +
      "and over-long blobs") {
    val d = Seq(("ab ab b", 1), ("  ab  ", 2), ("x" * 40, 3))
      .toDF("text", "k")
    // note: double spaces produce empty split cells — dropped
    val r = UnigramTok.wordCounts(d.select(col("text")), "text")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("ab" -> 3L, "b" -> 1L))
  }

  test("seedVocab: per-occurrence substring counts weighted by word " +
      "frequency; singles always survive minCount") {
    val words = Seq(("ab", 2L), ("b", 1L)).toDF("word", "n_occ")
    val r = UnigramTok.seedVocab(words, maxPieceLen = 2, minCount = 2)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    // a: 2 (from ab x2); b: 2+1 = 3; ab: 2. costs = 40 - floor(log2)
    assert(r == Map("a" -> ((2L, 39L)), "b" -> ((3L, 39L)),
      "ab" -> ((2L, 39L))))
    // below minCount a multi-char piece drops, a single char stays
    val w2 = Seq(("xy", 1L)).toDF("word", "n_occ")
    val r2 = UnigramTok.seedVocab(w2, maxPieceLen = 2, minCount = 2)
      .collect().map(_.getString(0)).toSet
    assert(r2 == Set("x", "y"))
  }

  test("viterbiSegments: longest piece wins cost ties; cheaper pieces " +
      "win otherwise; unknown chars fall back to the 10^9 sentinel") {
    val words = Seq(("abab", 5L), ("z", 1L)).toDF("word", "n_occ")
    // 'ab' (10) ties 'a'+'b' (5+5): the longer piece must win
    val tieVocab = Seq(("a", 5L), ("b", 5L), ("ab", 10L))
      .toDF("piece", "cost")
    val t1 = UnigramTok.viterbiSegments(words, tieVocab, maxPieceLen = 2)
      .collect().map(x => x.getString(0) ->
        ((x.getString(2), x.getLong(3), x.getInt(4)))).toMap
    assert(t1("abab") == (("ab ab", 20L, 2)))
    assert(t1("z") == (("z", 1000000000L, 1)))
    // when the composite is strictly cheaper than the parts it is taken
    val cheap = Seq(("a", 5L), ("b", 5L), ("ab", 3L))
      .toDF("piece", "cost")
    val t2 = UnigramTok.viterbiSegments(words, cheap, maxPieceLen = 2)
      .collect().map(x => x.getString(0) -> x.getString(2)).toMap
    assert(t2("abab") == "ab ab")
    // when the parts are cheaper the composite loses
    val dear = Seq(("a", 1L), ("b", 1L), ("ab", 9L))
      .toDF("piece", "cost")
    val t3 = UnigramTok.viterbiSegments(words, dear, maxPieceLen = 2)
      .collect().map(x => x.getString(0) ->
        ((x.getString(2), x.getLong(3)))).toMap
    assert(t3("abab") == (("a b a b", 4L)))
  }

  test("emPieceCounts: counts weighted by word frequency, lattice " +
      "costs re-derived") {
    val segs = Seq(("abab", 3L, "ab ab", 20L, 2),
      ("b", 2L, "b", 5L, 1))
      .toDF("word", "n_occ", "seg", "cost", "n_pieces")
    val r = UnigramTok.emPieceCounts(segs)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2)))).toMap
    // ab: 2 pieces x 3 occ = 6 -> cost 40 - 2 = 38; b: 2 -> 40 - 1 = 39
    assert(r == Map("ab" -> ((6L, 38L)), "b" -> ((2L, 39L))))
  }

  test("one full EM round is self-consistent: re-running Viterbi under " +
      "the EM costs still tiles every word") {
    val docs = Seq("the fast key order the the fast", "key key order ab")
      .toDF("text")
    val words = UnigramTok.wordCounts(docs, "text")
    val v0 = UnigramTok.seedVocab(words, maxPieceLen = 3, minCount = 2)
    val s0 = UnigramTok.viterbiSegments(words, v0, maxPieceLen = 3)
    val v1 = UnigramTok.emPieceCounts(s0)
      .withColumnRenamed("new_cost", "cost")
    val s1 = UnigramTok.viterbiSegments(words, v1, maxPieceLen = 3)
    s1.collect().foreach { r =>
      assert(r.getString(2).replace(" ", "") == r.getString(0),
        s"segmentation does not tile ${r.getString(0)}")
    }
  }

  test("pruneVocab: EM survivors keep EM costs, the character " +
      "alphabet re-enters at seed cost, re-segmentation stays total") {
    val seed = Seq(("a", 10L, 37L), ("b", 4L, 38L), ("ab", 9L, 37L))
      .toDF("piece", "cnt", "cost")
    val em = Seq(("ab", 9L, 37L), ("b", 1L, 40L))
      .toDF("piece", "em_count", "new_cost")
    val pruned = UnigramTok.pruneVocab(em, seed, minCount = 5)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // ab survives at EM cost; b fell under minCount but is a single
    // char -> back at SEED cost; a had no EM count -> seed cost
    assert(pruned == Map("ab" -> 37L, "b" -> 38L, "a" -> 37L))
    // the pruned vocab still segments any word over the alphabet
    val words = Seq(("abba", 1L)).toDF("word", "n_occ")
    val segs = UnigramTok.viterbiSegments(words,
      pruned.toSeq.toDF("piece", "cost"), maxPieceLen = 2)
      .collect().head
    assert(segs.getString(2).replace(" ", "") == "abba")
    assert(segs.getLong(3) < 1000000000L, "no sentinel pieces needed")
  }

  test("Viterbi law: DP cost equals the brute-force minimum over ALL " +
      "segmentations, and the emitted segmentation achieves it") {
    val rng = new scala.util.Random(7)
    val alphabet = "abcd"
    def brute(w: String, vc: Map[String, Long], maxLen: Int): Long =
      if (w.isEmpty) 0L
      else (1 to math.min(maxLen, w.length)).map { j =>
        vc.getOrElse(w.take(j), 1000000000L) +
          brute(w.drop(j), vc, maxLen)
      }.min
    (0 until 10).foreach { _ =>
      // random short words + a random piece-cost table
      val words = (0 until 6).map(_ =>
        ((0 until 1 + rng.nextInt(7)).map(_ =>
          alphabet(rng.nextInt(4))).mkString, 1L))
      val pieces = scala.collection.mutable.Map[String, Long]()
      alphabet.foreach(c => pieces(c.toString) = 1L + rng.nextInt(9))
      (0 until 12).foreach { _ =>
        val len = 2 + rng.nextInt(2)
        val p = (0 until len).map(_ => alphabet(rng.nextInt(4))).mkString
        pieces(p) = 1L + rng.nextInt(9)
      }
      val vdf = pieces.toSeq.toDF("piece", "cost")
      val r = UnigramTok.viterbiSegments(
        words.distinct.toDF("word", "n_occ"), vdf, maxPieceLen = 3)
        .collect()
      r.foreach { row =>
        val (w, seg, cost) =
          (row.getString(0), row.getString(2), row.getLong(3))
        assert(cost == brute(w, pieces.toMap, 3), s"word $w")
        // the emitted pieces re-tile the word and re-sum to the cost
        val ps = seg.split(" ").filter(_.nonEmpty)
        assert(ps.mkString == w)
        assert(ps.map(p => pieces.toMap.getOrElse(p, 1000000000L)).sum
          == cost)
      }
    }
  }

  test("viterbiSegments refuses an oversized vocabulary loudly") {
    val words = Seq(("ab", 1L)).toDF("word", "n_occ")
    val vocab = (0 until 10).map(i => (s"p$i", 1L)).toDF("piece", "cost")
    intercept[IllegalArgumentException] {
      UnigramTok.viterbiSegments(words, vocab, maxPieceLen = 2,
        maxVocab = 5)
    }
  }
}
