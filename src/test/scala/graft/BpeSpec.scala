package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // "low lower lowest newer newest": the canonical Sennrich et al. example
  // family — pair counts are hand-checkable.
  private def corpus = Seq(
    (1L, "low low low low low lower lower newest newest newest"),
    (2L, "newest newest newest widest widest lowest")).toDF("doc_id", "text")

  test("train learns the hand-computed merge sequence with deterministic " +
      "tiebreaks") {
    val merges = Bpe.train(corpus, "text", nMerges = 3)
    // pair counts over word freqs: low=5 lower=2 newest=6 widest=2 lowest=1
    // (l,o): 5+2+1=8  (o,w): 8  (e,s): 6+2+1=9  (s,t): 9  (w,e): 2+6=8 ...
    // argmax step1: cnt 9 ties (e,s) vs (s,t) → (e,s) by left ASC.
    assert(merges(0).left == "e" && merges(0).right == "s"
      && merges(0).pairCount == 9)
    // after <es>: (es,t) count 9 is the new max (others unchanged ≤ 8)
    assert(merges(1).left == "es" && merges(1).right == "t"
      && merges(1).pairCount == 9)
    // after <est>: (l,o)=8, (o,w)=8, (w,est)=2+... → (l,o) wins left ASC
    assert(merges(2).pairCount == 8)
    assert(merges.map(_.step) == Seq(1, 2, 3))
  }

  test("segment applies merges left-to-right non-overlapping; " +
      "subwordCountBpe counts unk words as one symbol") {
    val merges = Bpe.train(corpus, "text", nMerges = 3)
    val seg = corpus.sparkSession.range(1)
      .select(Bpe.segment(lit("newest"), merges).as("s"))
      .head().getSeq[String](0)
    assert(seg.contains("est"), s"expected 'est' subword in $seg")
    // unk (non-alphabet) tokens count 1; in-alphabet words count their
    // symbols under the learned table
    val n = corpus.sparkSession.range(1)
      .select(Bpe.subwordCountBpe(lit("newest €"), merges).as("n"))
      .head().getInt(0)
    assert(n == seg.length + 1)
  }

  test("vocabAfter sums word frequencies into subword frequencies") {
    val merges = Bpe.train(corpus, "text", nMerges = 2) // es, est
    val vocab = Bpe.vocabAfter(corpus, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'est' appears once in each of newest(6), widest(2), lowest(1) = 9
    assert(vocab("est") == 9L)
    // 'w': low*5(1) lower*2(1) newest*6(1) widest*2(1) lowest*1(1) = 16
    assert(vocab("w") == 16L)
  }

  test("train fails loudly when the vocabulary exhausts mergeable pairs") {
    val tiny = Seq((1L, "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.train(tiny, "text", nMerges = 2)
    }
    assert(e.getMessage.contains("exhausted"))
  }
}
