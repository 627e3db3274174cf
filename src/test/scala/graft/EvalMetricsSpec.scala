package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EvalMetrics

class EvalMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normalizeAnswer: case, punctuation, articles, whitespace") {
    val r = Seq("The  Quick, Brown Fox!", "an answer", "a", "")
      .toDF("s")
      .select(EvalMetrics.normalizeAnswer(col("s")))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("quick brown fox", "answer", "", ""))
  }

  test("normalizeAnswer: official remove_punc semantics — intra-word " +
      "punctuation deleted (don't -> dont), non-ASCII letters kept") {
    val r = Seq("Don't Panic", "the Café-au-lait", "semi;colon\tTAB")
      .toDF("s")
      .select(EvalMetrics.normalizeAnswer(col("s")))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("dont panic", "caféaulait", "semicolon tab"))
  }

  test("emF1: exact after mangling, multiset overlap, empty edges") {
    val d = Seq(
      (1L, "The Quick FOX!", "quick fox"),        // em, f1 = 1e6
      (2L, "x x y", "x y y"),                     // overlap 2 of 3+3
      (3L, "", "something"),                      // one empty -> 0
      (4L, "a the an", ""),                       // both normalize empty
      (5L, "p q", "r s"))                         // disjoint -> 0
      .toDF("id", "pred", "ref")
    val r = EvalMetrics.emF1(d, "pred", "ref").collect()
      .map(x => x.getLong(0) -> ((x.getBoolean(3), x.getLong(4)))).toMap
    assert(r(1L) == ((true, 1000000L)))
    assert(r(2L) == ((false, 666666L)))           // floor(4e6/6)
    assert(r(3L) == ((false, 0L)))
    assert(r(4L) == ((true, 1000000L)))
    assert(r(5L) == ((false, 0L)))
  }

  test("passAtK: exact combinatorics, saturation, refusal under k") {
    // problem 1: n=8, c=2 -> 1e6 - floor(C(6,3)/C(8,3)*1e6)
    //   = 1e6 - floor(20/56*1e6) = 642858
    // problem 2: n=4, c=0 -> pass 0; problem 3: n=3, c=1 -> n-c<k -> 1e6
    val d = ((0 until 8).map(i => (1L, i < 2)) ++
      (0 until 4).map(_ => (2L, false)) ++
      (0 until 3).map(i => (3L, i == 0)))
      .toDF("problem", "ok")
    val r = EvalMetrics.passAtK(d, "problem", "ok", k = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3)))).toMap
    assert(r(1L) == ((8L, 2L, 642858L)))
    assert(r(2L) == ((4L, 0L, 0L)))
    assert(r(3L) == ((3L, 1L, 1000000L)))
    val small = Seq((9L, true), (9L, false)).toDF("problem", "ok")
    val e = intercept[Exception] {
      EvalMetrics.passAtK(small, "problem", "ok", k = 3).collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null) t else root(t.getCause)
    assert(root(e).getMessage.contains("needs >= 3 samples"))
  }
}
