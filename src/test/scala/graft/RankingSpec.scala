package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation
import graft.functions.TextFns

class RankingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25 ranks term-dense short docs above sparse long ones") {
    val docs = Seq(
      (1L, "spark spark spark join"),            // dense
      (2L, "spark " + ("filler " * 60).trim),    // one hit, long doc
      (3L, "completely unrelated words here"),   // no hits
      (4L, "join query spark")                   // all three terms
    ).toDF("doc_id", "text")
    val got = Curation.bm25(docs, "doc_id", "text", Seq("spark", "query", "join"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(!got.contains(3L)) // no matching term, no row
    assert(got(4L)._2 == 3 && got(1L)._2 == 2 && got(2L)._2 == 1)
    assert(got(4L)._1 > got(2L)._1) // three distinct terms beat one diluted hit
    assert(got(1L)._1 > got(2L)._1) // tf saturation still beats long-doc dilution
  }

  test("repetitionRatio: novel text 0, repeated text approaches 1, edges") {
    val docs = Seq(
      (1L, "a b c d e f"),            // all bigrams distinct -> 0
      (2L, ("ha " * 30).trim),        // single repeated bigram -> 1 - 1/29
      (3L, "one"),                    // < n tokens -> 0
      (4L, null.asInstanceOf[String]) // null -> null
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
      TextFns.repetitionRatio(col("text"), 2).as("r")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L) == Some(0.0))
    assert(math.abs(got(2L).get - (1.0 - 1.0 / 29)) < 1e-12)
    assert(got(3L) == Some(0.0))
    assert(got(4L).isEmpty)
  }
}
