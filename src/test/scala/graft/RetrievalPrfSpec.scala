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
}
