package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SemiStructured

class SemiStructuredSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val rows = Seq(
    ("a", """{"k": 5, "tag": "x"}"""),
    ("a", """{"k": 7}"""),
    ("a", """{oops"""),                 // malformed
    ("b", """{"k": "notanumber"}"""),
    ("b", """{"other": 1}"""),
    ("b", """{}"""))                    // object, no keys
    .toDF("grp", "props")

  test("jsonKeyReport: per-group key histogram, malformed rows " +
      "surface as __invalid__, empty objects contribute nothing") {
    val got = SemiStructured.jsonKeyReport(rows, "props", "grp")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(got == Map(("a", "k") -> 2L, ("a", "tag") -> 1L,
      ("a", "__invalid__") -> 1L, ("b", "k") -> 1L,
      ("b", "other") -> 1L), s"got $got")
  }

  test("jsonNumericStats: present/missing split, non-numeric and " +
      "malformed count missing, stats over present values") {
    val got = SemiStructured.jsonNumericStats(rows, "props", "$.k",
        "grp").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)), Option(r.get(5)),
        r.getLong(6)))).toMap
    assert(got("a") == ((2L, 1L, 12L, Some(5L), Some(7L), 2L)))
    assert(got("b") == ((0L, 3L, 0L, None, None, 0L)))
    intercept[IllegalArgumentException] {
      SemiStructured.jsonNumericStats(rows, "props", "k", "grp")
    }
  }
}
