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

  test("jsonPathProfile: recursive path inventory with value classes; " +
      "invalid payloads visible; loud refusal past maxDepth") {
    val rows = Seq(
      ("a", """{"u":1,"b":{"c":[1,"x",{"d":true}],"e":1.5},"f":null}"""),
      ("a", "{oops"),
      ("a", null.asInstanceOf[String]),
      ("b", "42"))
      .toDF("grp", "p")
    val got = SemiStructured.jsonPathProfile(rows, "p", "grp",
        maxDepth = 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(got(("a", "$", "object")) == 1L, s"got $got")
    // malformed AND null payloads both surface under $/__invalid__
    assert(got(("a", "$", "__invalid__")) == 2L)
    assert(got(("b", "$", "number")) == 1L)
    assert(got(("a", "$.u", "number")) == 1L)
    assert(got(("a", "$.b", "object")) == 1L)
    assert(got(("a", "$.b.c", "array")) == 1L)
    assert(got(("a", "$.b.c[0]", "number")) == 1L)
    assert(got(("a", "$.b.c[1]", "string")) == 1L)
    assert(got(("a", "$.b.c[2]", "object")) == 1L)
    assert(got(("a", "$.b.c[2].d", "bool")) == 1L)
    assert(got(("a", "$.b.e", "number")) == 1L)
    assert(got(("a", "$.f", "null")) == 1L)
    assert(got.size == 12)
    // nodes at the depth bound that still have children refuse loudly
    // (maxDepth=3 leaves $.b.c[2] = {"d":true} unexpanded)
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null) t else rootCause(t.getCause)
    val e = intercept[Exception] {
      SemiStructured.jsonPathProfile(rows, "p", "grp", maxDepth = 3)
        .collect()
    }
    assert(rootCause(e).getMessage.contains("nests deeper"),
      rootCause(e).getMessage)
    // an EMPTY container at the bound has no children — no refusal
    val shallow = Seq(("a", """{"x":{}}"""), ("a", """{"y":[]}"""))
      .toDF("grp", "p")
    val got2 = SemiStructured.jsonPathProfile(shallow, "p", "grp",
        maxDepth = 1).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(got2 == Set(("$", "object"), ("$.x", "object"),
      ("$.y", "array")), s"got $got2")
    intercept[IllegalArgumentException] {
      SemiStructured.jsonPathProfile(rows, "p", "grp", maxDepth = 0)
    }
  }

  test("jsonFlatten: typed columns from several paths in one pass; " +
      "garbage and bare scalars yield nulls; spec refusals") {
    val rows = Seq(
      (1L, """{"u":8,"meta":{"k":3},"z":null}"""),
      (2L, "{oops"),
      (3L, "42"),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "p")
    val got = SemiStructured.jsonFlatten(rows, "p",
        Seq(("u_id", "$.u", "BIGINT"), ("k", "$.meta.k", "BIGINT"),
          ("zz", "$.z", "STRING"))).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4))))).toMap
    assert(got(1L) == ((Some(8L), Some(3L), None)), s"got $got")
    assert(got(2L) == ((None, None, None)))
    assert(got(3L) == ((None, None, None)))
    assert(got(4L) == ((None, None, None)))
    intercept[IllegalArgumentException] {
      SemiStructured.jsonFlatten(rows, "p", Seq(("x", "u", "BIGINT")))
    }
    intercept[IllegalArgumentException] {
      SemiStructured.jsonFlatten(rows, "p", Seq(("x", "$.u", "MAP")))
    }
    intercept[IllegalArgumentException] {
      SemiStructured.jsonFlatten(rows, "p", Seq(("id", "$.u", "BIGINT")))
    }
    intercept[IllegalArgumentException] {
      SemiStructured.jsonFlatten(rows, "p", Seq.empty)
    }
  }

  test("jsonSchemaDrift: added/removed/stable verdicts, a type change " +
      "reads as removed+added at the same path, period refusal") {
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    val rows = Seq((0L, """{"a":1}"""), (1L, """{"a":"x","b":2}"""))
      .toDF("p", "j")
    val got = SemiStructured.jsonSchemaDrift(rows, "j", "p")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got == Map(
      ("$", "object") -> ((1L, 1L, "stable")),
      ("$.a", "number") -> ((1L, 0L, "removed")),
      ("$.a", "string") -> ((0L, 1L, "added")),
      ("$.b", "number") -> ((0L, 1L, "added"))), s"got $got")
    val e = intercept[Exception] {
      SemiStructured.jsonSchemaDrift(
        Seq((2L, """{"a":1}""")).toDF("p", "j"), "j", "p").collect()
    }
    assert(rc(e).getMessage.contains("outside {0,1}"))
  }

  test("jsonPathProfile: STREAMING inputs refuse maxDepth > 2 loudly " +
      "(no lineage cut inside a micro-batch -> quadratic re-parse), " +
      "depth <= 2 still plans") {
    val sdf = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .selectExpr("cast(value as string) as j", "1L as g")
    val e = intercept[IllegalArgumentException] {
      SemiStructured.jsonPathProfile(sdf, "j", "g", maxDepth = 3)
    }
    assert(e.getMessage.contains("STREAMING"), e.getMessage)
    // within the streaming depth bound the plan still constructs
    assert(SemiStructured.jsonPathProfile(sdf, "j", "g", maxDepth = 2)
      .isStreaming)
  }
}
