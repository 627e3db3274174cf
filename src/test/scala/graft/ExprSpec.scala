package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.GraftExpressions
import graft.functions.ScalarFns

class ExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native haversine matches the Column-composed version bit-for-bit") {
    val df = Seq((48.1374, 11.5755, 52.52, 13.405), (0.0, 0.0, 0.0, 0.0),
      (-33.9, 18.4, 40.7, -74.0)).toDF("a", "b", "c", "d")
    val got = df.select(
      GraftExpressions.haversineKm($"a", $"b", $"c", $"d").as("native"),
      ScalarFns.haversineKm($"a", $"b", $"c", $"d").as("composed")).collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("native eu_to_double parses dialect incl. null propagation") {
    val df = Seq(Some("1.234,5"), Some("inf"), Some(" 12 345,75 "), None)
      .toDF("s").select(GraftExpressions.euToDouble($"s").as("v"))
    val got = df.collect()
    assert(got(0).getDouble(0) == 1234.5)
    assert(got(1).getDouble(0).isPosInfinity)
    assert(got(2).getDouble(0) == 12345.75)
    assert(got(3).isNullAt(0), "null in -> null out (nullIntolerant)")
  }

  test("SQL registration exposes the functions to spark.sql") {
    GraftExpressions.register(spark)
    val r = spark.sql(
      "SELECT haversine_km(0D, 0D, 0D, 90D) AS d, eu_to_double('2,5') AS e, " +
      "sample_bucket(7) AS b, cosine_sim(array(1D,0D), array(1D,0D)) AS c").head
    assert(math.abs(r.getDouble(0) - 10007.5) < 10.0)
    assert(r.getDouble(1) == 2.5)
    // matches the Column-level Curation.sampleBucket rule exactly
    assert(r.getLong(2) == ((7L * 2654435761L) % 2147483648L))
    assert(r.getDouble(3) == 1.0)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val df = spark.range(100).select(
      GraftExpressions.haversineKm(lit(0.0), lit(0.0), col("id").cast("double"),
        lit(10.0)).as("km"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    assert(df.count() == 100)
  }
}
