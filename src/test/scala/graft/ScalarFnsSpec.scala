package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ScalarFns

class ScalarFnsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("euToDouble parses EU formats incl. thousands and inf") {
    val df = Seq("1234,56", "1 234,5", "1.234.567,89", "inf", "7", " 42,0 ")
      .toDF("s").select(ScalarFns.euToDouble($"s").as("v"))
    val got = df.collect().map(_.getDouble(0))
    assert(got(0) == 1234.56)
    assert(got(1) == 1234.5)
    assert(got(2) == 1234567.89)
    assert(got(3).isPosInfinity)
    assert(got(4) == 7.0)
    assert(got(5) == 42.0)
  }

  test("euFormat round-trips the decimal comma") {
    val df = Seq(12.5).toDF("v").select(ScalarFns.euFormat($"v").as("s"))
    assert(df.head.getString(0) == "12,5")
  }

  test("cleanName strips non-ascii, underscores spaces, truncates to 63") {
    val long = "a" * 80
    val df = Seq("Würzburg Nord", long).toDF("s")
      .select(ScalarFns.cleanName($"s").as("c"))
    val got = df.collect().map(_.getString(0))
    assert(got(0) == "Wrzburg_Nord")
    assert(got(1) == "a" * 63)
  }

  test("haversineKm: Munich->Berlin ~ 504 km") {
    val df = Seq((48.1374, 11.5755, 52.5200, 13.4050)).toDF("a", "b", "c", "d")
      .select(ScalarFns.haversineKm($"a", $"b", $"c", $"d").as("km"))
    val km = df.head.getDouble(0)
    assert(math.abs(km - 504) < 5, s"got $km")
  }

  test("dayType and season recodes") {
    val df = Seq("2015-01-04", "2015-01-03", "2015-01-05", "2015-07-01")
      .toDF("d").select(to_date($"d").as("d"))
      .select(ScalarFns.dayType($"d").as("dt"), ScalarFns.season($"d").as("sn"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "Sunday")
    assert(rows(1).getString(0) == "Saturday")
    assert(rows(2).getString(0) == "Working day")
    assert(rows(0).getString(1) == "Winter")
    assert(rows(3).getString(1) == "Summer")
  }

  test("unitCount = ceil-div semantics of cap // unit + (cap % unit > 0)") {
    val df = Seq((100.0, 30.0), (90.0, 30.0), (0.0, 30.0)).toDF("cap", "u")
      .select(ScalarFns.unitCount($"cap", $"u").as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(4L, 3L, 0L))
  }
}
