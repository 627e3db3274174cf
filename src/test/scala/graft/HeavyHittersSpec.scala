package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MisraGries surfaces all true heavy hitters across partitions") {
    // skewed stream: "hot1" x 500, "hot2" x 300, 400 singletons
    val data = Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
      (1 to 400).map(i => s"rare$i")
    val df = data.toDF("token").repartition(8)
    val summary = df.agg(HeavyHitters.mgSummary($"token", 20)).head
      .getMap[String, Long](0)
    assert(summary.contains("hot1") && summary.contains("hot2"),
      s"heavy hitters missing from $summary")
    // MG counts are underestimates but ordering of the head survives
    assert(summary("hot1") > summary("hot2"))
    assert(summary.size <= 20, "summary bounded by k")
  }

  test("MG per group via groupBy") {
    val df = (Seq.fill(50)(("en", "the")) ++ Seq.fill(5)(("en", "x")) ++
      Seq.fill(40)(("de", "der"))).toDF("lang", "token")
    val got = df.groupBy($"lang").agg(HeavyHitters.mgSummary($"token", 4))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
    assert(got("en").contains("the"))
    assert(got("de").contains("der"))
  }
}
