package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{ProcessPipeline, Schemas}

class ProcessPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val plants = Seq(
    ("S1", "Coal", 1990, 100.0),   // 1990+40 >= 2015: alive
    ("S1", "Coal", 1990, 50.0),    // same cohort -> merged
    ("S1", "Coal", 1970, 80.0),    // 1970+40 < 2015: dead
    ("S2", "WindOn", 2010, 30.0))  // alive
    .toDF("Site", "Type", "Year", "inst_cap")

  val assumptions = Seq(("Coal", 40, 1000.0), ("WindOn", 25, 500.0))
    .toDF("Type", "lifetime", "cap_max")

  test("capacityCohorts: lifetime filter + cohort merge conserves live capacity") {
    val got = ProcessPipeline.capacityCohorts(plants, assumptions, 2015)
    val rows = got.collect()
    assert(rows.length == 2)
    val coal = rows.find(_.getAs[String]("Site") == "S1").get
    assert(coal.getAs[Double]("inst_cap") == 150.0)
    assert(coal.getAs[Long]("n_plants") == 2)
    val total = got.agg(sum($"inst_cap")).head.getDouble(0)
    assert(total == 180.0, "dead cohort excluded, live capacity conserved")
  }

  test("expansion candidates cross product + union aligns columns") {
    val sites = Seq("S1", "S2").toDF("Site")
    val expandable = Seq(("Solar", 200.0), ("WindOn", 500.0)).toDF("Type", "cap_max")
    val cohorts = ProcessPipeline.capacityCohorts(plants, assumptions, 2015)
    val exp = ProcessPipeline.expansionCandidates(sites, expandable)
    val table = ProcessPipeline.processTable(cohorts, exp)
    assert(exp.count() == 4)
    assert(table.count() == 6)
    assert(table.filter($"inst_cap" === 0.0).count() == 4)
    assert(table.columns.contains("cap_max"), "expansion attrs carried through union")
  }

  test("generateCommodities: site x commodity with demand left-joined, 0-filled") {
    val sites = Seq("S1", "S2").toDF("Site")
    val comms = Seq("Elec", "Gas").toDF("Commodity")
    val demand = Seq(("S1", "Elec", 42.0)).toDF("Site", "Commodity", "annual")
    val got = ProcessPipeline.generateCommodities(sites, comms, demand)
    assert(got.count() == 4)
    val m = got.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("S1", "Elec")) == 42.0)
    assert(m(("S2", "Gas")) == 0.0)
  }

  test("schema catalog covers the reference's named datasets") {
    assert(Schemas.catalog.size >= 25, s"catalog has ${Schemas.catalog.size}")
    // pipeline outputs validate against their catalog entries
    val cohorts = ProcessPipeline.capacityCohorts(plants, assumptions, 2015)
    Schemas.requireSchema(cohorts, Schemas.catalog("process_regions"), "process_regions")
  }

  test("schema registry validates and rejects") {
    val cohorts = ProcessPipeline.capacityCohorts(plants, assumptions, 2015)
    Schemas.requireSchema(cohorts, Schemas.cohorts, "process_compact") // ok
    val bad = cohorts.withColumn("inst_cap", $"inst_cap".cast("string"))
    val e = intercept[IllegalArgumentException] {
      Schemas.requireSchema(bad, Schemas.cohorts, "process_compact")
    }
    assert(e.getMessage.contains("inst_cap"))
  }
}
