package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{GridPipeline, LoadPipeline, PlantsPipeline}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ── transmission chain (SURVEY §7 minimum end-to-end slice) ────────────
  val rawGrid = Seq(
    // inter-regional line, two circuits 220+380 kV, AC
    (1L, "SRID=4326;LINESTRING(0.5 0.5,1.5 1.5)", 150000.0, "220000;380000", "4;4", "3;3", "50;50"),
    // intra-regional line (dropped by generateTransmission)
    (2L, "SRID=4326;LINESTRING(0.2 0.2,0.8 0.8)", 90000.0, "220000", "4", "3", "50"),
    // zero voltage -> mode-imputed (mode of AC voltages = 220)
    (3L, "SRID=4326;LINESTRING(0.5 0.8,1.2 1.6)", 120000.0, "0", "4", "3", "50"),
    // DC line
    (4L, "SRID=4326;LINESTRING(0.6 0.4,1.4 1.8)", 200000.0, "500000", "2", "1", "0"))
    .toDF("l_id", "wkt_srid_4326", "length_m", "voltage", "wires", "cables", "frequency")

  val regions = Seq(
    ("R1", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
    ("R2", "POLYGON ((1 0, 2 0, 2 2, 1 2, 1 0))"))
    .toDF("region", "wkt")

  lazy val assumptions = Seq(("AC", 0.92, 0.4), ("DC", 0.95, 0.6))
    .toDF("tr_type", "eff_per_1000km", "cost_per_mw_km")

  test("cleanGridKit: parse, explode, impute, classify, physics, aggregate") {
    val got = GridPipeline.cleanGridKit(rawGrid, GridPipeline.defaultVoltageLimits(spark))
    val rows = got.collect()
    assert(rows.length == 4, "4 (l_id, tr_type) groups")
    val l1 = rows.find(_.getAs[Long]("l_id") == 1L).get
    // two circuits: 220kV: SIL=220²/395, load 2.95; 380kV: 380²/375, 2.20
    val expCap = 220.0 * 220 / 395 * 2.95 + 380.0 * 380 / 375 * 2.20
    assert(math.abs(l1.getAs[Double]("capacity_mva") - expCap) < 1e-9)
    val l3 = rows.find(_.getAs[Long]("l_id") == 3L).get
    assert(l3.getAs[Double]("voltage_kv") == 220.0, "zero voltage -> AC mode 220")
    val l4 = rows.find(_.getAs[Long]("l_id") == 4L).get
    assert(l4.getAs[String]("tr_type") == "DC")
  }

  test("generateTransmission: spatial tagging, canonical inter-regional edges") {
    val grid = GridPipeline.cleanGridKit(rawGrid, GridPipeline.defaultVoltageLimits(spark))
    val got = GridPipeline.generateTransmission(grid, regions, assumptions).collect()
    // lines 1, 3, 4 cross R1->R2; line 2 is intra-R1 and dropped
    assert(got.map(_.getAs[String]("tr_type")).sorted.toSeq == Seq("AC", "DC"))
    val ac = got.find(_.getAs[String]("tr_type") == "AC").get
    assert(ac.getAs[String]("region_start") == "R1" && ac.getAs[String]("region_end") == "R2")
    assert(ac.getAs[Long]("n_lines") == 2)
    assert(ac.getAs[Double]("efficiency") < 1.0 && ac.getAs[Double]("efficiency") > 0.9)
    assert(ac.getAs[Double]("centroid_km") > 0)
  }

  test("generateTransmission: adjacent-but-unconnected regions get zero-capacity AC edges") {
    // R3 touches R2 (shared edge x=2) but no line reaches it; R4 is far away.
    val regions4 = Seq(
      ("R1", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
      ("R2", "POLYGON ((1 0, 2 0, 2 2, 1 2, 1 0))"),
      ("R3", "POLYGON ((2 0, 3 0, 3 1, 2 1, 2 0))"),
      ("R4", "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"))
      .toDF("region", "wkt")
    val grid = GridPipeline.cleanGridKit(rawGrid, GridPipeline.defaultVoltageLimits(spark))
    val got = GridPipeline.generateTransmission(grid, regions4, assumptions).collect()
    val key = got.map(r => (r.getAs[String]("region_start"), r.getAs[String]("region_end"),
      r.getAs[String]("tr_type"))).toSet
    // candidate Queen pairs: R1-R2, R2-R3 (and R1-R3 touch only at (2,?)— no:
    // R1 ends at x=1, R3 starts at x=2 → not adjacent); R4 isolated.
    assert(key.contains(("R2", "R3", "AC")), "adjacent unconnected pair appears")
    assert(!key.exists(k => k._1 == "R4" || k._2 == "R4"), "distant region stays isolated")
    assert(!key.contains(("R1", "R3", "AC")), "non-touching pair absent")
    val r23 = got.find(r => r.getAs[String]("region_start") == "R2" &&
      r.getAs[String]("region_end") == "R3").get
    assert(r23.getAs[Double]("capacity_mva") == 0.0, "zero-fill capacity")
    assert(r23.getAs[Long]("n_lines") == 0L)
    // candidate edge length falls back to the centroid distance
    assert(r23.getAs[Double]("length_km") == r23.getAs[Double]("centroid_km"))
    assert(r23.getAs[Double]("efficiency") < 1.0 && r23.getAs[Double]("efficiency") > 0.9)
  }

  // ── load chain ─────────────────────────────────────────────────────────
  test("cleanLoad: coverage scaling, country recode + merge, keyed hours") {
    val raw = Seq(
      ("Deutschland", 2015, 1, 1, 1, 50.0, 5.0),   // scaled to 10
      ("Germany", 2015, 1, 1, 1, 100.0, 7.0),      // same country+hour -> merged
      ("Germany", 2015, 1, 2, 1, 100.0, 9.0),      // t = 25
      ("Germany", 2015, 2, 30, 1, 100.0, 42.0),    // Feb-30: nonexistent slot -> dropped, not ANSI crash
      ("Germany", 2014, 1, 1, 1, 100.0, 99.0))     // wrong year -> dropped
      .toDF("country", "year", "month", "day", "hour", "coverage", "value")
    val cmap = Seq(("Deutschland, Germany", "DE")).toDF("from_name", "to_name")
    val got = LoadPipeline.cleanLoad(raw, 2015, cmap)
      .collect().map(r => (r.getString(0), r.getAs[Int]("t"), r.getAs[Double]("value"))).toSet
    assert(got == Set(("DE", 1, 17.0), ("DE", 25, 9.0)))
  }

  test("sectorShares normalize to 1 per country") {
    val raw = Seq(("DE", 2015, "households", "30"), ("DE", 2015, "industry", "60"),
      ("FR", 2015, "households", "10")).toDF("country", "year", "sector", "value")
    val noMap = Seq.empty[(String, String)].toDF("from_name", "to_name")
    val got = LoadPipeline.sectorShares(raw, 2015, noMap, noMap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(("DE", "households", 30.0 / 90), ("DE", "industry", 60.0 / 90),
      ("FR", "households", 1.0)))
  }

  test("loadTimeseries conserves energy through disaggregation") {
    val load = (1 to 48).map(t => ("A", t, 10.0)).toDF("country", "t", "value")
    val shares = Seq(("A", "res", 0.6), ("A", "ind", 0.4)).toDF("country", "sector", "share")
    val profiles = (1 to 48).flatMap(t =>
      Seq(("res", t, 1.0 / 48), ("ind", t, 1.0 / 48))).toDF("sector", "t", "weight")
    val weights = Seq(("r1", "A", "res", 0.7), ("r2", "A", "res", 0.3),
      ("r1", "A", "ind", 0.7), ("r2", "A", "ind", 0.3))
      .toDF("region", "country", "sector", "w")
    val got = LoadPipeline.loadTimeseries(load, shares, profiles, weights)
    val total = got.agg(sum($"value")).head.getDouble(0)
    assert(math.abs(total - 480.0) < 1e-9, s"total $total")
    val r1 = got.filter($"region" === "r1").agg(sum($"value")).head.getDouble(0)
    assert(math.abs(r1 - 336.0) < 1e-9)
    assert(got.count() == 96, "48 h x 2 regions")
  }

  // ── plants chain ───────────────────────────────────────────────────────
  test("cleanPlants: type recode, filters, name dedup, year imputation") {
    val raw = Seq(
      (Some("Alpha"), "Hard Coal", "Steam Turbine", "PP", "DE", 100.0, Some(1990)),
      (Some("Alpha"), "Hard Coal", "Steam Turbine", "PP", "DE", 80.0, None),
      (None, "Wind", "Onshore", "PP", "DE", 50.0, Some(2010)),
      (Some("Dead"), "Hard Coal", "Steam Turbine", "PP", "DE", 0.0, Some(1990)))
      .toDF("Name", "Fueltype", "Technology", "Set", "Country", "inst_cap", "Year")
    val tmap = Seq(("(Hard Coal,Steam Turbine,PP)", "Coal"), ("(Wind,Onshore,PP)", "WindOn"))
      .toDF("from_name", "to_name")
    val got = PlantsPipeline.cleanPlants(raw, tmap, meanYear = 2005).collect()
    assert(got.length == 3, "zero-capacity row dropped")
    val names = got.map(_.getAs[String]("Name")).toSet
    assert(names == Set("Alpha", "Alpha_1", "unnamed"))
    assert(got.forall(r => !r.isNullAt(r.fieldIndex("Year"))), "years imputed")
    assert(got.forall(r => Set("Coal", "WindOn")(r.getAs[String]("Type"))))
  }

  test("cleanIrena: forward fill + FLH") {
    val raw = Seq(
      (1, Some("DE"), "wind", "capacity_mw", 2015, 100.0),
      (2, None, "wind", "production_gwh", 2015, 200.0),
      (3, Some("FR"), "solar", "capacity_mw", 2015, 50.0),
      (4, None, "solar", "production_gwh", 2015, 60.0))
      .toDF("rowid", "country", "technology", "indicator", "year", "value")
    val got = PlantsPipeline.cleanIrena(raw, 2015).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Double]("flh"))).toSet
    assert(got == Set(("DE", "wind", 2000.0), ("FR", "solar", 1200.0)))
  }

  test("placeRenewables: top-units pixels, residual last unit") {
    val pixels = Seq(("X", 0, 0, 1.0), ("X", 0, 1, 4.0), ("X", 1, 0, 3.0), ("X", 1, 1, 2.0))
      .toDF("country", "row", "col", "potential")
    val counts = Seq(("X", "wind", 2L, 30.0, 50.0))
      .toDF("country", "technology", "units", "unit_size_mw", "capacity_mw")
    val got = PlantsPipeline.placeRenewables(pixels, counts, randomness = 0.0)
      .orderBy($"rk").collect()
    assert(got.length == 2)
    assert((got(0).getAs[Int]("row"), got(0).getAs[Int]("col")) == (0, 1), "best pixel first")
    assert(got(0).getAs[Double]("inst_cap") == 30.0)
    assert(got(1).getAs[Double]("inst_cap") == 20.0, "residual capacity on last unit")
  }
}
