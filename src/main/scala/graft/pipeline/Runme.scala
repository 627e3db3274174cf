package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's 22-stage program (code/runme.py) as a memoized Spark
  * driver: each stage is a pure function materialized to parquet under
  * `outDir`, skipped when its output already exists — the reference's
  * file-existence memoization (SURVEY §3) with lineage inside a stage and
  * parquet contracts between stages. Runs the micro-Europe fixture by
  * default; point the site/grid/load inputs at real data to run Europe.
  *
  * Usage: sbt "runMain graft.pipeline.Runme [outDir]"
  */
object Runme {

  def stage(spark: SparkSession, outDir: String, name: String)(f: => DataFrame): DataFrame = {
    val path = s"$outDir/$name"
    if (new java.io.File(path, "_SUCCESS").exists) {
      println(s"[runme] $name: memoized, skipping")
      spark.read.parquet(path)
    } else {
      val df = f
      df.write.mode("overwrite").parquet(path)
      graft.sources.JsonSidecar.write(path, Map("stage" -> name), Nil, "Runme")
      println(s"[runme] $name: written (${df.columns.length} cols)")
      spark.read.parquet(path)
    }
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/pipeline_out")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, outDir) finally spark.stop()
  }

  /** The full program against a caller-owned session (testable without
    * stopping a shared SparkContext).
    */
  def run(spark: SparkSession, outDir: String): Unit = {
    import spark.implicits._
    val year = 2015

    // ── fixture inputs (micro-Europe; replace with EuCsv reads for real data)
    val regionsRaw = Seq(
      ("R1", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
      ("R2", "POLYGON ((1 0, 2 0, 2 2, 1 2, 1 0))")).toDF("region", "wkt")
    val cmap = Seq(("Deutschland", "DE"), ("France", "FR")).toDF("from_name", "to_name")

    // ── clean raw data ──────────────────────────────────────────────────
    val profile = stage(spark, outDir, "profile_residential") {
      val slots = for {
        dt <- Seq("Working day", "Saturday", "Sunday"); sn <- Seq("Winter", "Summer")
        s <- 1 to 96
      } yield (dt, sn, s, if (sn == "Winter") 1.2 else 0.8)
      ProfilesPipeline.cleanProfile(slots.toDF("day_type", "season", "slot", "value"), year)
    }

    val gridCleaned = stage(spark, outDir, "grid_cleaned") {
      val raw = Seq(
        (1L, "SRID=4326;LINESTRING(0.5 0.5,1.5 1.5)", 150000.0, "220000;380000", "4;4", "3;3", "50;50"),
        (2L, "SRID=4326;LINESTRING(0.2 0.2,0.8 0.8)", 90000.0, "220000", "4", "3", "50"),
        (3L, "SRID=4326;LINESTRING(0.6 0.4,1.4 1.8)", 200000.0, "500000", "2", "1", "0"))
        .toDF("l_id", "wkt_srid_4326", "length_m", "voltage", "wires", "cables", "frequency")
      Schemas.requireSchema(
        GridPipeline.cleanGridKit(raw, GridPipeline.defaultVoltageLimits(spark)),
        Schemas.gridCleaned, "grid_cleaned")
    }

    val sectorShares = stage(spark, outDir, "sector_shares") {
      LoadPipeline.sectorShares(
        Seq(("Deutschland", year, "households", "40"), ("Deutschland", year, "industry", "60"),
          ("France", year, "households", "100")).toDF("country", "year", "sector", "value"),
        year, cmap, cmap)
    }

    val loadTs = stage(spark, outDir, "load_ts") {
      val raw = (1 to 2).flatMap(day => (1 to 24).flatMap(h => Seq(
        ("Deutschland", year, 1, day, h, 100.0, 10.0 + h),
        ("France", year, 1, day, h, 50.0, 3.0 + h))))
        .toDF("country", "year", "month", "day", "hour", "coverage", "value")
      LoadPipeline.cleanLoad(raw, year, cmap)
    }

    val plants = stage(spark, outDir, "process_cleaned") {
      val raw = Seq(
        (Some("P1"), "Hard Coal", "Steam Turbine", "PP", "DE", 100.0, Some(1995)),
        (Some("P2"), "Gas", "OCGT", "PP", "DE", 60.0, Some(2005)),
        (Some("P3"), "Gas", "OCGT", "PP", "FR", 40.0, None))
        .toDF("Name", "Fueltype", "Technology", "Set", "Country", "inst_cap", "Year")
      val tmap = Seq(("(Hard Coal,Steam Turbine,PP)", "Coal"), ("(Gas,OCGT,PP)", "GasOC"))
        .toDF("from_name", "to_name")
      PlantsPipeline.cleanPlants(raw, tmap, meanYear = 2000)
        .withColumn("Site", when(col("Country") === "DE", "R1").otherwise("R2"))
    }

    // ── intermediate files ──────────────────────────────────────────────
    val sites = stage(spark, outDir, "sites")(SitesPipeline.generateSites(regionsRaw))
    // the reference also emits the sites layer as an ESRI shapefile
    // (code/lib/spatial_functions.py:460-466) — real .shp/.shx/.dbf here
    graft.sources.Shapefile.write(
      sites.withColumnRenamed("wkt", "geometry"), "geometry", s"$outDir/sites_shp")
    // ... and rasterized layers as GeoTIFF (array2raster,
    // code/lib/spatial_functions.py:190-222): burn site ordinals onto a
    // 40x40 canvas over the micro-Europe bbox and write a real .tif
    locally {
      import graft.sources.{GeoTiff, InputMaps}
      val canvas = InputMaps.pixelGrid(spark, 40, 40, 0.0, 0.0, 2.0, 2.0)
      val siteOrd = sites.select(col("wkt"),
        (dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("Site")))).cast("double").as("burn"))
      val burned = InputMaps.rasterize(canvas, siteOrd, "wkt", "burn")
        // pixelGrid is south-up (row 0 at ymin); GeoTIFF row 0 is the TOP
        // row — flip so georeferencing is upright, like array2raster's
        // np.flipud (code/lib/spatial_functions.py:205)
        .select((lit(39) - col("row")).as("row"), col("col"),
          col("burn").as("value"))
      GeoTiff.write(burned,
        GeoTiff.GeoInfo(40, 40, x0 = 0.0, y0 = 2.0, resX = 0.05, resY = 0.05),
        s"$outDir/sites_raster.tif")
    }

    val demand = stage(spark, outDir, "demand_ts") {
      val profiles = profile.select(lit("households").as("sector"), col("t"), col("value").as("weight"))
        .unionByName(profile.select(lit("industry").as("sector"), col("t"), col("value").as("weight")))
      val weights = Seq(("R1", "DE", 0.7), ("R2", "DE", 0.3), ("R1", "FR", 0.2), ("R2", "FR", 0.8))
        .toDF("region", "country", "w")
        .crossJoin(Seq("households", "industry").toDF("sector"))
      LoadPipeline.loadTimeseries(loadTs, sectorShares, profiles, weights)
        .withColumn("t", col("t").cast("int"))
    }

    val transmission = stage(spark, outDir, "grid_completed") {
      val assumptions = Seq(("AC", 0.92, 0.4), ("DC", 0.95, 0.6))
        .toDF("tr_type", "eff_per_1000km", "cost_per_mw_km")
      Schemas.requireSchema(
        GridPipeline.generateTransmission(gridCleaned,
          sites.select(col("Site").as("region"), col("wkt")), assumptions),
        Schemas.transmission, "grid_completed")
    }

    val renewableTs = stage(spark, outDir, "renewable_ts") {
      val raw = (1 to 48).flatMap(t => Seq(
        (s"R1.WindOn.q50", t, 0.3 + (t % 7) * 0.05), (s"R2.Solar.q50", t, 0.2 + (t % 5) * 0.08)))
        .toDF("series_key", "t", "value")
      val caps = Seq(("R1", "WindOn", 120.0), ("R2", "Solar", 60.0)).toDF("Site", "tech", "inst_cap")
      val (kept, _) = RenewableTsPipeline.selectQuantile(
        RenewableTsPipeline.parseSeriesKey(raw), Map("WindOn" -> "q50", "Solar" -> "q50"))
      RenewableTsPipeline.supplyTimeseries(kept, caps)
    }

    val processes = stage(spark, outDir, "process_compact") {
      val lifetimes = Seq(("Coal", 45, 1000.0), ("GasOC", 30, 500.0))
        .toDF("Type", "lifetime", "cap_max")
      ProcessPipeline.processTable(
        ProcessPipeline.capacityCohorts(plants, lifetimes, year),
        ProcessPipeline.expansionCandidates(sites.select(col("Site")), lifetimes.drop("lifetime")))
    }

    val commodities = stage(spark, outDir, "commodities") {
      ProcessPipeline.generateCommodities(
        sites.select(col("Site")), Seq("Elec").toDF("Commodity"),
        demand.groupBy(col("region").as("Site")).agg(sum(col("value")).as("annual"))
          .withColumn("Commodity", lit("Elec")))
    }

    // ── model files ─────────────────────────────────────────────────────
    val siteNames = sites.select("Site").collect().map(_.getString(0)).sorted.toSeq
    graft.export.ModelExport.writeWorkbook(s"$outDir/urbs", Map(
      "Transmission" -> graft.export.ModelExport.urbsTransmission(transmission),
      "Process" -> graft.export.ModelExport.urbsProcess(
        processes.withColumn("inv_cost", lit(0.0)).withColumn("fix_cost", lit(0.0))
          .withColumn("var_cost", lit(0.0))),
      "Demand" -> graft.export.ModelExport.demandWide(demand, siteNames),
      "SupIm" -> renewableTs.select(col("t"), concat(col("Site"), lit("."), col("tech")).as("sit"), col("mw"))),
      Map("year" -> year.toString))
    graft.export.ModelExport.writeWorkbook(s"$outDir/evrys", Map(
      "Process" -> graft.export.ModelExport.evrysProcess(processes),
      "Demand" -> graft.export.ModelExport.evrysDemand(demand)),
      Map("year" -> year.toString))

    println(s"[runme] complete: ${new java.io.File(outDir).listFiles().length} artifacts in $outDir")
  }
}
