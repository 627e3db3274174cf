package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.export.ModelExport
import graft.sources.InputMaps

class ExportInputMapsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pixelGrid covers the scope with cell centers") {
    val g = InputMaps.pixelGrid(spark, 2, 3, 0, 0, 3, 2)
    assert(g.count() == 6)
    val r = g.filter($"row" === 0 && $"col" === 0).head
    assert(r.getAs[Double]("x") == 0.5 && r.getAs[Double]("y") == 0.5)
  }

  test("rasterize burns polygon attribute, background elsewhere") {
    val g = InputMaps.pixelGrid(spark, 2, 2, 0, 0, 2, 2)
    val polys = Seq((7, "POLYGON ((0 0, 1 0, 1 2, 0 2, 0 0))")).toDF("cls", "wkt")
    val got = InputMaps.rasterize(g, polys, "wkt", "cls", background = 0)
      .collect().map(r => ((r.getAs[Int]("row"), r.getAs[Int]("col")), r.getAs[Int]("cls"))).toMap
    assert(got((0, 0)) == 7 && got((1, 0)) == 7)
    assert(got((0, 1)) == 0 && got((1, 1)) == 0)
  }

  test("remap + upsample + window compose on the pixel relation") {
    val px = Seq((0, 0, 1.0), (0, 1, 2.0)).toDF("row", "col", "value")
    val mapping = Seq((1.0, 10.0)).toDF("f", "to")
    val remapped = InputMaps.remap(px, "value", mapping, "f", "to")
    assert(remapped.collect().map(_.getDouble(2)).sorted.toSeq == Seq(2.0, 10.0))
    val up = InputMaps.upsample(px, 2)
    assert(up.count() == 8)
    assert(up.filter($"row" === 1 && $"col" === 1).head.getDouble(2) == 1.0)
    assert(InputMaps.window(up, 0, 2, 2, 4).count() == 4)
  }

  test("band-partitioned raster: windowed read prunes partitions at planning") {
    val px = InputMaps.pixelGrid(spark, 40, 10, 0, 0, 10, 40)
      .withColumn("value", $"row" * 10.0 + $"col")
    val path = java.nio.file.Files.createTempDirectory("raster").toString + "/lu"
    InputMaps.writeRaster(px, path, bandRows = 10)
    val win = InputMaps.readWindow(spark, path, r0 = 10, r1 = 20, c0 = 0, c1 = 10,
      bandRows = 10)
    assert(win.count() == 100)
    assert(win.agg(min($"row"), max($"row")).head.toSeq == Seq(10, 19))
    val plan = win.queryExecution.executedPlan.toString
    val pfIdx = plan.indexOf("PartitionFilters")
    assert(pfIdx >= 0 && plan.substring(pfIdx, math.min(pfIdx + 160, plan.length))
      .contains("band"), s"band predicate must be a partition filter:\n$plan")
  }

  test("readWindow: sidecar bandRows wins over the fallback; bad sidecar fails loudly") {
    val px = InputMaps.pixelGrid(spark, 40, 10, 0, 0, 10, 40)
      .withColumn("value", $"row" * 1.0)
    val path = java.nio.file.Files.createTempDirectory("raster2").toString + "/lu"
    InputMaps.writeRaster(px, path, bandRows = 10)
    // deliberately wrong fallback: the sidecar's recorded value must win
    val win = InputMaps.readWindow(spark, path, 10, 20, 0, 10, bandRows = 7)
    assert(win.count() == 100)
    // a sidecar without bandRows must throw, never silently mis-prune
    graft.sources.JsonSidecar.write(path, Map("other" -> "1"), Nil, "test")
    intercept[IllegalStateException] {
      InputMaps.readWindow(spark, path, 10, 20, 0, 10)
    }
  }

  test("urbs sheets project + rename; demand goes wide only at the edge") {
    val trans = Seq(("R1", "R2", "AC", 100.0, 0.93, 5.0))
      .toDF("region_start", "region_end", "tr_type", "capacity_mva", "efficiency", "inv_cost")
    val sheet = ModelExport.urbsTransmission(trans).head
    assert(sheet.getAs[String]("Site In") == "R1")
    assert(sheet.getAs[Double]("eff") == 0.93)

    val ts = Seq(("r1", 1, 5.0), ("r2", 1, 7.0), ("r1", 2, 6.0))
      .toDF("region", "t", "value")
    val wide = ModelExport.demandWide(ts, Seq("r1", "r2")).collect()
    assert(wide.length == 2)
    assert(wide(0).getAs[Double]("r1") == 5.0 && wide(0).getAs[Double]("r2") == 7.0)
    assert(wide(1).getAs[Double]("r2") == 0.0, "missing slot zero-filled")
  }

  test("readMultiHeader flattens and forward-fills 2-level headers") {
    val dir = java.nio.file.Files.createTempDirectory("mh")
    val f = dir.resolve("profiles.csv")
    java.nio.file.Files.writeString(f,
      "junk line\nH0;;H4\nA;B;C\n1;2;3\n4;5;6\n")
    val got = graft.sources.EuCsv.readMultiHeader(TestSpark.spark, f.toString,
      headerRows = 2, sep = ";", skipRows = 1)
    assert(got.columns.toSeq == Seq("H0_A", "H0_B", "H4_C"),
      got.columns.mkString(","))
    assert(got.count() == 2)
    assert(got.orderBy("H0_A").head.getString(0) == "1")
  }

  test("overlay: SUB_COUNTRY pieces with intersection geometry and area") {
    import graft.operators.SpatialOps
    val subs = Seq(("S1", "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))")).toDF("sub", "swkt")
    val countries = Seq(
      ("DE", "POLYGON ((0 0, 1 0, 1 2, 0 2, 0 0))"),
      ("FR", "POLYGON ((1 0, 2 0, 2 2, 1 2, 1 0))"),
      ("XX", "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))")).toDF("ctry", "cwkt")
    val got = SpatialOps.overlay(subs, "sub", "swkt", countries, "ctry", "cwkt")
      .orderBy("piece").collect()
    assert(got.map(_.getAs[String]("piece")).toSeq == Seq("S1_DE", "S1_FR"))
    got.foreach(r => assert(math.abs(r.getAs[Double]("piece_area") - 1.0) < 1e-9))
  }

  test("evrys projections: process rename, demand stays long") {
    val proc = Seq(("R1", "Coal", 100.0, 1000.0, 1990))
      .toDF("Site", "Type", "inst_cap", "cap_max", "Year")
    val p = ModelExport.evrysProcess(proc).head
    assert(p.getAs[String]("sit") == "R1" && p.getAs[Double]("instcap") == 100.0)
    val dem = Seq(("R1", 1, 5.0)).toDF("region", "t", "value")
    assert(ModelExport.evrysDemand(dem).columns.toSeq == Seq("t", "sit", "value"))
  }

  test("writeWorkbook emits one CSV dir per sheet + JSON sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("wb").toString
    val df = Seq((1, "a")).toDF("k", "v")
    ModelExport.writeWorkbook(dir, Map("sheet1" -> df), Map("year" -> "2015"))
    assert(new java.io.File(s"$dir/sheet1").isDirectory)
    val sidecar = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/sheet1.json")))
    assert(sidecar.contains("\"year\": \"2015\""))
  }
}
