package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GeoTiff, Shapefile}
import graft.geo.GeoFns

/** Real-binary codec round trips: ESRI shapefile (.shp/.shx/.dbf) and
  * GeoTIFF (JDK TIFF plugin + geo tags). These close SURVEY §2.1 S4/S5/S8
  * at the codec level (the WKT / pixel-relation models stay the engine's
  * canonical forms).
  */
class CodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmpBase(name: String): String =
    Files.createTempDirectory("codec").resolve(name).toString

  // ------------------------------------------------------------ shapefile

  test("shapefile polygon round trip preserves attrs, rings and holes") {
    val df = Seq(
      (1L, "alpha", 2.5, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
      (2L, "beta", -1.0,
        "POLYGON ((20 0, 40 0, 40 30, 20 30, 20 0), (25 5, 35 5, 35 15, 25 15, 25 5))"),
      (3L, "gamma", 0.0,
        "MULTIPOLYGON (((50 0, 60 0, 60 10, 50 10, 50 0)), ((70 0, 80 0, 80 10, 70 10, 70 0)))"))
      .toDF("id", "name", "score", "geometry")
    val base = tmpBase("polys")
    Shapefile.write(df, "geometry", base)
    assert(Shapefile.shapeType(spark, base) == 5)

    val back = Shapefile.read(spark, base)
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("id", "name", "score", "geometry"))
    // attribute fidelity
    val byId = back.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[String]("name"), r.getAs[Double]("score"), r.getAs[String]("geometry"))).toMap
    assert(byId(1L)._1 == "alpha" && byId(1L)._2 == 2.5)
    assert(byId(2L)._2 == -1.0)
    // geometric fidelity: area survives the ring-orientation round trip
    val areas = back.select($"id", GeoFns.stArea($"geometry").as("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(areas(1L) - 100.0) < 1e-9)
    assert(math.abs(areas(2L) - (600.0 - 100.0)) < 1e-9) // hole subtracted
    assert(math.abs(areas(3L) - 200.0) < 1e-9) // both parts
  }

  test("shapefile .prj sidecar: auto-reprojection and loud unsupported failure") {
    import graft.geo.Crs
    // polygon authored in 4326, projected to UTM 33N, written WITH .prj
    val corners = Seq((14.0, 50.0), (15.0, 50.0), (15.0, 51.0), (14.0, 51.0))
    val ring = (corners :+ corners.head)
      .map { case (lo, la) => Crs.fromWgs84(32633, lo, la) }
      .map { case (x, y) => s"$x $y" }.mkString(", ")
    val df = Seq((7L, s"POLYGON (($ring))")).toDF("id", "geometry")
    val base = tmpBase("utm33")
    Shapefile.write(df, "geometry", base, epsg = Some(32633))
    assert(Files.exists(java.nio.file.Paths.get(base + ".prj")))
    // read back: geometry must arrive in 4326 without being asked
    val back = Shapefile.read(spark, base).collect()(0).getAs[String]("geometry")
    val verts = graft.geo.Geometry.parseGeom(back)(0).outer
    corners.foreach { case (lo, la) =>
      assert(verts.exists(p => math.abs(p.x - lo) < 1e-8 && math.abs(p.y - la) < 1e-8),
        s"corner ($lo, $la) missing from reprojected ring ${verts.toSeq}")
    }
    // an unsupported-but-recognized CRS fails loudly, naming the EPSG
    val base2 = tmpBase("webm")
    Shapefile.write(df, "geometry", base2)
    Files.writeString(java.nio.file.Paths.get(base2 + ".prj"),
      """PROJCS["X",GEOGCS["GCS_NZGD_2000"],AUTHORITY["EPSG","2193"]]""")
    val e = intercept[IllegalArgumentException] { Shapefile.read(spark, base2) }
    assert(e.getMessage.contains("2193"))
    // an unrecognized .prj also fails loudly (never silently assume 4326)
    Files.writeString(java.nio.file.Paths.get(base2 + ".prj"),
      """PROJCS["Mystery_Local_Grid",UNIT["Meter",1.0]]""")
    val e2 = intercept[IllegalArgumentException] { Shapefile.read(spark, base2) }
    assert(e2.getMessage.toLowerCase.contains("unrecognized"))
  }

  test("shapefile .prj outside the EPSG table reprojects through the " +
      "parametric reader") {
    // UTM 33N parameters under a name nothing recognizes: read() must
    // reproject via Crs.parametricFromPrj instead of refusing
    import graft.geo.Crs
    val corners = Seq((14.0, 47.0), (15.5, 47.0), (15.5, 48.2), (14.0, 48.2))
    val ring = (corners :+ corners.head)
      .map { case (lo, la) => Crs.fromWgs84(32633, lo, la) }
      .map { case (x, y) => s"$x $y" }.mkString(", ")
    val df = Seq((1L, s"POLYGON (($ring))")).toDF("id", "geometry")
    val base = tmpBase("parametric")
    Shapefile.write(df, "geometry", base)
    Files.writeString(java.nio.file.Paths.get(base + ".prj"),
      """PROJCS["Some_Local_Grid_1997",GEOGCS["GCS_WGS_1984",""" +
        """DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Transverse_Mercator"],""" +
        """PARAMETER["False_Easting",500000.0],""" +
        """PARAMETER["False_Northing",0.0],""" +
        """PARAMETER["Central_Meridian",15.0],""" +
        """PARAMETER["Scale_Factor",0.9996],""" +
        """PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]""")
    val back = Shapefile.read(spark, base).collect()(0).getAs[String]("geometry")
    val verts = graft.geo.Geometry.parseGeom(back)(0).outer
    corners.foreach { case (lo, la) =>
      assert(verts.exists(p => math.abs(p.x - lo) < 1e-8 && math.abs(p.y - la) < 1e-8),
        s"corner ($lo, $la) missing from reprojected ring ${verts.toSeq}")
    }
  }

  test("shapefile bbox pushdown skips records before decode") {
    val df = Seq(
      (1L, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
      (2L, "POLYGON ((100 100, 110 100, 110 110, 100 110, 100 100))"))
      .toDF("id", "geometry")
    val base = tmpBase("bbox")
    Shapefile.write(df, "geometry", base)
    val hit = Shapefile.read(spark, base, bbox = Some((-5.0, -5.0, 50.0, 50.0)))
    assert(hit.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("shapefile point and polyline round trips") {
    val pts = Seq((1L, "POINT (3.5 -2.25)"), (2L, "POINT (0 0)")).toDF("id", "geometry")
    val pBase = tmpBase("pts")
    Shapefile.write(pts, "geometry", pBase)
    assert(Shapefile.shapeType(spark, pBase) == 1)
    val gotPts = Shapefile.read(spark, pBase).orderBy("id")
      .select("geometry").as[String].collect()
    assert(gotPts(0) == "POINT (3.5 -2.25)")

    val lines = Seq(
      (1L, "LINESTRING (0 0, 5 5, 10 0)"),
      (2L, "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))")).toDF("id", "geometry")
    val lBase = tmpBase("lines")
    Shapefile.write(lines, "geometry", lBase)
    assert(Shapefile.shapeType(spark, lBase) == 3)
    val gotLines = Shapefile.read(spark, lBase).orderBy("id")
      .select("geometry").as[String].collect()
    assert(gotLines(0).startsWith("LINESTRING"))
    assert(gotLines(1).startsWith("MULTILINESTRING"))
    // vertex fidelity
    assert(gotLines(0).contains("5.0 5.0") || gotLines(0).contains("5 5"))
  }

  test("shapefile reader interops with spatial join downstream") {
    val df = Seq(("A", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
      ("B", "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")).toDF("region", "geometry")
    val base = tmpBase("join")
    Shapefile.write(df, "geometry", base)
    val polys = Shapefile.read(spark, base)
    val pts = Seq((1, 2.0, 2.0), (2, 15.0, 5.0)).toDF("id", "x", "y")
    val got = graft.operators.SpatialOps
      .pointInPolygonJoin(pts, "x", "y", polys, "geometry")
      .select("id", "region").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "A"), (2, "B")))
  }

  // -------------------------------------------------------------- geotiff

  test("geotiff write/read round trip: values, size, geotransform") {
    val gi = GeoTiff.GeoInfo(rows = 40, cols = 60, x0 = 5.0, y0 = 55.0,
      resX = 0.25, resY = 0.5)
    // deterministic test pattern
    val pix = spark.range(40L * 60)
      .select((col("id") / 60).cast("int").as("row"),
        (col("id") % 60).cast("int").as("col"))
      .withColumn("value", (col("row") * 100 + col("col")).cast("double"))
    val path = tmpBase("r") + ".tif"
    GeoTiff.write(pix, gi, path)

    val giBack = GeoTiff.info(spark, path)
    assert(giBack == gi)

    val back = GeoTiff.read(spark, path)
    assert(back.count() == 2400)
    val s = back.agg(sum("value")).head.getDouble(0)
    val expected = (0 until 40).flatMap(r => (0 until 60).map(c => r * 100 + c)).sum.toDouble
    assert(s == expected)
    // spot-check a value
    val v = back.where($"row" === 13 && $"col" === 37).head.getDouble(2)
    assert(v == 1337.0)
  }

  test("geotiff windowed read decodes only the window") {
    val gi = GeoTiff.GeoInfo(rows = 100, cols = 100, x0 = 0, y0 = 100,
      resX = 1.0, resY = 1.0)
    val pix = spark.range(100L * 100)
      .select((col("id") / 100).cast("int").as("row"),
        (col("id") % 100).cast("int").as("col"))
      .withColumn("value", (col("row") + col("col")).cast("double"))
    val path = tmpBase("w") + ".tif"
    GeoTiff.write(pix, gi, path)

    val win = GeoTiff.read(spark, path, window = Some((10, 20, 19, 39)), bandRows = 4)
    assert(win.count() == 10 * 20)
    val mm = win.agg(min("row"), max("row"), min("col"), max("col")).head
    assert((mm.getInt(0), mm.getInt(1), mm.getInt(2), mm.getInt(3)) == (10, 19, 20, 39))
    val sm = win.agg(sum("value")).head.getDouble(0)
    val exp = (for { r <- 10 to 19; c <- 20 to 39 } yield r + c).sum.toDouble
    assert(sm == exp)
  }

  test("geotiff coords follow the north-up geotransform") {
    val gi = GeoTiff.GeoInfo(rows = 2, cols = 2, x0 = 10.0, y0 = 50.0,
      resX = 1.0, resY = 1.0)
    val pix = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (1, 1, 4.0))
      .toDF("row", "col", "value")
    val path = tmpBase("c") + ".tif"
    GeoTiff.write(pix, gi, path)
    val got = GeoTiff.readWithCoords(spark, path)
      .where($"row" === 0 && $"col" === 0).head
    assert(got.getAs[Double]("x") == 10.5)
    assert(got.getAs[Double]("y") == 49.5) // row 0 is the TOP row
  }
}
