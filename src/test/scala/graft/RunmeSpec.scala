package graft

import org.scalatest.funsuite.AnyFunSuite

/** Full Runme program: runs the memoized pipeline end-to-end into a temp
  * dir and checks the reference-shaped artifacts, including the real
  * sites shapefile emission (spatial_functions.py:460-466).
  */
class RunmeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Runme writes sites as a readable ESRI shapefile") {
    val out = java.nio.file.Files.createTempDirectory("runme").toString
    graft.pipeline.Runme.run(spark, out)
    val shp = graft.sources.Shapefile.read(spark, s"$out/sites_shp")
    assert(shp.count() >= 2)
    assert(shp.columns.contains("geometry"))
    // geometry survives: every site polygon has positive area
    val areas = shp.select(graft.geo.GeoFns.stArea(
      org.apache.spark.sql.functions.col("geometry")).as("a"))
      .collect().map(_.getDouble(0))
    assert(areas.forall(_ > 0))

    // the GeoTIFF artifact decodes with the expected canvas + burn values
    val gi = graft.sources.GeoTiff.info(spark, s"$out/sites_raster.tif")
    assert(gi.rows == 40 && gi.cols == 40)
    val px = graft.sources.GeoTiff.read(spark, s"$out/sites_raster.tif")
    val distinctBurns = px.select("value").distinct().count()
    assert(distinctBurns >= 3) // background + >= 2 site ordinals
  }
}
