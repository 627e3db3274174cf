package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SpatialOps

/** Raster-side input maps — the reference's `generate_maps` family
  * (code/lib/input_maps.py): land/sea masks, rasterized region layers,
  * landuse/population windows. On the pixel-relation model
  * (SURVEY §1.1) these are all plain DataFrame ops.
  */
object InputMaps {

  /** Build a pixel grid (the raster canvas): one row per (row, col) with
    * cell-center coordinates for a scope of `rows × cols` cells over the
    * bbox (xmin..xmax, ymin..ymax). Distributed via crossJoin of two
    * ranges — no driver materialization.
    */
  def pixelGrid(spark: SparkSession, rows: Int, cols: Int,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): DataFrame = {
    val dx = (xmax - xmin) / cols
    val dy = (ymax - ymin) / rows
    spark.range(rows).select(col("id").cast("int").as("row"))
      .crossJoin(spark.range(cols).select(col("id").cast("int").as("col")))
      .withColumn("x", lit(xmin) + (col("col") + 0.5) * dx)
      .withColumn("y", lit(ymin) + (col("row") + 0.5) * dy)
  }

  /** S9 rasterize: burn a polygon attribute into the grid — pixel-center
    * point-in-polygon join (the reference's gdal.RasterizeLayer,
    * input_maps.py:196-219). Unmatched pixels get `background`.
    */
  def rasterize(grid: DataFrame, polys: DataFrame, wktCol: String,
      burnCol: String, background: Any = 0): DataFrame =
    SpatialOps.pointInPolygonJoin(grid, "x", "y", polys, wktCol, "left")
      .withColumn(burnCol, coalesce(col(burnCol), lit(background)))

  /** Raster index ↔ coordinate transforms (`crd_merra`/`ind_merra`/
    * `ind_global`, code/lib/spatial_functions.py:21-115) — pure column
    * arithmetic over the pixel relation: cell (row, col) of a grid anchored
    * at (x0, y0) with resolution `res` has center (x0+(col+0.5)res,
    * y0+(row+0.5)res), and a coordinate maps back by floor-division.
    */
  def idxToCrd(df: DataFrame, x0: Double, y0: Double, resX: Double,
      resY: Double): DataFrame =
    df.withColumn("x", lit(x0) + (col("col") + 0.5) * resX)
      .withColumn("y", lit(y0) + (col("row") + 0.5) * resY)

  /** Anisotropic like the reference's MERRA grid (0.5° × 0.625°). */
  def crdToIdx(df: DataFrame, x0: Double, y0: Double, resX: Double,
      resY: Double): DataFrame =
    df.withColumn("col", floor((col("x") - x0) / resX).cast("int"))
      .withColumn("row", floor((col("y") - y0) / resY).cast("int"))

  /** `changem`-style value remap over a pixel relation
    * (code/lib/util.py:255-275): broadcast dict join, J10 on pixels.
    */
  def remap(pixels: DataFrame, valueCol: String, mapping: DataFrame,
      fromCol: String, toCol: String): DataFrame =
    pixels.join(broadcast(mapping), col(valueCol) === col(fromCol), "left")
      .withColumn(valueCol, coalesce(col(toCol), col(valueCol)))
      .drop(fromCol, toCol)

  /** `resizem` block-replicate upsampling by an integer factor
    * (code/lib/util.py:68-93): each source pixel explodes into k×k cells.
    * Map-side only (explode of a constant-size sequence).
    */
  def upsample(pixels: DataFrame, k: Int): DataFrame =
    pixels
      .withColumn("__dr", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("__dc", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("row", col("row") * k + col("__dr"))
      .withColumn("col", col("col") * k + col("__dc"))
      .drop("__dr", "__dc")

  /** Windowed read of a pixel table (the reference's GeoTIFF window,
    * input_maps.py:105-108): a pruned filter — with the pixel parquet
    * partitioned by row band this is partition pruning, not a scan.
    */
  def window(pixels: DataFrame, r0: Int, r1: Int, c0: Int, c1: Int): DataFrame =
    pixels.filter(col("row").between(r0, r1 - 1) && col("col").between(c0, c1 - 1))

  /** S8: persist a pixel relation as the engine's raster format — parquet
    * partitioned by row band, so windowed reads prune whole bands at the
    * directory level before any IO.
    */
  def writeRaster(pixels: DataFrame, path: String, bandRows: Int = 256): Unit = {
    pixels.withColumn("band", (col("row") / bandRows).cast("int"))
      .write.mode("overwrite").partitionBy("band").parquet(path)
    // record the banding in the provenance sidecar — readWindow derives it
    // from here, so a write/read bandRows mismatch (silent wrong pruning)
    // cannot happen. Written through the Hadoop FS of `path` (HDFS/S3-safe).
    JsonSidecar.write(path, Map("bandRows" -> bandRows.toString), Nil,
      "InputMaps.writeRaster", pixels.sparkSession.sessionState.newHadoopConf())
  }

  /** Focal (neighborhood) statistics over the pixel relation: for every
    * cell, mean/min/max/count of values within the (2r+1)² square window
    * (GIS focal ops — smoothing, morphology). Spark-first shape: each
    * pixel explodes to the (2r+1)² cells it CONTRIBUTES to, then one
    * groupBy(row, col) — a single shuffle of (2r+1)²·|pixels| skinny rows
    * with map-side partial aggregation, no self-join, no windows-within-
    * windows. Edge cells aggregate over their in-canvas neighbors only
    * (count carries the actual denominator).
    */
  def focalStats(pixels: DataFrame, radius: Int): DataFrame = {
    require(radius >= 1 && radius <= 7, s"radius $radius out of [1,7] " +
      "(the contribution fan-out is (2r+1)^2 per pixel)")
    val offsets = (-radius to radius).flatMap(dr =>
      (-radius to radius).map(dc => struct(lit(dr).as("dr"), lit(dc).as("dc"))))
    pixels
      .select(col("row"), col("col"), col("value"),
        explode(array(offsets: _*)).as("o"))
      .select((col("row") + col("o.dr")).as("row"),
        (col("col") + col("o.dc")).as("col"), col("value"))
      .groupBy(col("row"), col("col"))
      .agg(avg(col("value")).as("focal_mean"),
        min(col("value")).as("focal_min"),
        max(col("value")).as("focal_max"),
        count(lit(1)).as("focal_n"))
      // contributions land outside the canvas beyond the edge; the caller
      // re-filters to the canvas extent (we don't know it here)
  }

  /** Windowed read against a band-partitioned raster: the band predicate is
    * a PARTITION filter (pruned at planning), row/col are pushed to
    * parquet row-group stats. `bandRows` comes from the write-time sidecar
    * (resolved through the Hadoop FileSystem of `path`, so HDFS/S3 rasters
    * resolve exactly like local ones); the parameter is only the fallback
    * for sidecar-less rasters. A sidecar that exists but records no
    * banding FAILS LOUDLY — wrong pruning silently drops rows.
    */
  def readWindow(spark: SparkSession, path: String, r0: Int, r1: Int,
      c0: Int, c1: Int, bandRows: Int = 256): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val effective = JsonSidecar.readParams(path + ".json", conf) match {
      case Some(params) => params.get("bandRows") match {
        case Some(v) => v.toInt
        case None => throw new IllegalStateException(
          s"raster sidecar $path.json records no bandRows — refusing to guess " +
            "partition pruning (a mismatch silently drops rows)")
      }
      case None => bandRows
    }
    spark.read.parquet(path)
      .filter(col("band").between(r0 / effective, (r1 - 1) / effective))
      .filter(col("row").between(r0, r1 - 1) && col("col").between(c0, c1 - 1))
      .drop("band")
  }
}
