package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.GeoTiff

/** GeoTIFF codec probe (SCALE.md): write an n×n float raster as a real
  * PackBits GeoTIFF, then measure the distributed strip-pruned decode —
  * full-canvas and windowed — verifying checksums against the closed-form
  * value pattern.
  */
object GeoTiffProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-46s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(6000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gi = GeoTiff.GeoInfo(rows = n, cols = n, x0 = -10.0, y0 = 60.0,
      resX = 1.0 / 240, resY = 1.0 / 240)
    val pix = spark.range(n.toLong * n).select(
      (col("id") / n).cast("int").as("row"),
      (col("id") % n).cast("int").as("col"))
      .withColumn("value", ((col("row") * 7 + col("col") * 3) % 100).cast("double"))
    val path = java.nio.file.Files.createTempDirectory("tifprobe")
      .resolve("big.tif").toString

    time(s"write ${n}x$n float32 PackBits GeoTIFF") {
      GeoTiff.write(pix, gi, path)
    }
    println(s"[probe] file size: ${new java.io.File(path).length() / 1048576} MB")

    val expected = pix.agg(sum("value")).head.getDouble(0)
    time(s"distributed full read ${n}x$n + checksum") {
      val s = GeoTiff.read(spark, path).agg(sum("value")).head.getDouble(0)
      require(s == expected, s"checksum $s != $expected")
    }
    time("windowed read 1024x1024 (strip-pruned)") {
      val w = GeoTiff.read(spark, path, window = Some((100, 200, 1123, 1223)))
        .count()
      require(w == 1024L * 1024, s"window rows $w")
    }
    spark.stop()
  }
}
