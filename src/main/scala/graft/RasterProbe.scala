package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SpatialOps
import graft.sources.InputMaps

/** 100× raster-path scale probe: ~1.3·10⁸ pixels — the reference's actual
  * map size (code/config.py:129-131: Europe at 1/240° ≈ 1.3e8 cells) —
  * through rasterize (S9), zonal stats (A6), the band-partitioned raster
  * sink/window (S8/S5), and upsample (§2.8). Region polygons are densified
  * to ~800 vertices like real country shapes, so the probe also measures
  * what the per-executor geometry cache buys over per-row WKT parsing
  * (the round-1 scale-killer): step `zonal_uncached_1e6` re-runs a window
  * with a parse-per-row UDF for an honest A/B.
  *
  * Run: sbt "runMain graft.RasterProbe [rows] [cols]"   (default 11500²)
  * Results are recorded in SCALE.md §"100× raster probe".
  */
object RasterProbe {

  /** Axis-aligned rectangle densified to ~`n` collinear vertices — same
    * parse/containment cost profile as a real high-vertex region polygon,
    * but with exactly-known pixel membership for correctness checks.
    */
  private def denseRectWkt(x0: Double, y0: Double, x1: Double, y1: Double, n: Int): String = {
    val perEdge = n / 4
    def edge(ax: Double, ay: Double, bx: Double, by: Double) =
      (0 until perEdge).map { i =>
        val t = i.toDouble / perEdge
        s"${ax + (bx - ax) * t} ${ay + (by - ay) * t}"
      }
    val pts = edge(x0, y0, x1, y0) ++ edge(x1, y0, x1, y1) ++
      edge(x1, y1, x0, y1) ++ edge(x0, y1, x0, y0)
    "POLYGON ((" + (pts :+ pts.head).mkString(", ") + "))"
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 11500
    val cols = if (args.length > 1) args(1).toInt else 11500
    val spark = SparkSession.builder()
      .appName("graft-raster-probe").master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.local.dir", "/tmp/graft-probe-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nRegions = 5 // 5×5 tiling
    val cellW = cols.toDouble / nRegions
    val cellH = rows.toDouble / nRegions
    val regions = (0 until nRegions * nRegions).map { i =>
      val cx = i % nRegions; val cy = i / nRegions
      (s"R$i", denseRectWkt(cx * cellW, cy * cellH, (cx + 1) * cellW, (cy + 1) * cellH, 800))
    }.toDF("region", "wkt")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%9.2f s")
      r
    }

    // pixel canvas: one unit per pixel, centers at (c+0.5, r+0.5)
    val grid = InputMaps.pixelGrid(spark, rows, cols, 0, 0, cols, rows)
      .withColumn("value", (col("row") * 31 + col("col")) % 97)

    val total = rows.toLong * cols
    println(s"[probe] pixels=$total regions=${nRegions * nRegions} vertices/region=800")

    // A6 zonal stats over the full canvas — scanline path (crossings once
    // per polygon×row, not per pixel)
    val zonal = timed("zonal_scanline_full") {
      SpatialOps.zonalStatsScanline(grid, "x", "y", "row", "value", regions, "wkt", "region")
        .collect()
    }
    val expectedPer = total / (nRegions * nRegions)
    assert(zonal.length == nRegions * nRegions, s"got ${zonal.length} regions")
    assert(zonal.forall(_.getAs[Long]("zonal_count") == expectedPer),
      s"per-region count != $expectedPer: ${zonal.map(_.getAs[Long]("zonal_count")).min}")

    // S9 rasterize (burn region onto pixels) via scanline — count forces
    // the full pass
    timed("rasterize_scanline_full") {
      SpatialOps.scanlinePointInPolygonJoin(grid, "x", "y", "row", regions, "wkt", "left")
        .filter(col("region").isNotNull).count()
    }

    // per-pixel ray-cast path on the full canvas for comparison (the
    // pre-scanline shape: bbox prefilter + cached parse + per-pixel refine)
    timed("zonal_perpixel_full") {
      SpatialOps.zonalStats(grid, "x", "y", "value", regions, "wkt", "region").collect()
    }

    // A/B: cached vs parse-per-row on a 10⁶-pixel window (the old code
    // parsed the polygon WKT on every surviving probe row)
    val window1e6 = InputMaps.window(grid, 0, 1000, 0, 1000)
    timed("zonal_cached_1e6") {
      SpatialOps.zonalStats(window1e6, "x", "y", "value", regions, "wkt", "region").collect()
    }
    val uncachedContains = udf { (w: String, x: Double, y: Double) =>
      graft.geo.Geometry.containsXY(graft.geo.Geometry.parsePolygon(w), x, y)
    }
    timed("zonal_uncached_1e6") {
      val p = SpatialOps.withBbox(regions, "wkt")
      window1e6.join(broadcast(p),
          col("x") >= col("__xmin") && col("x") < col("__xmax") &&
            col("y") >= col("__ymin") && col("y") < col("__ymax") &&
            uncachedContains(col("wkt"), col("x"), col("y")))
        .groupBy(col("region")).agg(count(lit(1)).as("zonal_count")).collect()
    }

    // S8 band-partitioned sink + pruned window read
    val rasterPath = "/tmp/graft-probe-raster"
    timed("write_raster") {
      InputMaps.writeRaster(grid.select("row", "col", "value"), rasterPath, bandRows = 512)
    }
    val win = timed("read_window_pruned") {
      InputMaps.readWindow(spark, rasterPath, 2048, 2560, 1024, 2048).count()
    }
    assert(win == 512L * 1024, s"window rows=$win")

    // §2.8 upsample ×3 on a 4·10⁶ window → 3.6·10⁷ cells
    val up = timed("upsample_3x_4e6") {
      InputMaps.upsample(InputMaps.window(grid, 0, 2000, 0, 2000)
        .select("row", "col", "value"), 3).count()
    }
    assert(up == 2000L * 2000 * 9, s"upsampled=$up")

    // focal 3x3 over a 4000² window: 1.44e8 contribution rows through one
    // skinny shuffle with map-side partials
    val fo = timed("focal_3x3_1.6e7px") {
      InputMaps.focalStats(InputMaps.window(grid, 0, 4000, 0, 4000)
        .select("row", "col", "value"), 1)
        .filter(col("row").between(0, 3999) && col("col").between(0, 3999))
        .count()
    }
    assert(fo == 4000L * 4000, s"focal cells=$fo")

    println("[probe] PASS")
    spark.stop()
  }
}
