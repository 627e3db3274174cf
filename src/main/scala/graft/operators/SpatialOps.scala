package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.geo.GeoFns

/** Spatial operators over the WKT geometry column model (SURVEY §1.1):
  * polygons broadcast, points/pixels stay distributed.
  *
  * Join strategy (SURVEY §4b): every polygon row carries precomputed bbox
  * columns; the join predicate is `bbox BETWEEN … AND st_contains(…)`, so
  * the cheap arithmetic prunes before the exact ray-cast refine. With the
  * polygon side broadcast this is a BroadcastNestedLoopJoin whose inner
  * test is mostly four double compares. At 100 TB the same operators run
  * tile-salted: add a `tile_id = (floor(x/T), floor(y/T))` key to both
  * sides and equi-join on it first — no operator rewrite, one extra column.
  */
object SpatialOps {

  /** Attach bbox columns to a polygon table (computed once, reused by every
    * downstream join).
    */
  def withBbox(polys: DataFrame, wktCol: String): DataFrame =
    polys.withColumn("__xmin", GeoFns.stXmin(col(wktCol)))
      .withColumn("__ymin", GeoFns.stYmin(col(wktCol)))
      .withColumn("__xmax", GeoFns.stXmax(col(wktCol)))
      .withColumn("__ymax", GeoFns.stYmax(col(wktCol)))

  /** J5: tag each point with the (first matching) containing region.
    * Reference: `get_sites` / sjoin + dedupe
    * (code/lib/spatial_functions.py:480-507). `how` = "inner" drops
    * unmatched points (the reference filters them at :505); "left" keeps
    * them with null region.
    */
  def pointInPolygonJoin(points: DataFrame, xCol: String, yCol: String,
      polys: DataFrame, wktCol: String, how: String = "inner"): DataFrame = {
    val p = withBbox(polys, wktCol)
    val pred = GeoFns.containsPredicate(col(wktCol),
      col("__xmin"), col("__ymin"), col("__xmax"), col("__ymax"),
      col(xCol), col(yCol))
    points.join(broadcast(p), pred, how)
      .drop("__xmin", "__ymin", "__xmax", "__ymax", wktCol)
  }

  /** J5 at cluster scale — tile-salted spatial join (the SURVEY §4 upgrade
    * path, for when the polygon side does NOT fit in a broadcast):
    * each polygon is exploded to the grid tiles its bbox covers, points are
    * keyed by their containing tile, and the join becomes an EQUI join on
    * tile id — shuffle-partitioned on both sides — refined by the exact
    * containment predicate. Neither side is collected or broadcast; skew is
    * bounded by tile size. Semantics are identical to
    * [[pointInPolygonJoin]] (each point matches each polygon at most once:
    * a point lies in exactly one tile).
    */
  def tiledPointInPolygonJoin(points: DataFrame, xCol: String, yCol: String,
      polys: DataFrame, wktCol: String, tileSize: Double,
      how: String = "inner"): DataFrame = {
    val p = withBbox(polys, wktCol)
      .withColumn("__ptx", explode(sequence(
        floor(col("__xmin") / tileSize).cast("long"),
        floor(col("__xmax") / tileSize).cast("long"))))
      .withColumn("__pty", explode(sequence(
        floor(col("__ymin") / tileSize).cast("long"),
        floor(col("__ymax") / tileSize).cast("long"))))
    val pts = points
      .withColumn("__tx", floor(col(xCol) / tileSize).cast("long"))
      .withColumn("__ty", floor(col(yCol) / tileSize).cast("long"))
    val exact = GeoFns.containsPredicate(col(wktCol),
      col("__xmin"), col("__ymin"), col("__xmax"), col("__ymax"),
      col(xCol), col(yCol))
    // The exact predicate lives in the join condition (not a post-filter)
    // so `how = "left"` keeps unmatched points with null polygon columns —
    // same contract as pointInPolygonJoin. Catalyst still extracts the
    // tile equalities as hash keys; the rest is the join-side residual.
    pts.join(p, col("__tx") === col("__ptx") && col("__ty") === col("__pty") && exact, how)
      .drop("__tx", "__ty", "__ptx", "__pty",
        "__xmin", "__ymin", "__xmax", "__ymax", wktCol)
  }

  /** Scanline crossings of a geometry at height y: sorted x-interval pairs
    * [lo, hi) where the scanline is inside. Same even–odd, half-open
    * arithmetic as `Geometry.containsXY`, so membership is IDENTICAL —
    * computed once per (polygon, pixel row) instead of once per pixel.
    */
  private val scanIntervals = udf { (wkt: String, y: Double) =>
    val g = graft.geo.Geometry.geomCached(wkt)
    val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
    var gi = 0
    while (gi < g.length) {
      for (ring <- g(gi).rings) {
        var j = ring.length - 1
        var i = 0
        while (i < ring.length) {
          val pi = ring(i); val pj = ring(j)
          if ((pi.y > y) != (pj.y > y))
            xs += (pj.x - pi.x) * (y - pi.y) / (pj.y - pi.y) + pi.x
          j = i; i += 1
        }
      }
      gi += 1
    }
    val s = xs.sorted
    (0 until s.length / 2).map(k => Seq(s(2 * k), s(2 * k + 1)))
  }

  /** J5/S9/A6 at raster scale — scanline point-in-polygon join. Pixel
    * centers sit on a regular row grid, so the polygon boundary needs to be
    * intersected once per (polygon, pixel ROW), not once per pixel:
    * O(verts · rows + pixels) instead of O(pixels · verts). At the
    * reference's map size (1.3·10⁸ pixels, 10²–10⁴-vertex country shapes)
    * that is a ~400× kernel-work reduction; the per-pixel cost collapses to
    * one broadcast-hash probe on the row id plus interval compares.
    * Interval table size = rows × polygons (≈10⁵–10⁷ rows) — broadcast
    * here; shuffle-join on `rowCol` instead if polygons × rows outgrows a
    * broadcast. Semantics identical to [[pointInPolygonJoin]] (proven in
    * GeoSpec on concave / hole / multipolygon fixtures).
    */
  def scanlinePointInPolygonJoin(grid: DataFrame, xCol: String, yCol: String,
      rowCol: String, polys: DataFrame, wktCol: String,
      how: String = "inner"): DataFrame = {
    val rowYs = grid.select(col(rowCol).as("__row"), col(yCol).as("__y")).distinct()
    val b = withBbox(polys, wktCol)
    val iv = rowYs.join(broadcast(b),
        col("__y") >= col("__ymin") && col("__y") <= col("__ymax"))
      .withColumn("__iv", explode(scanIntervals(col(wktCol), col("__y"))))
      .withColumn("__xlo", element_at(col("__iv"), 1))
      .withColumn("__xhi", element_at(col("__iv"), 2))
      .drop("__iv", "__y", "__xmin", "__ymin", "__xmax", "__ymax", wktCol)
    grid.join(broadcast(iv),
        col(rowCol) === col("__row") && col(xCol) >= col("__xlo") && col(xCol) < col("__xhi"),
        how)
      .drop("__row", "__xlo", "__xhi")
  }

  /** A6 zonal statistics on the scanline path (raster-scale variant of
    * [[zonalStats]]).
    */
  def zonalStatsScanline(pixels: DataFrame, xCol: String, yCol: String,
      rowCol: String, valueCol: String, polys: DataFrame, wktCol: String,
      regionCol: String): DataFrame =
    scanlinePointInPolygonJoin(pixels, xCol, yCol, rowCol, polys, wktCol)
      .groupBy(col(regionCol))
      .agg(sum(col(valueCol)).as("zonal_sum"),
        max(col(valueCol)).as("zonal_max"),
        count(lit(1)).as("zonal_count"))

  /** J6: polygon overlay — `intersection_subregions_countries`
    * (code/lib/spatial_functions.py:225-276): every intersecting
    * (subregion, country) pair yields a piece named "SUB_COUNTRY" with the
    * intersection geometry; empty intersections dropped (the reference's
    * area>0 filter, lib/initialization.py:43). Broadcast nested-loop over
    * the small side with bbox prefilter — the reference's O(n·m) python
    * loop as one declarative join. The intersection kernel is fully general
    * (concave×concave, holes, multipolygons — triangulated convex
    * decomposition, see geo.Geometry); concave pieces come back as
    * exact-cover MULTIPOLYGONs.
    */
  def overlay(subregions: DataFrame, subNameCol: String, subWktCol: String,
      countries: DataFrame, cNameCol: String, cWktCol: String): DataFrame = {
    val bboxed = withBbox(subregions, subWktCol)
    val cb = countries
      .withColumn("__cxmin", GeoFns.stXmin(col(cWktCol)))
      .withColumn("__cymin", GeoFns.stYmin(col(cWktCol)))
      .withColumn("__cxmax", GeoFns.stXmax(col(cWktCol)))
      .withColumn("__cymax", GeoFns.stYmax(col(cWktCol)))
    val bboxOverlap = col("__xmin") <= col("__cxmax") && col("__cxmin") <= col("__xmax") &&
      col("__ymin") <= col("__cymax") && col("__cymin") <= col("__ymax")
    bboxed.join(broadcast(cb), bboxOverlap)
      .withColumn("piece_wkt", GeoFns.stIntersectionWkt(col(subWktCol), col(cWktCol)))
      .filter(col("piece_wkt").isNotNull)
      .withColumn("piece", concat(col(subNameCol), lit("_"), col(cNameCol)))
      .withColumn("piece_area", GeoFns.stArea(col("piece_wkt")))
      .filter(col("piece_area") > 0)
      .select(col("piece"), col(subNameCol), col(cNameCol), col("piece_wkt"), col("piece_area"))
  }

  /** A6: zonal statistics — per-region SUM / MAX / COUNT over a pixel
    * relation (code/lib/spatial_functions.py:279-344). The per-region numpy
    * masking loop becomes ONE spatial join + ONE groupBy: a single shuffle
    * keyed by region regardless of raster size.
    */
  def zonalStats(pixels: DataFrame, xCol: String, yCol: String, valueCol: String,
      polys: DataFrame, wktCol: String, regionCol: String): DataFrame =
    pointInPolygonJoin(pixels, xCol, yCol, polys, wktCol)
      .groupBy(col(regionCol))
      .agg(sum(col(valueCol)).as("zonal_sum"),
        max(col(valueCol)).as("zonal_max"),
        count(lit(1)).as("zonal_count"))
}
