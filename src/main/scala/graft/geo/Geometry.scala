package graft.geo

/** Minimal planar geometry kernel over WKT, reproducing the subset of
  * shapely the reference uses (point-in-polygon tagging, polygon area,
  * centroid, bbox prefilters — code/lib/spatial_functions.py:480-507,
  * code/lib/initialization.py:38-64). Geometries travel as WKT strings in
  * DataFrame columns; the kernel is pure Scala so the UDFs are
  * serializable and deterministic.
  *
  * Scale note: the engine's spatial-join strategy (see ops.SpatialOps) is
  * bbox-prefilter + exact-predicate refine with the polygon side broadcast;
  * at 100 TB the upgrade path is tile-salted equi-joins (SURVEY §4) — this
  * kernel stays unchanged, only the join shape changes.
  */
object Geometry {

  final case class Pt(x: Double, y: Double)

  /** Parse "POLYGON ((x y, x y, ...))" — outer ring only (the reference's
    * region polygons; holes unsupported, multipolygons split upstream).
    */
  def parsePolygon(wkt: String): Array[Pt] = {
    val inner = wkt.substring(wkt.indexOf("((") + 2, wkt.indexOf("))"))
    inner.split(",").map { p =>
      val xy = p.trim.split("\\s+")
      Pt(xy(0).toDouble, xy(1).toDouble)
    }
  }

  def parsePoint(wkt: String): Pt = {
    val inner = wkt.substring(wkt.indexOf("(") + 1, wkt.indexOf(")"))
    val xy = inner.trim.split("\\s+")
    Pt(xy(0).toDouble, xy(1).toDouble)
  }

  /** Even–odd ray casting; boundary points on a horizontal lower edge count
    * as inside (consistent with half-open [min,max) tiling so region tilings
    * assign each point exactly once).
    */
  def containsXY(ring: Array[Pt], x: Double, y: Double): Boolean = {
    var inside = false
    var j = ring.length - 1
    var i = 0
    while (i < ring.length) {
      val pi = ring(i); val pj = ring(j)
      if ((pi.y > y) != (pj.y > y) &&
          x < (pj.x - pi.x) * (y - pi.y) / (pj.y - pi.y) + pi.x)
        inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Signed shoelace area (positive for counter-clockwise rings). */
  def ringArea(ring: Array[Pt]): Double = {
    var s = 0.0
    var j = ring.length - 1
    var i = 0
    while (i < ring.length) {
      s += (ring(j).x + ring(i).x) * (ring(j).y - ring(i).y)
      j = i; i += 1
    }
    math.abs(s) / 2.0
  }

  def centroid(ring: Array[Pt]): Pt = {
    // Polygon centroid via the standard area-weighted formula.
    var cx = 0.0; var cy = 0.0; var a = 0.0
    var j = ring.length - 1
    var i = 0
    while (i < ring.length) {
      val cross = ring(j).x * ring(i).y - ring(i).x * ring(j).y
      cx += (ring(j).x + ring(i).x) * cross
      cy += (ring(j).y + ring(i).y) * cross
      a += cross
      j = i; i += 1
    }
    if (a == 0.0) Pt(ring.map(_.x).sum / ring.length, ring.map(_.y).sum / ring.length)
    else Pt(cx / (3.0 * a), cy / (3.0 * a))
  }

  def bbox(ring: Array[Pt]): (Double, Double, Double, Double) =
    (ring.map(_.x).min, ring.map(_.y).min, ring.map(_.x).max, ring.map(_.y).max)

  /** Rectangle WKT helper (fixtures + tiling). */
  def rectWkt(xmin: Double, ymin: Double, xmax: Double, ymax: Double): String =
    s"POLYGON (($xmin $ymin, $xmax $ymin, $xmax $ymax, $xmin $ymax, $xmin $ymin))"
}

/** Column-level geometry functions. UDF-based for now (the geometry-bearing
  * side of every reference join is small and broadcast); promotion to native
  * Catalyst expressions is the planned optimization once semantics freeze.
  */
object GeoFns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  val stContainsXY = udf { (polyWkt: String, x: Double, y: Double) =>
    Geometry.containsXY(Geometry.parsePolygon(polyWkt), x, y)
  }

  val stArea = udf { (polyWkt: String) =>
    Geometry.ringArea(Geometry.parsePolygon(polyWkt))
  }

  val stCentroidX = udf { (polyWkt: String) => Geometry.centroid(Geometry.parsePolygon(polyWkt)).x }
  val stCentroidY = udf { (polyWkt: String) => Geometry.centroid(Geometry.parsePolygon(polyWkt)).y }

  /** bbox columns for the prefilter rewrite (SURVEY §4b): cheap arithmetic
    * BETWEEN predicates evaluated before the exact ray-cast refine.
    */
  val stXmin = udf { (w: String) => Geometry.bbox(Geometry.parsePolygon(w))._1 }
  val stYmin = udf { (w: String) => Geometry.bbox(Geometry.parsePolygon(w))._2 }
  val stXmax = udf { (w: String) => Geometry.bbox(Geometry.parsePolygon(w))._3 }
  val stYmax = udf { (w: String) => Geometry.bbox(Geometry.parsePolygon(w))._4 }

  /** Exact point-in-polygon with bbox short-circuit, as a join predicate:
    * the bbox test prunes before the UDF refine.
    */
  def containsPredicate(polyWkt: Column, xmin: Column, ymin: Column,
      xmax: Column, ymax: Column, x: Column, y: Column): Column =
    x >= xmin && x < xmax && y >= ymin && y < ymax && stContainsXY(polyWkt, x, y)
}
