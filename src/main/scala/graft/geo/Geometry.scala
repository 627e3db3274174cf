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
    * Rings are assumed SIMPLE (non-self-intersecting), which valid WKT
    * guarantees; a self-intersecting ring is invalid input and the kernel's
    * convexity test cannot detect it.
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

  /** Sutherland–Hodgman clipping: intersection of a subject polygon with a
    * CONVEX clip polygon (the reference's overlay J6 clips subregions by
    * country polygons, code/lib/spatial_functions.py:225-276; convex clips
    * cover the engine's tiling/bbox uses — general concave overlay is a
    * documented limitation).
    */
  def clipConvex(subject: Array[Pt], clip: Array[Pt]): Array[Pt] = {
    // ensure counter-clockwise clip ring for a stable inside test
    val ccw = if (signedArea(clip) < 0) clip.reverse else clip
    var out = dedupRing(subject)
    var i = 0
    while (i < ccw.length && out.length > 0) {
      val a = ccw(i); val b = ccw((i + 1) % ccw.length)
      val in = out
      out = Array.empty
      var j = 0
      while (j < in.length) {
        val p = in(j); val q = in((j + 1) % in.length)
        val pIn = side(a, b, p) >= 0
        val qIn = side(a, b, q) >= 0
        if (pIn) {
          out :+= p
          if (!qIn) out :+= lineIntersect(a, b, p, q)
        } else if (qIn) out :+= lineIntersect(a, b, p, q)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Is the ring convex? (all cross products of consecutive edges share a
    * sign; collinear edges allowed).
    */
  def isConvex(ringIn: Array[Pt]): Boolean = {
    val ring = dedupRing(ringIn)
    if (ring.length < 4) true
    else {
      var sign = 0
      var i = 0
      while (i < ring.length) {
        val a = ring(i); val b = ring((i + 1) % ring.length); val c = ring((i + 2) % ring.length)
        val cross = (b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)
        if (cross != 0.0) {
          val s = if (cross > 0) 1 else -1
          if (sign == 0) sign = s
          else if (s != sign) return false
        }
        i += 1
      }
      true
    }
  }

  def signedArea(ring: Array[Pt]): Double = {
    var s = 0.0
    var j = ring.length - 1
    for (i <- ring.indices) { s += ring(j).x * ring(i).y - ring(i).x * ring(j).y; j = i }
    s / 2.0
  }

  private def dedupRing(r: Array[Pt]): Array[Pt] =
    if (r.length > 1 && r.head == r.last) r.dropRight(1) else r

  private def side(a: Pt, b: Pt, p: Pt): Double =
    (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)

  private def lineIntersect(a: Pt, b: Pt, p: Pt, q: Pt): Pt = {
    val a1 = b.y - a.y; val b1 = a.x - b.x; val c1 = a1 * a.x + b1 * a.y
    val a2 = q.y - p.y; val b2 = p.x - q.x; val c2 = a2 * p.x + b2 * p.y
    val det = a1 * b2 - a2 * b1
    Pt((b2 * c1 - b1 * c2) / det, (a1 * c2 - a2 * c1) / det)
  }

  /** Intersection ring of two polygons. At least ONE operand must be
    * convex (Sutherland–Hodgman's requirement on the clip side) —
    * intersection is symmetric, so the convex operand is chosen as the
    * clip automatically; if neither is convex this FAILS LOUDLY instead of
    * returning silently wrong geometry (the documented kernel limit;
    * concave×concave overlay needs a Greiner–Hormann-class kernel).
    */
  def intersectionRing(a: Array[Pt], b: Array[Pt]): Array[Pt] = {
    if (isConvex(b)) clipConvex(dedupRing(a), b)
    else if (isConvex(a)) clipConvex(dedupRing(b), a)
    else throw new IllegalArgumentException(
      "polygon intersection requires at least one convex operand " +
        "(Sutherland–Hodgman clip); got two concave rings")
  }

  /** Area of the intersection of two polygons (one must be convex). */
  def intersectionArea(subject: Array[Pt], clip: Array[Pt]): Double = {
    val out = intersectionRing(subject, clip)
    if (out.length < 3) 0.0 else math.abs(signedArea(out))
  }

  /** Do two polygons touch or overlap? (bbox test + clip area/edge probe —
    * sufficient for the adjacency-pairs operator over tilings.)
    */
  def touchesOrIntersects(a: Array[Pt], b: Array[Pt]): Boolean = {
    val (ax0, ay0, ax1, ay1) = bbox(a)
    val (bx0, by0, bx1, by1) = bbox(b)
    ax0 <= bx1 && bx0 <= ax1 && ay0 <= by1 && by0 <= ay1
  }
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

  /** J6 overlay: WKT of polygon ∩ polygon (one operand must be convex —
    * chosen automatically; concave×concave throws); null if empty.
    */
  val stIntersectionWkt = udf { (subjectWkt: String, clipWkt: String) =>
    val out = Geometry.intersectionRing(
      Geometry.parsePolygon(subjectWkt), Geometry.parsePolygon(clipWkt))
    if (out.length < 3) None
    else {
      val ring = out :+ out.head
      Some("POLYGON ((" + ring.map(p => s"${p.x} ${p.y}").mkString(", ") + "))")
    }
  }

  /** J6 overlay: area of polygon ∩ polygon (convex clip). */
  val stIntersectionArea = udf { (subjectWkt: String, clipWkt: String) =>
    Geometry.intersectionArea(Geometry.parsePolygon(subjectWkt), Geometry.parsePolygon(clipWkt))
  }

  /** J9 adjacency: polygons touching or overlapping (bbox-level probe). */
  val stTouches = udf { (aWkt: String, bWkt: String) =>
    Geometry.touchesOrIntersects(Geometry.parsePolygon(aWkt), Geometry.parsePolygon(bWkt))
  }

  /** Exact point-in-polygon with bbox short-circuit, as a join predicate:
    * the bbox test prunes before the UDF refine.
    */
  def containsPredicate(polyWkt: Column, xmin: Column, ymin: Column,
      xmax: Column, ymax: Column, x: Column, y: Column): Column =
    x >= xmin && x < xmax && y >= ymin && y < ymax && stContainsXY(polyWkt, x, y)
}
