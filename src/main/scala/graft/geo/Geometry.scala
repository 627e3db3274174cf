package graft.geo

/** Planar geometry kernel over WKT, reproducing the subset of shapely the
  * reference uses (point-in-polygon tagging, polygon area, centroid, overlay
  * intersection, adjacency — code/lib/spatial_functions.py:225-344,480-507,
  * code/lib/initialization.py:38-64). Geometries travel as WKT strings in
  * DataFrame columns; the kernel is pure Scala so the UDFs are serializable
  * and deterministic.
  *
  * Model: POLYGON (outer ring + optional holes) and MULTIPOLYGON are fully
  * supported. Concave×concave overlay runs through a convex decomposition
  * (ear-clipping triangulation) + Sutherland–Hodgman per triangle pair — the
  * Greiner–Hormann-class generality without its degenerate-tracing
  * fragility. Intersection output of the general path is an exact-cover
  * piece MULTIPOLYGON (correct area / mask / containment; ring
  * representation non-canonical).
  *
  * Scale note: the engine's spatial-join strategy (see ops.SpatialOps) is
  * bbox-prefilter + exact-predicate refine with the polygon side broadcast;
  * at 100 TB the upgrade path is tile-salted equi-joins (SURVEY §4) — this
  * kernel stays unchanged, only the join shape changes. Parsed geometry and
  * triangulations are cached per executor JVM (bounded), so the hot join
  * path pays one string hash per probe, not a WKT re-parse.
  */
object Geometry {

  final case class Pt(x: Double, y: Double)

  /** Polygon: outer ring + hole rings; rings stored open (no closing dup). */
  final case class Poly(outer: Array[Pt], holes: Array[Array[Pt]]) {
    def rings: Iterator[Array[Pt]] = Iterator(outer) ++ holes.iterator
  }

  // ------------------------------------------------------------------ parse

  /** Parse "POLYGON ((x y, ...))" — outer ring of the FIRST polygon only
    * (legacy single-ring entry point; prefer [[parseGeom]]).
    */
  def parsePolygon(wkt: String): Array[Pt] = parseGeom(wkt)(0).outer

  def parsePoint(wkt: String): Pt = {
    val inner = wkt.substring(wkt.indexOf("(") + 1, wkt.indexOf(")"))
    val xy = inner.trim.split("\\s+")
    Pt(xy(0).toDouble, xy(1).toDouble)
  }

  /** Parse POLYGON (with holes) or MULTIPOLYGON WKT into polygons. */
  def parseGeom(wkt: String): Array[Poly] = {
    val t = wkt.trim
    val open = t.indexOf('(')
    val body = t.substring(open + 1, t.lastIndexOf(')'))
    if (t.regionMatches(true, 0, "MULTIPOLYGON", 0, 12))
      splitTop(body).map(p => parsePolyBody(strip(p)))
    else Array(parsePolyBody(body))
  }

  /** Split a WKT body on commas at paren depth 0. */
  private def splitTop(s: String): Array[String] = {
    val out = Array.newBuilder[String]
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  private def strip(s: String): String = {
    val t = s.trim
    t.substring(t.indexOf('(') + 1, t.lastIndexOf(')'))
  }

  /** "(r1),(r2),…" → Poly(outer=r1, holes=[r2…]). */
  private def parsePolyBody(body: String): Poly = {
    val rings = splitTop(body).map(r => parseRing(strip(r)))
    Poly(rings.head, rings.tail)
  }

  private def parseRing(s: String): Array[Pt] = {
    val pts = s.split(",").map { p =>
      val xy = p.trim.split("\\s+")
      Pt(xy(0).toDouble, xy(1).toDouble)
    }
    dedupRing(pts)
  }

  // -------------------------------------------------- per-executor caching
  // The polygon side of every spatial join is a (broadcast or exploded)
  // small dimension whose WKT strings repeat across millions of probe rows;
  // re-parsing per row made the string parse dominate the ray cast at
  // raster scale (10⁸ pixels). A bounded per-JVM cache makes the parse
  // amortized-once per executor. On overflow (unbounded distinct geometry
  // streams) we simply parse without caching — correctness unchanged.

  private val MaxCache = 1 << 13
  private val geomCache = new java.util.concurrent.ConcurrentHashMap[String, Array[Poly]]()
  private val triCache = new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Pt]]]()

  def geomCached(wkt: String): Array[Poly] = {
    val hit = geomCache.get(wkt)
    if (hit != null) hit
    else {
      val g = parseGeom(wkt)
      if (geomCache.size < MaxCache) geomCache.putIfAbsent(wkt, g)
      g
    }
  }

  /** Triangulation of a parsed WKT geometry, cached like [[geomCached]]. */
  def trianglesCached(wkt: String): Array[Array[Pt]] = {
    val hit = triCache.get(wkt)
    if (hit != null) hit
    else {
      val tris = geomCached(wkt).flatMap(triangulate)
      if (triCache.size < MaxCache) triCache.putIfAbsent(wkt, tris)
      tris
    }
  }

  // ------------------------------------------------------------ predicates

  /** Even–odd ray casting over ALL rings (outer + holes): a point inside a
    * hole crosses an even number of edges → outside. Boundary points on a
    * horizontal lower edge count as inside (consistent with half-open
    * [min,max) tiling so region tilings assign each point exactly once).
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

  def containsPoly(p: Poly, x: Double, y: Double): Boolean = {
    var inside = containsXY(p.outer, x, y)
    var h = 0
    while (inside && h < p.holes.length) {
      if (containsXY(p.holes(h), x, y)) inside = false
      h += 1
    }
    inside
  }

  def containsGeom(g: Array[Poly], x: Double, y: Double): Boolean = {
    var i = 0
    while (i < g.length) { if (containsPoly(g(i), x, y)) return true; i += 1 }
    false
  }

  // --------------------------------------------------------------- metrics

  /** Unsigned shoelace area of one ring. */
  def ringArea(ring: Array[Pt]): Double = math.abs(signedArea(ring))

  def polyArea(p: Poly): Double = {
    var a = ringArea(p.outer)
    var h = 0
    while (h < p.holes.length) { a -= ringArea(p.holes(h)); h += 1 }
    a
  }

  def geomArea(g: Array[Poly]): Double = {
    var a = 0.0; var i = 0
    while (i < g.length) { a += polyArea(g(i)); i += 1 }
    a
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

  /** Area-weighted centroid across polygons, holes subtracted. */
  def geomCentroid(g: Array[Poly]): Pt = {
    var cx = 0.0; var cy = 0.0; var aSum = 0.0
    for (p <- g; (ring, sign) <- Iterator((p.outer, 1.0)) ++ p.holes.iterator.map((_, -1.0))) {
      val a = ringArea(ring) * sign
      val c = centroid(ring)
      cx += c.x * a; cy += c.y * a; aSum += a
    }
    if (aSum == 0.0) centroid(g(0).outer) else Pt(cx / aSum, cy / aSum)
  }

  def bbox(ring: Array[Pt]): (Double, Double, Double, Double) =
    (ring.map(_.x).min, ring.map(_.y).min, ring.map(_.x).max, ring.map(_.y).max)

  def geomBbox(g: Array[Poly]): (Double, Double, Double, Double) = {
    val bs = g.map(p => bbox(p.outer))
    (bs.map(_._1).min, bs.map(_._2).min, bs.map(_._3).max, bs.map(_._4).max)
  }

  /** Rectangle WKT helper (fixtures + tiling). */
  def rectWkt(xmin: Double, ymin: Double, xmax: Double, ymax: Double): String =
    s"POLYGON (($xmin $ymin, $xmax $ymin, $xmax $ymax, $xmin $ymax, $xmin $ymin))"

  // ------------------------------------------------------- convex clipping

  /** Sutherland–Hodgman clipping: intersection of a subject polygon with a
    * CONVEX clip polygon. Subject may be concave (output may contain
    * zero-width corridors; area/containment remain exact).
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

  // --------------------------------------------------------- triangulation

  /** Ear-clipping triangulation (O(n²)) of a polygon with holes. Holes are
    * bridged into the outer ring first (zero-width cut to the nearest
    * mutually visible vertex), then ears are clipped. Region polygons are
    * 10²–10⁴ vertices — O(n²) on the BROADCAST side only, amortized once
    * per executor by [[trianglesCached]].
    */
  def triangulate(p: Poly): Array[Array[Pt]] = {
    val outer0 = dedupRing(p.outer)
    val outer = if (signedArea(outer0) < 0) outer0.reverse else outer0
    var ring = outer
    // bridge each hole (CW orientation) into the ring
    val holes = p.holes.map { h0 =>
      val h = dedupRing(h0)
      if (signedArea(h) > 0) h.reverse else h
    }.sortBy(h => -h.map(_.x).max) // rightmost holes first (classic order)
    for (hole <- holes) ring = bridgeHole(ring, hole)
    earClip(ring)
  }

  /** Merge a hole into the ring via a bridge from the hole's rightmost
    * vertex to a mutually visible ring vertex (nearest visible; candidates
    * ordered by distance). Valid inputs guarantee one exists.
    */
  private def bridgeHole(ring: Array[Pt], hole: Array[Pt]): Array[Pt] = {
    var mi = 0
    for (i <- hole.indices) if (hole(i).x > hole(mi).x) mi = i
    val m = hole(mi)
    val order = ring.indices.sortBy { i =>
      val dx = ring(i).x - m.x; val dy = ring(i).y - m.y; dx * dx + dy * dy
    }
    val vi = order.find(i => visible(ring, hole, m, ring(i))).getOrElse(
      throw new IllegalArgumentException("no visible bridge vertex for hole (invalid polygon?)"))
    // ring[0..vi] + m + hole rotated from mi + m? — standard splice:
    // ... ring(vi), m, hole(mi+1..), hole(..mi), m? No: open rings; bridge
    // is ring(vi) -> hole(mi) -> around hole -> hole(mi) -> ring(vi).
    val rotated = hole.drop(mi) ++ hole.take(mi) // starts at m
    ring.take(vi + 1) ++ rotated ++ Array(m, ring(vi)) ++ ring.drop(vi + 1)
  }

  /** Is segment m→v free of crossings with ring and hole edges? Touches at
    * the endpoints m/v themselves are allowed.
    */
  private def visible(ring: Array[Pt], hole: Array[Pt], m: Pt, v: Pt): Boolean = {
    def blocked(poly: Array[Pt]): Boolean = {
      var j = poly.length - 1
      var i = 0
      while (i < poly.length) {
        val a = poly(j); val b = poly(i)
        if (!(a == m || b == m || a == v || b == v) && segsIntersect(m, v, a, b))
          return true
        j = i; i += 1
      }
      false
    }
    !(blocked(ring) || blocked(hole))
  }

  /** Ear clipping of a simple CCW ring (bridged rings contain coincident
    * bridge edges — handled by the strict-interior point test).
    */
  private def earClip(ringIn: Array[Pt]): Array[Array[Pt]] = {
    val out = Array.newBuilder[Array[Pt]]
    var idx = ringIn.indices.toBuffer
    var guard = 0
    val maxIter = 4 * ringIn.length * ringIn.length + 64
    while (idx.length > 3 && guard < maxIter) {
      var clipped = false
      var k = 0
      while (k < idx.length && !clipped) {
        val a = ringIn(idx((k + idx.length - 1) % idx.length))
        val b = ringIn(idx(k))
        val c = ringIn(idx((k + 1) % idx.length))
        val cross = (b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)
        if (math.abs(cross) < 1e-12) {
          // collinear (or bridge back-edge) vertex — drop it, no triangle
          idx.remove(k); clipped = true
        } else if (cross > 0 && noVertexInTriangle(ringIn, idx, k, a, b, c)) {
          out += Array(a, b, c)
          idx.remove(k); clipped = true
        } else k += 1
      }
      if (!clipped) {
        // numerically stuck (shouldn't happen on valid input): drop the
        // flattest convex vertex to guarantee termination
        var best = 0; var bestAbs = Double.MaxValue
        for (k <- idx.indices) {
          val a = ringIn(idx((k + idx.length - 1) % idx.length))
          val b = ringIn(idx(k)); val c = ringIn(idx((k + 1) % idx.length))
          val cr = (b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)
          if (cr > 0 && cr < bestAbs) { bestAbs = cr; best = k }
        }
        val a = ringIn(idx((best + idx.length - 1) % idx.length))
        val b = ringIn(idx(best)); val c = ringIn(idx((best + 1) % idx.length))
        out += Array(a, b, c)
        idx.remove(best)
      }
      guard += 1
    }
    if (idx.length == 3) {
      val t = Array(ringIn(idx(0)), ringIn(idx(1)), ringIn(idx(2)))
      if (math.abs(signedArea(t)) > 1e-12) out += t
    }
    out.result()
  }

  /** Ear validity: no other vertex may lie strictly inside the candidate
    * triangle, and no REFLEX vertex may lie on its boundary either — a
    * reflex vertex exactly on an ear edge (e.g. an L-notch on the
    * hypotenuse) means the polygon boundary dips inside the triangle.
    */
  private def noVertexInTriangle(ring: Array[Pt], idx: collection.Seq[Int], k: Int,
      a: Pt, b: Pt, c: Pt): Boolean = {
    val eps = 1e-12
    var i = 0
    while (i < idx.length) {
      val d = (i - k + idx.length) % idx.length
      if (d > 1 && d < idx.length - 1) {
        val p = ring(idx(i))
        if (!(p == a || p == b || p == c)) {
          val d1 = side(a, b, p); val d2 = side(b, c, p); val d3 = side(c, a, p)
          val strictly = d1 > eps && d2 > eps && d3 > eps
          if (strictly) return false
          val inclusive = d1 > -eps && d2 > -eps && d3 > -eps
          if (inclusive) {
            val pv = ring(idx((i + idx.length - 1) % idx.length))
            val nx = ring(idx((i + 1) % idx.length))
            val reflex = (p.x - pv.x) * (nx.y - p.y) - (p.y - pv.y) * (nx.x - p.x) < 0
            if (reflex) return false
          }
        }
      }
      i += 1
    }
    true
  }

  // -------------------------------------------------- general intersection

  /** Intersection ring of two SINGLE-ring polygons where at least one is
    * convex (fast Sutherland–Hodgman path). Used by the convex overlay path;
    * the general path is [[intersectionPiecesGeneral]].
    */
  def intersectionRing(a: Array[Pt], b: Array[Pt]): Array[Pt] = {
    if (isConvex(b)) clipConvex(dedupRing(a), b)
    else if (isConvex(a)) clipConvex(dedupRing(b), a)
    else throw new IllegalArgumentException(
      "intersectionRing requires a convex operand; use intersectionPiecesGeneral")
  }

  /** General polygon∩polygon: triangulate both sides (handles concavity,
    * holes, multipolygons), clip every bbox-overlapping triangle pair
    * (convex×convex), keep pieces with area > eps. The pieces exactly cover
    * the true intersection (triangles partition each operand), so summed
    * areas, masks, and zonal stats are exact.
    */
  def intersectionPiecesGeneral(aw: String, bw: String): Array[Array[Pt]] = {
    val ta = trianglesCached(aw)
    val tb = trianglesCached(bw)
    val out = Array.newBuilder[Array[Pt]]
    var i = 0
    while (i < ta.length) {
      val t1 = ta(i)
      val (ax0, ay0, ax1, ay1) = bbox(t1)
      var j = 0
      while (j < tb.length) {
        val t2 = tb(j)
        val (bx0, by0, bx1, by1) = bbox(t2)
        if (ax0 <= bx1 && bx0 <= ax1 && ay0 <= by1 && by0 <= ay1) {
          val clipped = clipConvex(t1, t2)
          if (clipped.length >= 3 && math.abs(signedArea(clipped)) > 1e-12)
            out += clipped
        }
        j += 1
      }
      i += 1
    }
    out.result()
  }

  // --------------------------------------- canonical overlay rings (S7)

  /** Canonical rings for the GENERAL intersection by directed boundary
    * tracing: ∂(A∩B) = (sub-segments of ∂A inside B) ∪ (sub-segments of
    * ∂B inside A). Orientation is normalized first (outer CCW, holes CW)
    * and each edge keeps its ring's direction, so chaining the kept
    * sub-segments end-to-start reconstructs canonically oriented rings —
    * the clean POLYGON/MULTIPOLYGON shapely emits, instead of the
    * exact-cover triangle pieces.
    *
    * Returns None when tracing cannot produce a verified result —
    * degenerate shared-boundary overlays (collinear edge overlap breaks
    * the one-in-one-out chaining invariant), or any traced result whose
    * area disagrees with the exact piece cover. Callers fall back to the
    * piece MULTIPOLYGON: canonical where possible, never wrong.
    */
  def canonicalIntersection(aw: String, bw: String): Option[Array[Poly]] = {
    val ga = geomCached(aw).map(orientPoly)
    val gb = geomCached(bw).map(orientPoly)
    val exact = intersectionAreaWkt(aw, bw)
    if (exact < 1e-12) return Some(Array.empty)
    val segs = collectInsideSegs(ga, gb) ++ collectInsideSegs(gb, ga)
    chainRings(segs).flatMap { rings =>
      val outers = rings.filter(signedArea(_) > 1e-12)
      val holes = rings.filter(signedArea(_) < -1e-12)
      val area = outers.map(signedArea).sum + holes.map(signedArea).sum
      if (math.abs(area - exact) > 1e-9 + 1e-6 * exact) None
      else {
        // each hole belongs to the outer ring containing its first vertex
        val assigned = Array.fill(outers.length)(
          scala.collection.mutable.ArrayBuffer.empty[Array[Pt]])
        val ok = holes.forall { h =>
          val i = outers.indexWhere(o =>
            containsGeom(Array(Poly(o, Array.empty)), h(0).x, h(0).y))
          if (i < 0) false else { assigned(i) += h.map(p => p); true }
        }
        if (!ok) None
        else Some(outers.zipWithIndex.map { case (o, i) =>
          Poly(o, assigned(i).toArray)
        })
      }
    }
  }

  private def orientPoly(p: Poly): Poly = {
    val o = if (signedArea(p.outer) < 0) p.outer.reverse else p.outer
    val hs = p.holes.map(h => if (signedArea(h) > 0) h.reverse else h)
    Poly(o, hs)
  }

  /** Directed sub-segments of ∂src strictly inside `other`: each edge is
    * split at every crossing with ∂other, and a split keeps iff its
    * midpoint ray-casts inside.
    */
  private def collectInsideSegs(src: Array[Poly], other: Array[Poly])
      : Array[(Pt, Pt)] = {
    val out = Array.newBuilder[(Pt, Pt)]
    for (poly <- src; ring <- poly.rings) {
      val n = ring.length
      var i = 0
      while (i < n) {
        val p = ring(i); val q = ring((i + 1) % n)
        val ts = scala.collection.mutable.SortedSet(0.0, 1.0)
        for (op <- other; or <- op.rings) {
          var j = 0
          while (j < or.length) {
            crossingParam(p, q, or(j), or((j + 1) % or.length)).foreach(ts += _)
            j += 1
          }
        }
        val arr = ts.toArray
        var k = 0
        while (k < arr.length - 1) {
          val t0 = arr(k); val t1 = arr(k + 1)
          if (t1 - t0 > 1e-12) {
            val tm = (t0 + t1) / 2
            if (containsGeom(other,
                p.x + (q.x - p.x) * tm, p.y + (q.y - p.y) * tm))
              out += ((lerp(p, q, t0), lerp(p, q, t1)))
          }
          k += 1
        }
        i += 1
      }
    }
    out.result()
  }

  private def lerp(p: Pt, q: Pt, t: Double): Pt =
    if (t == 0.0) p else if (t == 1.0) q
    else Pt(p.x + (q.x - p.x) * t, p.y + (q.y - p.y) * t)

  /** Parameter t on pq of a transversal crossing with rs (both in [0,1]);
    * parallel/collinear pairs yield None (the midpoint rule decides those).
    */
  private def crossingParam(p: Pt, q: Pt, r: Pt, s: Pt): Option[Double] = {
    val dx1 = q.x - p.x; val dy1 = q.y - p.y
    val dx2 = s.x - r.x; val dy2 = s.y - r.y
    val den = dx1 * dy2 - dy1 * dx2
    if (math.abs(den) < 1e-15) None
    else {
      val t = ((r.x - p.x) * dy2 - (r.y - p.y) * dx2) / den
      val u = ((r.x - p.x) * dy1 - (r.y - p.y) * dx1) / den
      if (t > 0 && t < 1 && u >= 0 && u <= 1) Some(t) else None
    }
  }

  /** Chain directed segments end→start into closed rings (endpoints
    * snap-rounded to 1e-9 so the A-side and B-side computations of the
    * same crossing point unify). Collinear chain vertices are dropped.
    * None iff any start point has ≠ 1 outgoing segment or a chain fails
    * to close — the degenerate cases the caller falls back on.
    */
  private def chainRings(segs: Array[(Pt, Pt)]): Option[Array[Array[Pt]]] = {
    if (segs.isEmpty) return None
    def key(p: Pt): (Long, Long) = (math.rint(p.x * 1e9).toLong,
      math.rint(p.y * 1e9).toLong)
    val byStart = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for (((a, b), i) <- segs.zipWithIndex) {
      if (key(a) == key(b)) return None // degenerate zero-length segment
      if (byStart.put(key(a), i).isDefined) return None // ambiguous fan-out
    }
    val used = new Array[Boolean](segs.length)
    val rings = Array.newBuilder[Array[Pt]]
    for (start <- segs.indices if !used(start)) {
      val pts = scala.collection.mutable.ArrayBuffer[Pt](segs(start)._1)
      var cur = start
      val startKey = key(segs(start)._1)
      var closed = false
      var steps = 0
      while (!closed && steps <= segs.length) {
        used(cur) = true
        val end = segs(cur)._2
        if (key(end) == startKey) closed = true
        else byStart.get(key(end)) match {
          case Some(nxt) if !used(nxt) => pts += end; cur = nxt
          case _ => return None // open chain
        }
        steps += 1
      }
      if (!closed) return None
      val ring = dropCollinear(pts.toArray)
      if (ring.length >= 3) rings += ring
    }
    Some(rings.result())
  }

  private def dropCollinear(ring: Array[Pt]): Array[Pt] = {
    val n = ring.length
    val keep = Array.newBuilder[Pt]
    var i = 0
    while (i < n) {
      val a = ring((i + n - 1) % n); val b = ring(i); val c = ring((i + 1) % n)
      val cross = (b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)
      if (math.abs(cross) > 1e-12) keep += b
      i += 1
    }
    keep.result()
  }

  /** Area of the intersection of two polygons (general: concavity, holes,
    * multipolygons all supported). Fast single-clip path when both are
    * single-ring and one is convex.
    */
  def intersectionAreaWkt(aw: String, bw: String): Double = {
    val ga = geomCached(aw); val gb = geomCached(bw)
    if (ga.length == 1 && gb.length == 1 &&
        ga(0).holes.isEmpty && gb(0).holes.isEmpty &&
        (isConvex(ga(0).outer) || isConvex(gb(0).outer))) {
      val ring = intersectionRing(ga(0).outer, gb(0).outer)
      if (ring.length < 3) 0.0 else ringArea(ring)
    } else {
      var a = 0.0
      for (piece <- intersectionPiecesGeneral(aw, bw)) a += math.abs(signedArea(piece))
      a
    }
  }

  /** Legacy array-level entry (one operand must be convex). */
  def intersectionArea(subject: Array[Pt], clip: Array[Pt]): Double = {
    val out = intersectionRing(subject, clip)
    if (out.length < 3) 0.0 else math.abs(signedArea(out))
  }

  // ----------------------------------------------------- exact adjacency

  /** Inclusive segment intersection (touching endpoints count). */
  def segsIntersect(p1: Pt, p2: Pt, q1: Pt, q2: Pt): Boolean = {
    val d1 = side(q1, q2, p1); val d2 = side(q1, q2, p2)
    val d3 = side(p1, p2, q1); val d4 = side(p1, p2, q2)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else if (d1 == 0 && onSegment(q1, q2, p1)) true
    else if (d2 == 0 && onSegment(q1, q2, p2)) true
    else if (d3 == 0 && onSegment(p1, p2, q1)) true
    else if (d4 == 0 && onSegment(p1, p2, q2)) true
    else false
  }

  private def onSegment(a: Pt, b: Pt, p: Pt): Boolean =
    math.min(a.x, b.x) <= p.x && p.x <= math.max(a.x, b.x) &&
      math.min(a.y, b.y) <= p.y && p.y <= math.max(a.y, b.y)

  /** bbox-level overlap probe (cheap prefilter; NOT an adjacency answer). */
  def bboxOverlaps(a: Array[Poly], b: Array[Poly]): Boolean = {
    val (ax0, ay0, ax1, ay1) = geomBbox(a)
    val (bx0, by0, bx1, by1) = geomBbox(b)
    ax0 <= bx1 && bx0 <= ax1 && ay0 <= by1 && by0 <= ay1
  }

  /** EXACT touches-or-overlaps: true iff the geometries share at least one
    * point (boundary contact OR interior overlap). This is the Queen
    * contiguity predicate over a valid region tiling (shared vertex or
    * shared edge ⇒ true; overlapping bboxes of disjoint shapes ⇒ false).
    * Reference: pysal Queen weights,
    * code/lib/generate_intermediate_files.py:476-483.
    */
  def geomIntersects(aw: String, bw: String): Boolean = {
    val a = geomCached(aw); val b = geomCached(bw)
    if (!bboxOverlaps(a, b)) return false
    // vertex containment either way (covers one-inside-the-other)
    for (pa <- a; ring <- pa.rings; p <- ring)
      if (containsGeom(b, p.x, p.y)) return true
    for (pb <- b; ring <- pb.rings; p <- ring)
      if (containsGeom(a, p.x, p.y)) return true
    // boundary segment crossings / touches (exact, includes shared vertices
    // that the half-open containment rule may not count as inside)
    for (pa <- a; ra <- pa.rings; pb <- b; rb <- pb.rings) {
      var i = 0
      while (i < ra.length) {
        val a1 = ra(i); val a2 = ra((i + 1) % ra.length)
        var j = 0
        while (j < rb.length) {
          if (segsIntersect(a1, a2, rb(j), rb((j + 1) % rb.length))) return true
          j += 1
        }
        i += 1
      }
    }
    false
  }

  /** True touches: boundary contact without interior overlap. */
  def geomTouchesOnly(aw: String, bw: String): Boolean =
    geomIntersects(aw, bw) && intersectionAreaWkt(aw, bw) < 1e-9

  /** Legacy bbox probe name (kept for tiling callers; see bboxOverlaps). */
  def touchesOrIntersects(a: Array[Pt], b: Array[Pt]): Boolean = {
    val (ax0, ay0, ax1, ay1) = bbox(a)
    val (bx0, by0, bx1, by1) = bbox(b)
    ax0 <= bx1 && bx0 <= ax1 && ay0 <= by1 && by0 <= ay1
  }
}

/** Column-level geometry functions. UDF-based (the geometry-bearing side of
  * every reference join is small and broadcast; the probe side pays one
  * hash lookup per row thanks to the executor-level parse cache).
  */
object GeoFns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import Geometry._

  val stContainsXY = udf { (polyWkt: String, x: Double, y: Double) =>
    containsGeom(geomCached(polyWkt), x, y)
  }

  val stArea = udf { (polyWkt: String) => geomArea(geomCached(polyWkt)) }

  val stCentroidX = udf { (polyWkt: String) => geomCentroid(geomCached(polyWkt)).x }
  val stCentroidY = udf { (polyWkt: String) => geomCentroid(geomCached(polyWkt)).y }

  /** bbox columns for the prefilter rewrite (SURVEY §4b): cheap arithmetic
    * BETWEEN predicates evaluated before the exact ray-cast refine.
    */
  val stXmin = udf { (w: String) => geomBbox(geomCached(w))._1 }
  val stYmin = udf { (w: String) => geomBbox(geomCached(w))._2 }
  val stXmax = udf { (w: String) => geomBbox(geomCached(w))._3 }
  val stYmax = udf { (w: String) => geomBbox(geomCached(w))._4 }

  /** J6 overlay: WKT of polygon ∩ polygon; null if empty. Single POLYGON
    * when the fast convex path applies. The general (concave/holes/multi)
    * path emits CANONICAL traced rings (outer + holes, shapely-clean for
    * the S7 shapefile sink); overlays whose tracing degenerates
    * (collinear shared boundaries) fall back to the exact-cover piece
    * MULTIPOLYGON — canonical where possible, never wrong.
    */
  val stIntersectionWkt = udf { (aw: String, bw: String) =>
    val ga = geomCached(aw); val gb = geomCached(bw)
    def ringWkt(r: Array[Pt]): String =
      "((" + (r :+ r.head).map(p => s"${p.x} ${p.y}").mkString(", ") + "))"
    def polyBody(p: Poly): String =
      "(" + (p.outer +: p.holes).map(r =>
        "(" + (r :+ r.head).map(pt => s"${pt.x} ${pt.y}").mkString(", ") + ")")
        .mkString(", ") + ")"
    if (ga.length == 1 && gb.length == 1 &&
        ga(0).holes.isEmpty && gb(0).holes.isEmpty &&
        (isConvex(ga(0).outer) || isConvex(gb(0).outer))) {
      val out = intersectionRing(ga(0).outer, gb(0).outer)
      if (out.length < 3 || math.abs(signedArea(out)) < 1e-12) None
      else Some("POLYGON " + ringWkt(out))
    } else canonicalIntersection(aw, bw) match {
      case Some(polys) if polys.isEmpty => None
      case Some(polys) if polys.length == 1 =>
        Some("POLYGON " + polyBody(polys(0)))
      case Some(polys) =>
        Some("MULTIPOLYGON (" + polys.map(polyBody).mkString(", ") + ")")
      case None =>
        val pieces = intersectionPiecesGeneral(aw, bw)
        if (pieces.isEmpty) None
        else Some("MULTIPOLYGON (" + pieces.map(ringWkt).mkString(", ") + ")")
    }
  }

  /** J6 overlay: area of polygon ∩ polygon (general). */
  val stIntersectionArea = udf { (aw: String, bw: String) => intersectionAreaWkt(aw, bw) }

  /** J9 adjacency: EXACT touches-or-overlaps (Queen contiguity on valid
    * tilings); bbox prefilter inside.
    */
  val stTouches = udf { (aw: String, bw: String) => geomIntersects(aw, bw) }

  /** Strict touches: boundary contact, interiors disjoint. */
  val stTouchesOnly = udf { (aw: String, bw: String) => geomTouchesOnly(aw, bw) }

  /** Exact point-in-polygon with bbox short-circuit, as a join predicate:
    * the bbox test prunes before the UDF refine.
    */
  def containsPredicate(polyWkt: Column, xmin: Column, ymin: Column,
      xmax: Column, ymax: Column, x: Column, y: Column): Column =
    x >= xmin && x < xmax && y >= ymin && y < ymax && stContainsXY(polyWkt, x, y)
}
