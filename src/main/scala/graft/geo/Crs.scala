package graft.geo

/** CRS reprojection to/from WGS84 lon/lat — the engine-side equivalent of
  * the reference's `.to_crs(epsg:4326)` input normalization
  * (code/lib/initialization.py:39,58,80). Supported source CRSs are the
  * ones European energy inputs actually arrive in:
  *
  *  - EPSG:4326 (passthrough)
  *  - EPSG:3857 Web Mercator (spherical, a = 6378137)
  *  - EPSG:3035 ETRS89-LAEA — the standard European equal-area grid
  *    (ellipsoidal GRS80, Snyder's oblique Lambert azimuthal equal-area,
  *    φ₀ = 52°N, λ₀ = 10°E, false origin 4321000/3210000)
  *
  * Pure-scalar kernels (serializable, deterministic); column-level entry
  * points in [[CrsFns]]. Everything downstream (spatial joins, areas,
  * rasters) stays in 4326 — reproject once at ingestion, exactly like the
  * reference.
  */
object Crs {

  val WebMercator = 3857
  val EtrsLaea = 3035
  val Wgs84 = 4326

  private val A = 6378137.0 // WGS84/GRS80 semi-major axis

  // ---- GRS80 ellipsoid constants for EPSG:3035 ----
  private val F = 1.0 / 298.257222101
  private val E2 = F * (2 - F)
  private val E = math.sqrt(E2)
  private val Lat0 = math.toRadians(52.0)
  private val Lon0 = math.toRadians(10.0)
  private val X0 = 4321000.0
  private val Y0 = 3210000.0

  /** Snyder's q (authalic latitude numerator), eq. 3-12. Public because it
    * also gives exact ellipsoidal cell areas:
    * area(φ₁..φ₂, Δλ) = Δλ · a² · (q(φ₂) − q(φ₁)) / 2.
    */
  def authalicQ(phi: Double): Double = qOf(phi)

  private def qOf(phi: Double): Double = {
    val s = math.sin(phi)
    (1 - E2) * (s / (1 - E2 * s * s) - (1 / (2 * E)) * math.log((1 - E * s) / (1 + E * s)))
  }

  private val Qp = qOf(math.Pi / 2)
  private val Rq = A * math.sqrt(Qp / 2)
  private val Beta1 = math.asin(qOf(Lat0) / Qp)
  private val M1 = math.cos(Lat0) / math.sqrt(1 - E2 * math.sin(Lat0) * math.sin(Lat0))
  private val D = A * M1 / (Rq * math.cos(Beta1))

  /** (x, y) in `epsg` → (lon, lat) degrees. */
  def toWgs84(epsg: Int, x: Double, y: Double): (Double, Double) = epsg match {
    case Wgs84 => (x, y)
    case WebMercator =>
      (math.toDegrees(x / A),
        math.toDegrees(2 * math.atan(math.exp(y / A)) - math.Pi / 2))
    case EtrsLaea =>
      val xp = x - X0; val yp = y - Y0
      val rho = math.sqrt((xp / D) * (xp / D) + (D * yp) * (D * yp))
      if (rho < 1e-12) (math.toDegrees(Lon0), math.toDegrees(Lat0))
      else {
        val ce = 2 * math.asin(rho / (2 * Rq))
        val q = Qp * (math.cos(ce) * math.sin(Beta1) +
          D * yp * math.sin(ce) * math.cos(Beta1) / rho)
        val lon = Lon0 + math.atan2(xp * math.sin(ce),
          D * rho * math.cos(Beta1) * math.cos(ce) -
            D * D * yp * math.sin(Beta1) * math.sin(ce))
        (math.toDegrees(lon), math.toDegrees(latFromQ(q)))
      }
    case other => throw new IllegalArgumentException(
      s"unsupported source CRS EPSG:$other (supported: 4326, 3857, 3035)")
  }

  /** (lon, lat) degrees → (x, y) in `epsg`. */
  def fromWgs84(epsg: Int, lon: Double, lat: Double): (Double, Double) = epsg match {
    case Wgs84 => (lon, lat)
    case WebMercator =>
      val phi = math.toRadians(lat)
      (A * math.toRadians(lon), A * math.log(math.tan(math.Pi / 4 + phi / 2)))
    case EtrsLaea =>
      val phi = math.toRadians(lat); val lam = math.toRadians(lon)
      val beta = math.asin(qOf(phi) / Qp)
      val dl = lam - Lon0
      val b = Rq * math.sqrt(2 / (1 + math.sin(Beta1) * math.sin(beta) +
        math.cos(Beta1) * math.cos(beta) * math.cos(dl)))
      (X0 + b * D * math.cos(beta) * math.sin(dl),
        Y0 + (b / D) * (math.cos(Beta1) * math.sin(beta) -
          math.sin(Beta1) * math.cos(beta) * math.cos(dl)))
    case other => throw new IllegalArgumentException(
      s"unsupported target CRS EPSG:$other (supported: 4326, 3857, 3035)")
  }

  /** Latitude from authalic q by Newton iteration (Snyder eq. 3-16). */
  private def latFromQ(q: Double): Double = {
    // clamp: |q| can exceed |qp| by rounding at the poles
    if (math.abs(q) >= Qp) return if (q > 0) math.Pi / 2 else -math.Pi / 2
    var phi = math.asin(q / 2)
    var i = 0
    while (i < 8) {
      val s = math.sin(phi)
      val denom = 1 - E2 * s * s
      phi += denom * denom / (2 * math.cos(phi)) *
        (q / (1 - E2) - s / denom + (1 / (2 * E)) * math.log((1 - E * s) / (1 + E * s)))
      i += 1
    }
    phi
  }

  /** Reproject every vertex of a WKT POLYGON/MULTIPOLYGON into 4326. */
  def wktToWgs84(epsg: Int, wkt: String): String = {
    if (epsg == Wgs84) return wkt
    val g = Geometry.parseGeom(wkt)
    def ring(r: Array[Geometry.Pt]): String =
      "(" + (r :+ r.head).map { p =>
        val (lon, lat) = toWgs84(epsg, p.x, p.y); s"$lon $lat"
      }.mkString(", ") + ")"
    def poly(p: Geometry.Poly): String =
      "(" + (Iterator(p.outer) ++ p.holes.iterator).map(ring).mkString(", ") + ")"
    if (g.length == 1) "POLYGON " + poly(g(0))
    else "MULTIPOLYGON (" + g.map(poly).mkString(", ") + ")"
  }
}

/** Column-level CRS functions (S4 CRS leg: reproject at ingestion). */
object CrsFns {
  import org.apache.spark.sql.functions.udf

  val toLon = udf { (epsg: Int, x: Double, y: Double) => Crs.toWgs84(epsg, x, y)._1 }
  val toLat = udf { (epsg: Int, x: Double, y: Double) => Crs.toWgs84(epsg, x, y)._2 }

  /** Reproject a WKT geometry column into 4326. */
  val wktToWgs84 = udf { (epsg: Int, wkt: String) => Crs.wktToWgs84(epsg, wkt) }
}
