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
  *  - EPSG:32601–32660 / 32701–32760 — WGS84 UTM north/south zones, and
  *    EPSG:25828–25838 — ETRS89 UTM (the projection national European
  *    datasets actually ship in). Krüger 6th-order flattening series
  *    (Karney 2011's formulation — nanometer-level on the ellipsoid,
  *    far inside the double-rounding noise).
  *  - EPSG:2154/3034 Lambert conformal conic; EPSG:27561-64/27571-74
  *    legacy French NTF Lambert (Clarke 1880 IGN, Paris meridian);
  *    EPSG:31466-69 Gauss-Krüger (Bessel, DHDN Helmert bridge);
  *    EPSG:21781/2056 Swiss LV03/LV95 (Rosenmund oblique Mercator,
  *    CH1903 geocentric bridge).
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

  // ---- transverse Mercator (UTM / Gauss-Krüger) — Krüger series ----

  /** UTM zone parameters for an EPSG code, or None if not a UTM code.
    * 326zz/327zz = WGS84 north/south; 258zz = ETRS89 (GRS80) north.
    * Returns (flattening, central meridian rad, false northing).
    */
  private def utmParams(epsg: Int): Option[(Double, Double, Double)] = {
    val WgsF = 1.0 / 298.257223563
    if (epsg >= 32601 && epsg <= 32660)
      Some((WgsF, math.toRadians(-183.0 + 6.0 * (epsg - 32600)), 0.0))
    else if (epsg >= 32701 && epsg <= 32760)
      Some((WgsF, math.toRadians(-183.0 + 6.0 * (epsg - 32700)), 10000000.0))
    else if (epsg >= 25828 && epsg <= 25838)
      Some((F, math.toRadians(-183.0 + 6.0 * (epsg - 25800)), 0.0))
    else None
  }

  private val K0 = 0.9996
  private val E0utm = 500000.0

  /** Krüger series coefficients for third flattening n (Karney 2011 /
    * Kawase 2011 — the standard public 6th-order expansion). `a` is the
    * ellipsoid semi-major axis (WGS84/GRS80 share it; Bessel 1841 for the
    * legacy German Gauss-Krüger zones differs).
    */
  private class TmSeries(f: Double, a: Double = 6378137.0) {
    val n = f / (2 - f)
    val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
    val aCap = a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    val alpha = Array(
      n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288 + 7891 * n6 / 37800,
      13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630 - 1983433 * n6 / 1935360,
      61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
      49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
      34729 * n5 / 80640 - 3418889 * n6 / 1995840,
      212378941 * n6 / 319334400)
    val beta = Array(
      n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512 + 96199 * n6 / 604800,
      n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
      17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
      4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
      4583 * n5 / 161280 - 108847 * n6 / 3991680,
      20648693 * n6 / 638668800)
    val delta = Array(
      2 * n - 2 * n2 / 3 - 2 * n3 + 116 * n4 / 45 + 26 * n5 / 45 - 2854 * n6 / 675,
      7 * n2 / 3 - 8 * n3 / 5 - 227 * n4 / 45 + 2704 * n5 / 315 + 2323 * n6 / 945,
      56 * n3 / 15 - 136 * n4 / 35 - 1262 * n5 / 105 + 73814 * n6 / 2835,
      4279 * n4 / 630 - 332 * n5 / 35 - 399572 * n6 / 14175,
      4174 * n5 / 315 - 144838 * n6 / 6237,
      601676 * n6 / 22275)
    val e2 = f * (2 - f)
    val e = math.sqrt(e2)
  }

  private val tmWgs = new TmSeries(1.0 / 298.257223563)
  private val tmGrs = new TmSeries(F)
  private def tmOf(f: Double): TmSeries =
    if (f == F) tmGrs else tmWgs

  /** Forward transverse Mercator: (lon, lat) deg → (easting, northing). */
  private def tmForward(s: TmSeries, lon0: Double, fn: Double,
      lon: Double, lat: Double, k0: Double = K0,
      fe: Double = E0utm): (Double, Double) = {
    val phi = math.toRadians(lat)
    val dl = math.toRadians(lon) - lon0
    val sp = math.sin(phi)
    // conformal latitude via Karney's tau form, numerically stable
    val t = math.sinh(atanh(sp) - (2 * math.sqrt(s.n) / (1 + s.n)) *
      atanh((2 * math.sqrt(s.n) / (1 + s.n)) * sp))
    val xiP = math.atan2(t, math.cos(dl))
    val etaP = atanh(math.sin(dl) / math.sqrt(1 + t * t))
    var xi = xiP; var eta = etaP
    var j = 1
    while (j <= 6) {
      xi += s.alpha(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
      eta += s.alpha(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
      j += 1
    }
    (fe + k0 * s.aCap * eta, fn + k0 * s.aCap * xi)
  }

  /** Inverse transverse Mercator: (easting, northing) → (lon, lat) deg. */
  private def tmInverse(s: TmSeries, lon0: Double, fn: Double,
      x: Double, y: Double, k0: Double = K0,
      fe: Double = E0utm): (Double, Double) = {
    val xi = (y - fn) / (k0 * s.aCap)
    val eta = (x - fe) / (k0 * s.aCap)
    var xiP = xi; var etaP = eta
    var j = 1
    while (j <= 6) {
      xiP -= s.beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
      etaP -= s.beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    var phi = chi
    j = 1
    while (j <= 6) { phi += s.delta(j - 1) * math.sin(2 * j * chi); j += 1 }
    val lon = lon0 + math.atan2(math.sinh(etaP), math.cos(xiP))
    (math.toDegrees(lon), math.toDegrees(phi))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

  // ---- Lambert conformal conic, two standard parallels (Snyder §15) ----

  /** Ellipsoidal two-SP LCC on GRS80 — the projections French/EU national
    * layers ship in (`initialization.py:39` ingests them via
    * `gpd.read_file(...).to_crs(4326)`):
    * EPSG:2154 RGF93 / Lambert-93, EPSG:3034 ETRS89 / LCC Europe. RGF93
    * and ETRS89 both realize GRS80 within centimeters of WGS84 — no datum
    * shift, unlike the Gauss-Krüger zones below.
    */
  private final class LccProj(aEll: Double, e2Ell: Double, lat0: Double,
      lon0deg: Double, sp1: Double, sp2: Double, val fe: Double,
      val fnn: Double) {
    private val eEll = math.sqrt(e2Ell)
    private def m(phi: Double) = {
      val s = math.sin(phi); math.cos(phi) / math.sqrt(1 - e2Ell * s * s)
    }
    private def t(phi: Double) = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - eEll * s) / (1 + eEll * s), eEll / 2)
    }
    val lon0 = math.toRadians(lon0deg)
    private val p1 = math.toRadians(sp1); private val p2 = math.toRadians(sp2)
    val nCone = math.log(m(p1) / m(p2)) / math.log(t(p1) / t(p2))
    val fBig = m(p1) / (nCone * math.pow(t(p1), nCone))
    val rho0 = aEll * fBig * math.pow(t(math.toRadians(lat0)), nCone)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val rho = aEll * fBig * math.pow(t(math.toRadians(lat)), nCone)
      val theta = nCone * (math.toRadians(lon) - lon0)
      (fe + rho * math.sin(theta), fnn + rho0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - fe; val yp = rho0 - (y - fnn)
      // south-facing cone (nCone < 0): ρ carries n's sign and θ comes
      // from the reflected offsets (Snyder §15, eq. 14-11 note)
      val rho = math.signum(nCone) * math.hypot(xp, yp)
      val theta =
        if (nCone < 0) math.atan2(-xp, -yp) else math.atan2(xp, yp)
      val tp = math.pow(rho / (aEll * fBig), 1 / nCone)
      var phi = math.Pi / 2 - 2 * math.atan(tp)
      var i = 0
      while (i < 12) {
        val s = math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(
          tp * math.pow((1 - eEll * s) / (1 + eEll * s), eEll / 2))
        i += 1
      }
      (math.toDegrees(theta / nCone + lon0), math.toDegrees(phi))
    }
  }

  private val LccCodes: Map[Int, LccProj] = Map(
    2154 -> new LccProj(A, E2, 46.5, 3.0, 44.0, 49.0, 700000.0, 6600000.0),
    3034 -> new LccProj(A, E2, 52.0, 10.0, 35.0, 65.0, 4000000.0, 2800000.0))

  // ---- NTF Lambert zones (EPSG:27561-64 / 27571-74): legacy French ----

  /** One-standard-parallel Lambert conformal conic with scale factor
    * (Snyder §15, sp1 = sp2 limit: n = sin φ0) on an arbitrary ellipsoid —
    * the legacy French national grids (NTF datum, Clarke 1880 IGN, Paris
    * prime meridian). λ0 is carried Greenwich-referenced so the datum
    * bridge below stays in one meridian convention.
    */
  private final class Lcc1Sp(aEll: Double, e2Ell: Double, lat0: Double,
      lon0deg: Double, k0: Double, val fe: Double, val fnn: Double) {
    val lat0deg = lat0 // exposed for .prj emission
    val k0v = k0
    private val eEll = math.sqrt(e2Ell)
    private def t(phi: Double) = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - eEll * s) / (1 + eEll * s), eEll / 2)
    }
    val lon0 = math.toRadians(lon0deg)
    private val p0 = math.toRadians(lat0)
    val nCone = math.sin(p0)
    private val m0 = math.cos(p0) / math.sqrt(1 - e2Ell * math.sin(p0) * math.sin(p0))
    val fBig = m0 / (nCone * math.pow(t(p0), nCone))
    val rho0 = aEll * k0 * fBig * math.pow(t(p0), nCone)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val rho = aEll * k0 * fBig * math.pow(t(math.toRadians(lat)), nCone)
      val theta = nCone * (math.toRadians(lon) - lon0)
      (fe + rho * math.sin(theta), fnn + rho0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - fe; val yp = rho0 - (y - fnn)
      // south-facing cone (nCone < 0, southern-hemisphere lat0): ρ
      // carries n's sign and θ comes from the reflected offsets — the
      // French zones never exercise this, the parametric reader does
      val rho = math.signum(nCone) * math.hypot(xp, yp)
      val theta =
        if (nCone < 0) math.atan2(-xp, -yp) else math.atan2(xp, yp)
      val tp = math.pow(rho / (aEll * k0 * fBig), 1 / nCone)
      var phi = math.Pi / 2 - 2 * math.atan(tp)
      var i = 0
      while (i < 12) {
        val s = math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(
          tp * math.pow((1 - eEll * s) / (1 + eEll * s), eEll / 2))
        i += 1
      }
      (math.toDegrees(theta / nCone + lon0), math.toDegrees(phi))
    }
  }

  /** Albers equal-area conic on an arbitrary ellipsoid (EPSG method 9822;
    * Snyder, Map Projections — A Working Manual, USGS PP 1395 §14,
    * eqs 14-3/14-4 for m and q, 14-12..14-15 forward, 14-19..14-21 and
    * 3-16 inverse). The 1SP limit (sp1 == sp2) degenerates n to sin φ1.
    * Used only via [[parametricFromPrj]] — no per-EPSG anchors.
    */
  private final class AlbersProj(aEll: Double, e2Ell: Double, lat0: Double,
      lon0deg: Double, sp1: Double, sp2: Double, fe: Double, fnn: Double) {
    private val eEll = math.sqrt(e2Ell)
    private def m(phi: Double) = {
      val s = math.sin(phi); math.cos(phi) / math.sqrt(1 - e2Ell * s * s)
    }
    // Snyder 3-12: q = (1−e²)[ sinφ/(1−e²sin²φ) − (1/2e)·ln((1−e·sinφ)/(1+e·sinφ)) ]
    private def q(phi: Double) = {
      val s = math.sin(phi)
      (1 - e2Ell) * (s / (1 - e2Ell * s * s) -
        (1 / (2 * eEll)) * math.log((1 - eEll * s) / (1 + eEll * s)))
    }
    private val lon0 = math.toRadians(lon0deg)
    private val p1 = math.toRadians(sp1); private val p2 = math.toRadians(sp2)
    private val nCone =
      if (sp1 == sp2) math.sin(p1)
      else (m(p1) * m(p1) - m(p2) * m(p2)) / (q(p2) - q(p1))
    private val cBig = m(p1) * m(p1) + nCone * q(p1)
    private def rho(phi: Double) =
      aEll * math.sqrt(cBig - nCone * q(phi)) / nCone
    private val rho0 = rho(math.toRadians(lat0))
    // q at the pole — the convergence bound for the inverse iteration
    private val qPole = q(math.Pi / 2)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val r = rho(math.toRadians(lat))
      val theta = nCone * (math.toRadians(lon) - lon0)
      (fe + r * math.sin(theta), fnn + rho0 - r * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - fe; val yp = rho0 - (y - fnn)
      // south-facing cone (nCone < 0): ρ carries n's sign and θ comes
      // from the reflected offsets (same treatment as the LCC kernels)
      val r = math.signum(nCone) * math.hypot(xp, yp)
      val theta =
        if (nCone < 0) math.atan2(-xp, -yp) else math.atan2(xp, yp)
      val qq = (cBig - (r * nCone / aEll) * (r * nCone / aEll)) / nCone
      // Snyder 3-16 iteration from the spherical start φ = asin(q/2)
      var phi = math.asin(math.max(-1.0, math.min(1.0, qq / 2)))
      if (math.abs(qq) >= math.abs(qPole)) // pole-clamped: series is exact
        phi = math.signum(qq) * math.Pi / 2
      else {
        var i = 0
        while (i < 15) {
          val s = math.sin(phi)
          val oneMe2s2 = 1 - e2Ell * s * s
          phi += oneMe2s2 * oneMe2s2 / (2 * math.cos(phi)) *
            (qq / (1 - e2Ell) - s / oneMe2s2 +
              (1 / (2 * eEll)) * math.log((1 - eEll * s) / (1 + eEll * s)))
          i += 1
        }
      }
      (math.toDegrees(theta / nCone + lon0), math.toDegrees(phi))
    }
  }

  /** Polar Stereographic on an arbitrary ellipsoid (EPSG methods 9810
    * variant A — scale factor at the pole — and 9829 variant B —
    * standard parallel; Snyder PP 1395 §21, eqs 21-33/21-34 forward,
    * 20-18/21-39/21-40 + the 3-5 χ series inverse). `south` mirrors the
    * aspect; variant B's implied k0 is computed by the caller via
    * [[PolarStereo.k0FromStdParallel]].
    */
  private final class PolarStereo(aEll: Double, e2Ell: Double,
      south: Boolean, k0: Double, lon0deg: Double, fe: Double, fnn: Double) {
    private val eEll = math.sqrt(e2Ell)
    private val lon0 = math.toRadians(lon0deg)
    // √((1+e)^(1+e)·(1−e)^(1−e)) — the ρ normalizer (Snyder 21-33)
    private val tc = math.sqrt(math.pow(1 + eEll, 1 + eEll) *
      math.pow(1 - eEll, 1 - eEll))
    // Snyder 15-9: t = tan(π/4 − φ/2)·[(1+e·sinφ)/(1−e·sinφ)]^(e/2)
    private def t(phi: Double) = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) *
        math.pow((1 + eEll * s) / (1 - eEll * s), eEll / 2)
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      // south aspect: the north formulas on the mirrored latitude; the
      // northing term flips sign (E = FE + ρ·sin Δλ either way,
      // N = FN − ρ·cos Δλ north / FN + ρ·cos Δλ south — Snyder p. 161)
      val phiN = if (south) -math.toRadians(lat) else math.toRadians(lat)
      val dl = math.toRadians(lon) - lon0
      val r = 2 * aEll * k0 * t(phiN) / tc
      val e = fe + r * math.sin(dl)
      val n = if (south) fnn + r * math.cos(dl) else fnn - r * math.cos(dl)
      (e, n)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val ex = x - fe; val ny = y - fnn
      val r = math.hypot(ex, ny)
      val tp = r * tc / (2 * aEll * k0)
      val chi = math.Pi / 2 - 2 * math.atan(tp)
      // Snyder 3-5 series χ → φ (exact to e⁸ — sub-micrometer here)
      val e2 = e2Ell; val e4 = e2 * e2; val e6 = e4 * e2; val e8 = e4 * e4
      val phiN = chi +
        (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * math.sin(2 * chi) +
        (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * math.sin(4 * chi) +
        (7 * e6 / 120 + 81 * e8 / 1120) * math.sin(6 * chi) +
        (4279 * e8 / 161280) * math.sin(8 * chi)
      val dl =
        if (r == 0) 0.0
        else if (south) math.atan2(ex, ny) else math.atan2(ex, -ny)
      (math.toDegrees(lon0 + dl),
        math.toDegrees(if (south) -phiN else phiN))
    }
  }

  private object PolarStereo {
    /** Variant B: the scale factor implied by a standard parallel φF
      * (absolute value, radians): k0 = mF·√((1+e)^(1+e)(1−e)^(1−e))/(2·tF)
      * — EPSG Guidance Note 7-2, method 9829.
      */
    def k0FromStdParallel(e2Ell: Double, phiF: Double): Double = {
      val e = math.sqrt(e2Ell)
      val s = math.sin(phiF)
      val mF = math.cos(phiF) / math.sqrt(1 - e2Ell * s * s)
      val tF = math.tan(math.Pi / 4 - phiF / 2) *
        math.pow((1 + e * s) / (1 - e * s), e / 2)
      val tc = math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
      mF * tc / (2 * tF)
    }
  }

  /** Oblique (double) Stereographic on an arbitrary ellipsoid — EPSG
    * method 9809, the formulation in EPSG Guidance Note 7-2: ellipsoid →
    * conformal sphere (Gauss) at the origin, then the spherical oblique
    * stereographic on that sphere. This is the method of Dutch RD New
    * (EPSG 28992) and several other European national grids; it is NOT
    * the same surface mapping as Snyder's ellipsoidal oblique
    * stereographic (the two agree at the origin and diverge slowly
    * outward — a .prj naming Oblique_Stereographic/Double_Stereographic
    * means THIS one). Used only via [[parametricFromPrj]].
    */
  private final class ObliqueStereo(aEll: Double, e2Ell: Double,
      lat0deg: Double, lon0deg: Double, k0: Double, fe: Double,
      fnn: Double) extends Serializable {
    private val eEll = math.sqrt(e2Ell)
    private val phi0 = math.toRadians(lat0deg)
    private val lam0 = math.toRadians(lon0deg)
    private val s0 = math.sin(phi0)
    // R = √(ρ0·ν0): radius of the conformal sphere at the origin
    private val oneMe2s02 = 1 - e2Ell * s0 * s0
    private val bigR = aEll * math.sqrt(1 - e2Ell) / oneMe2s02
    // n and c: the Gauss conformal-sphere constants at the origin
    private val cos0 = math.cos(phi0)
    private val nG = math.sqrt(
      1 + e2Ell * cos0 * cos0 * cos0 * cos0 / (1 - e2Ell))
    private val w1 = math.pow((1 + s0) / (1 - s0) *
      math.pow((1 - eEll * s0) / (1 + eEll * s0), eEll), nG)
    private val sinChi00 = (w1 - 1) / (w1 + 1)
    private val cG = (nG + s0) * (1 - sinChi00) / ((nG - s0) * (1 + sinChi00))
    private val w2 = cG * w1
    private val chi0 = math.asin((w2 - 1) / (w2 + 1))
    private val sinChi0 = math.sin(chi0); private val cosChi0 = math.cos(chi0)

    /** geodetic latitude → conformal latitude χ on the Gauss sphere */
    private def chiOf(phi: Double): Double = {
      val s = math.sin(phi)
      val w = cG * math.pow((1 + s) / (1 - s) *
        math.pow((1 - eEll * s) / (1 + eEll * s), eEll), nG)
      math.asin((w - 1) / (w + 1))
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val lam = math.toRadians(lon)
      // conformal-sphere longitude: Λ − Λ0 = n(λ − λ0)
      val dLam = nG * (lam - lam0)
      val chi = chiOf(math.toRadians(lat))
      val sinChi = math.sin(chi); val cosChi = math.cos(chi)
      val b = 1 + sinChi * sinChi0 + cosChi * cosChi0 * math.cos(dLam)
      (fe + 2 * bigR * k0 * cosChi * math.sin(dLam) / b,
        fnn + 2 * bigR * k0 *
          (sinChi * cosChi0 - cosChi * sinChi0 * math.cos(dLam)) / b)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val ep = x - fe; val np = y - fnn
      val g = 2 * bigR * k0 * math.tan(math.Pi / 4 - chi0 / 2)
      val h = 4 * bigR * k0 * math.tan(chi0) + g
      val ii = math.atan2(ep, h + np)
      val jj = math.atan2(ep, g - np) - ii
      val chi = chi0 + 2 * math.atan2(np - ep * math.tan(jj / 2),
        2 * bigR * k0)
      val dLam = jj + 2 * ii
      val lam = dLam / nG + lam0
      // isometric latitude on the sphere → iterate to geodetic φ
      val sinChi = math.sin(chi)
      val psi = 0.5 * math.log((1 + sinChi) / (cG * (1 - sinChi))) / nG
      var phi = 2 * math.atan(math.exp(psi)) - math.Pi / 2
      var i = 0
      while (i < 6) {
        val s = math.sin(phi)
        val psiI = math.log(math.tan(phi / 2 + math.Pi / 4) *
          math.pow((1 - eEll * s) / (1 + eEll * s), eEll / 2))
        phi -= (psiI - psi) * math.cos(phi) * (1 - e2Ell * s * s) / (1 - e2Ell)
        i += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  private val ClarkeIgnA = 6378249.2
  private val ClarkeIgnF = (6378249.2 - 6356515.0) / 6378249.2
  private val ClarkeIgnE2 = ClarkeIgnF * (2 - ClarkeIgnF)
  /** Paris prime meridian, 2°20′14.025″ E of Greenwich. */
  private val ParisLon = 2.0 + 20.0 / 60 + 14.025 / 3600

  /** EPSG Lambert zone parameters (lat0, k0, FE, FN); 2757x are the
    * "carto" variants with zone-offset false northings.
    */
  private val NtfZones: Map[Int, Lcc1Sp] = {
    def z(lat0: Double, k0: Double, fe: Double, fn: Double) =
      new Lcc1Sp(ClarkeIgnA, ClarkeIgnE2, lat0, ParisLon, k0, fe, fn)
    Map(
      27561 -> z(49.5, 0.999877340, 600000.0, 200000.0),
      27562 -> z(46.8, 0.99987742, 600000.0, 200000.0),
      27563 -> z(44.1, 0.999877499, 600000.0, 200000.0),
      27564 -> z(42.165, 0.99994471, 234.358, 185861.369),
      27571 -> z(49.5, 0.999877340, 600000.0, 1200000.0),
      27572 -> z(46.8, 0.99987742, 600000.0, 2200000.0),
      27573 -> z(44.1, 0.999877499, 600000.0, 3200000.0),
      27574 -> z(42.165, 0.99994471, 234.358, 4185861.369))
  }

  /** NTF ↔ WGS84: the EPSG:1193 3-parameter geocentric translation
    * (−168, −60, +320 m; ~2 m class, the non-grid shift GDAL applies).
    */
  private def ntfToWgs84(lon: Double, lat: Double): (Double, Double) = {
    val (x, y, z) = geodToXyz(ClarkeIgnA, ClarkeIgnE2, lon, lat)
    xyzToGeod(A, Wgs84E2, x - 168.0, y - 60.0, z + 320.0)
  }

  private def wgs84ToNtf(lon: Double, lat: Double): (Double, Double) = {
    val (x, y, z) = geodToXyz(A, Wgs84E2, lon, lat)
    xyzToGeod(ClarkeIgnA, ClarkeIgnE2, x + 168.0, y + 60.0, z - 320.0)
  }

  // ---- Gauss-Krüger zones 2-5 (EPSG:31466-69): Bessel 1841 + DHDN ----

  /** Legacy German national grid: transverse Mercator (k0 = 1, false
    * easting zone·10⁶ + 500000) on the Bessel 1841 ellipsoid, DHDN datum.
    * Unlike every other CRS here the datum is NOT WGS84-equivalent — the
    * 7-parameter Helmert transform (EPSG transformation 1777, position
    * vector, ~3 m accuracy — the non-grid shift GDAL applies) bridges
    * DHDN ↔ WGS84 through geocentric coordinates.
    */
  private val BesselA = 6377397.155
  private val BesselF = 1.0 / 299.1528128
  private val BesselE2 = BesselF * (2 - BesselF)
  private val tmBessel = new TmSeries(BesselF, BesselA)
  private val Wgs84E2 = {
    val f = 1.0 / 298.257223563; f * (2 - f)
  }

  // EPSG:1777 DHDN -> WGS84: translations m, rotations arcsec, scale ppm
  private val DhdnTx = 598.1; private val DhdnTy = 73.7; private val DhdnTz = 418.2
  private val DhdnRx = math.toRadians(0.202 / 3600.0)
  private val DhdnRy = math.toRadians(0.045 / 3600.0)
  private val DhdnRz = math.toRadians(-2.455 / 3600.0)
  private val DhdnS = 1.0 + 6.7e-6

  private def gkLon0(epsg: Int): Double = math.toRadians(3.0 * (epsg - 31464))
  private def gkFe(epsg: Int): Double = (epsg - 31464) * 1000000.0 + 500000.0

  /** Geodetic (h = 0) → geocentric XYZ on an (a, e²) ellipsoid. */
  private def geodToXyz(a: Double, e2: Double, lon: Double, lat: Double)
      : (Double, Double, Double) = {
    val phi = math.toRadians(lat); val lam = math.toRadians(lon)
    val s = math.sin(phi)
    val nu = a / math.sqrt(1 - e2 * s * s)
    (nu * math.cos(phi) * math.cos(lam), nu * math.cos(phi) * math.sin(lam),
      nu * (1 - e2) * s)
  }

  /** Geocentric XYZ → geodetic lon/lat on an (a, e²) ellipsoid (height
    * discarded — the standard 2D datum-shift approximation).
    */
  private def xyzToGeod(a: Double, e2: Double, x: Double, y: Double, z: Double)
      : (Double, Double) = {
    val p = math.hypot(x, y)
    var phi = math.atan2(z, p * (1 - e2))
    var i = 0
    while (i < 10) {
      val s = math.sin(phi)
      val nu = a / math.sqrt(1 - e2 * s * s)
      phi = math.atan2(z + e2 * nu * s, p)
      i += 1
    }
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(phi))
  }

  /** Position-vector Helmert, DHDN geographic → WGS84 geographic. */
  private def dhdnToWgs84(lon: Double, lat: Double): (Double, Double) = {
    val (x, y, z) = geodToXyz(BesselA, BesselE2, lon, lat)
    val x2 = DhdnTx + DhdnS * (x - DhdnRz * y + DhdnRy * z)
    val y2 = DhdnTy + DhdnS * (DhdnRz * x + y - DhdnRx * z)
    val z2 = DhdnTz + DhdnS * (-DhdnRy * x + DhdnRx * y + z)
    xyzToGeod(A, Wgs84E2, x2, y2, z2)
  }

  /** Exact algebraic inverse of [[dhdnToWgs84]]'s transform (transpose of
    * the small-angle rotation over the scale — orthogonal to first order;
    * residual ≈ rot² · R ≈ sub-mm, far under the transform's own 3 m).
    */
  private def wgs84ToDhdn(lon: Double, lat: Double): (Double, Double) = {
    val (x2, y2, z2) = geodToXyz(A, Wgs84E2, lon, lat)
    val dx = (x2 - DhdnTx) / DhdnS
    val dy = (y2 - DhdnTy) / DhdnS
    val dz = (z2 - DhdnTz) / DhdnS
    val x = dx + DhdnRz * dy - DhdnRy * dz
    val y = -DhdnRz * dx + dy + DhdnRx * dz
    val z = DhdnRy * dx - DhdnRx * dy + dz
    xyzToGeod(BesselA, BesselE2, x, y, z)
  }

  // ---- Swiss CH1903/LV03 (EPSG:21781) and CH1903+/LV95 (EPSG:2056) ----

  /** Swiss oblique Mercator (Rosenmund 1903), the swisstopo rigorous
    * "double projection": Bessel 1841 → conformal sphere (Gauss), sphere
    * rotated so the Bern fundamental point (46°57′08.66″N,
    * 7°26′22.50″E) sits on the pseudo-equator, then equatorial Mercator.
    * LV03 (EPSG:21781) adds false origin 600000/200000; LV95 (EPSG:2056)
    * is the SAME projection at 2600000/1200000 on CH1903+ — a datum
    * DEFINED by the one swisstopo geocentric translation this kernel
    * applies (+674.374, +15.056, +405.346 m), so a single bridge serves
    * both (~1–2 m class over Switzerland, the non-grid shift GDAL uses).
    */
  private object Swiss {
    private val e = math.sqrt(BesselE2)
    private val phi0 = math.toRadians(46.0 + 57.0 / 60 + 8.66 / 3600)
    private val lam0 = math.toRadians(7.0 + 26.0 / 60 + 22.50 / 3600)
    private val c0 = math.cos(phi0)
    private val s0 = math.sin(phi0)
    private val alpha =
      math.sqrt(1 + BesselE2 / (1 - BesselE2) * c0 * c0 * c0 * c0)
    private val rSph = BesselA * math.sqrt(1 - BesselE2) / (1 - BesselE2 * s0 * s0)
    private val b0 = math.asin(s0 / alpha)
    private val sb0 = math.sin(b0)
    private val cb0 = math.cos(b0)
    private val bigK = math.log(math.tan(math.Pi / 4 + b0 / 2)) -
      alpha * math.log(math.tan(math.Pi / 4 + phi0 / 2)) +
      alpha * e / 2 * math.log((1 + e * s0) / (1 - e * s0))

    /** CH1903 geographic degrees → projected (E, N) about the 0/0 origin
      * (caller adds the LV03/LV95 false origin).
      */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val sp = math.sin(phi)
      val sBig = alpha * math.log(math.tan(math.Pi / 4 + phi / 2)) -
        alpha * e / 2 * math.log((1 + e * sp) / (1 - e * sp)) + bigK
      val b = 2 * math.atan(math.exp(sBig)) - math.Pi / 2
      val l = alpha * (math.toRadians(lonDeg) - lam0)
      val sb = math.sin(b); val cb = math.cos(b); val cl = math.cos(l)
      val sbb = cb0 * sb - sb0 * cb * cl
      val lbar = math.atan2(cb * math.sin(l), cb0 * cb * cl + sb0 * sb)
      (rSph * lbar, rSph / 2 * math.log((1 + sbb) / (1 - sbb)))
    }

    /** Projected (E, N) about the 0/0 origin → CH1903 geographic degrees. */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val lbar = x / rSph
      val bbar = 2 * math.atan(math.exp(y / rSph)) - math.Pi / 2
      val sb = math.sin(bbar); val cb = math.cos(bbar); val cl = math.cos(lbar)
      val b = math.asin(cb0 * sb + sb0 * cb * cl)
      val l = math.atan2(cb * math.sin(lbar), cb0 * cb * cl - sb0 * sb)
      val sBig = math.log(math.tan(math.Pi / 4 + b / 2))
      var phi = b
      var i = 0
      while (i < 10) {
        val sp = math.sin(phi)
        phi = 2 * math.atan(math.exp((sBig - bigK) / alpha +
          e / 2 * math.log((1 + e * sp) / (1 - e * sp)))) - math.Pi / 2
        i += 1
      }
      (math.toDegrees(lam0 + l / alpha), math.toDegrees(phi))
    }
  }

  /** LV03/LV95 false origins keyed by EPSG. */
  private val SwissOrigins: Map[Int, (Double, Double)] =
    Map(21781 -> (600000.0, 200000.0), 2056 -> (2600000.0, 1200000.0))

  // ---- British National Grid (EPSG:27700): OSGB36 on Airy 1830 ----

  /** Transverse Mercator with a NON-EQUATORIAL latitude of origin
    * (49°N), the one TM shape the UTM/GK dispatch can't express: the
    * true-origin northing folds into an effective false northing
    * −100000 − k0·M(49°), with the meridian arc taken from the SAME
    * Krüger series (self-consistent to the nanometer, no hand-copied
    * constant). Datum bridge = the Ordnance-Survey-published 7-parameter
    * Helmert (position vector, ~5 m class — the non-grid shift GDAL
    * applies; OSTN15 grid accuracy is out of scope).
    */
  private val AiryA = 6377563.396
  private val AiryF = 1.0 / 299.3249646
  private val tmAiry = new TmSeries(AiryF, AiryA)
  private val OsgbLon0 = math.toRadians(-2.0)
  private val OsgbK0 = 0.9996012717
  private val OsgbFe = 400000.0
  private val OsgbFn =
    -100000.0 - tmForward(tmAiry, OsgbLon0, 0.0, -2.0, 49.0, OsgbK0, 0.0)._2

  // OS-published WGS84 -> OSGB36: translations m, rotations arcsec, ppm
  private val OsgbTx = -446.448; private val OsgbTy = 125.157
  private val OsgbTz = -542.060
  private val OsgbRx = math.toRadians(-0.1502 / 3600.0)
  private val OsgbRy = math.toRadians(-0.2470 / 3600.0)
  private val OsgbRz = math.toRadians(-0.8421 / 3600.0)
  private val OsgbS = 1.0 + 20.4894e-6

  /** Position-vector Helmert, WGS84 geographic → OSGB36 geographic. */
  private def wgs84ToOsgb36(lon: Double, lat: Double): (Double, Double) = {
    val (x, y, z) = geodToXyz(A, Wgs84E2, lon, lat)
    val x2 = OsgbTx + OsgbS * (x - OsgbRz * y + OsgbRy * z)
    val y2 = OsgbTy + OsgbS * (OsgbRz * x + y - OsgbRx * z)
    val z2 = OsgbTz + OsgbS * (-OsgbRy * x + OsgbRx * y + z)
    xyzToGeod(AiryA, AiryF * (2 - AiryF), x2, y2, z2)
  }

  /** Exact algebraic inverse of [[wgs84ToOsgb36]] (see [[wgs84ToDhdn]]'s
    * note on the first-order-orthogonal rotation).
    */
  private def osgb36ToWgs84(lon: Double, lat: Double): (Double, Double) = {
    val (x2, y2, z2) = geodToXyz(AiryA, AiryF * (2 - AiryF), lon, lat)
    val dx = (x2 - OsgbTx) / OsgbS
    val dy = (y2 - OsgbTy) / OsgbS
    val dz = (z2 - OsgbTz) / OsgbS
    val x = dx + OsgbRz * dy - OsgbRy * dz
    val y = -OsgbRz * dx + dy + OsgbRx * dz
    val z = OsgbRy * dx - OsgbRx * dy + dz
    xyzToGeod(A, Wgs84E2, x, y, z)
  }

  // ---- Polish PUWG 1992 (EPSG:2180) and PUWG 2000 (EPSG:2176-79) ----

  /** Poland's national grids: plain transverse Mercator on ETRS89/GRS80
    * (no datum bridge — ETRS89 realizes WGS84 within centimeters), same
    * Krüger series as UTM. PUWG 1992 is the single-zone mapping CRS
    * (λ0 = 19°E, k₀ = 0.9993 — the unusually low factor that balances
    * distortion across the country's 10° span — FE 500 km,
    * FN −5300 km); PUWG 2000 are the four cadastral zones (λ0 =
    * 15/18/21/24°E, k₀ = 0.999923, FE = zone·10⁶ + 500000 with zone
    * numbers 5–8 = λ0/3). Spec anchors: scale at the central meridian
    * equals k₀ exactly, the design envelope over Poland's extent, and
    * the zone-offset structure.
    * Returns (lon0 rad, k0, FE, FN) for a Polish EPSG code.
    */
  private def puwgParams(epsg: Int): Option[(Double, Double, Double, Double)] =
    epsg match {
      case 2180 =>
        Some((math.toRadians(19.0), 0.9993, 500000.0, -5300000.0))
      case z if z >= 2176 && z <= 2179 =>
        val zone = z - 2171 // 2176 -> 5 (λ0 15°E) … 2179 -> 8 (λ0 24°E)
        Some((math.toRadians(3.0 * zone), 0.999923,
          zone * 1000000.0 + 500000.0, 0.0))
      case _ => None
    }

  // ---- S-JTSK / Krovak East North (EPSG:5514): Czech/Slovak national ----

  /** Krovak oblique conformal conic (EPSG method 9819) on Bessel 1841 —
    * the S-JTSK national grid of Czechia and Slovakia. Chain: conformal
    * sphere (Gauss) → rotation to the cartographic pole (azimuth
    * 30°17′17.3031″ from the centre at 49°30′N, 24°50′E Greenwich) →
    * tangent conic at pseudo-standard parallel 78°30′ with k₀ = 0.9999.
    * EPSG:5514 is the East-North axis variant: E = −westing,
    * N = −southing, so all CZ/SK coordinates are negative in both axes.
    *
    * Parameter anchor (CrsSpec): the projection's published design
    * property — local scale within its engineering envelope
    * [0.9999, 1.0001] everywhere over CZ/SK (the cone was fitted to keep
    * distortion under ~10 cm/km) — checked against the independent
    * Vincenty geodesic; a wrong λ0 (e.g. the Ferro-offset mix-up), αC,
    * φP or k₀ blows that envelope by orders of magnitude, and the
    * East-North sign structure pins the axis convention.
    */
  private object Krovak {
    private val e = math.sqrt(BesselE2)
    private val phiC = math.toRadians(49.5)
    private val lam0 = math.toRadians(24.0 + 50.0 / 60) // Greenwich
    private val aC = math.toRadians(30.0 + 17.0 / 60 + 17.3031 / 3600)
    private val pP = math.toRadians(78.5)
    private val k0 = 0.9999
    private val sC = math.sin(phiC)
    private val cC = math.cos(phiC)
    private val aBig = BesselA * math.sqrt(1 - BesselE2) / (1 - BesselE2 * sC * sC)
    private val bBig = math.sqrt(1 + BesselE2 * cC * cC * cC * cC / (1 - BesselE2))
    private val g0 = math.asin(sC / bBig)
    private val t0 = math.tan(math.Pi / 4 + g0 / 2) *
      math.pow((1 + e * sC) / (1 - e * sC), e * bBig / 2) /
      math.pow(math.tan(math.Pi / 4 + phiC / 2), bBig)
    private val nCone = math.sin(pP)
    private val r0 = k0 * aBig / math.tan(pP)
    private val tanP = math.tan(math.Pi / 4 + pP / 2)

    /** S-JTSK geographic degrees (Greenwich) → EPSG:5514 (E, N). */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val sp = math.sin(phi)
      val u = 2 * (math.atan(t0 *
        math.pow(math.tan(math.Pi / 4 + phi / 2), bBig) /
        math.pow((1 + e * sp) / (1 - e * sp), e * bBig / 2)) - math.Pi / 4)
      val v = bBig * (lam0 - math.toRadians(lonDeg))
      val t = math.asin(math.cos(aC) * math.sin(u) +
        math.sin(aC) * math.cos(u) * math.cos(v))
      val d = math.asin(math.cos(u) * math.sin(v) / math.cos(t))
      val theta = nCone * d
      val r = r0 * math.pow(tanP, nCone) /
        math.pow(math.tan(math.Pi / 4 + t / 2), nCone)
      (-r * math.sin(theta), -r * math.cos(theta)) // (E, N) = (−westing, −southing)
    }

    /** EPSG:5514 (E, N) → S-JTSK geographic degrees (Greenwich). */
    def inverse(east: Double, north: Double): (Double, Double) = {
      val xp = -north // southing
      val yp = -east // westing
      val r = math.hypot(xp, yp)
      val theta = math.atan2(yp, xp)
      val d = theta / nCone
      val t = 2 * (math.atan(tanP * math.pow(r0 / r, 1 / nCone)) - math.Pi / 4)
      val u = math.asin(math.cos(aC) * math.sin(t) -
        math.sin(aC) * math.cos(t) * math.cos(d))
      val v = math.asin(math.cos(t) * math.sin(d) / math.cos(u))
      val base = math.pow(math.tan(math.Pi / 4 + u / 2) / t0, 1 / bBig)
      var phi = u
      var i = 0
      while (i < 12) {
        val sp = math.sin(phi)
        phi = 2 * (math.atan(base *
          math.pow((1 + e * sp) / (1 - e * sp), e / 2)) - math.Pi / 4)
        i += 1
      }
      (math.toDegrees(lam0 - v / bBig), math.toDegrees(phi))
    }
  }

  /** S-JTSK ↔ WGS84: the standard 3-parameter geocentric translation
    * (+589, +76, +480 m; ~1–2 m class over CZ/SK — the non-grid shift
    * GDAL applies for EPSG:5514).
    */
  private def sjtskToWgs84(lon: Double, lat: Double): (Double, Double) = {
    val (x, y, z) = geodToXyz(BesselA, BesselE2, lon, lat)
    xyzToGeod(A, Wgs84E2, x + 589.0, y + 76.0, z + 480.0)
  }

  private def wgs84ToSjtsk(lon: Double, lat: Double): (Double, Double) = {
    val (x, y, z) = geodToXyz(A, Wgs84E2, lon, lat)
    xyzToGeod(BesselA, BesselE2, x - 589.0, y - 76.0, z - 480.0)
  }

  private def ch1903ToWgs84(lon: Double, lat: Double): (Double, Double) = {
    val (x, y, z) = geodToXyz(BesselA, BesselE2, lon, lat)
    xyzToGeod(A, Wgs84E2, x + 674.374, y + 15.056, z + 405.346)
  }

  private def wgs84ToCh1903(lon: Double, lat: Double): (Double, Double) = {
    val (x, y, z) = geodToXyz(A, Wgs84E2, lon, lat)
    xyzToGeod(BesselA, BesselE2, x - 674.374, y - 15.056, z - 405.346)
  }

  /** (x, y) in `epsg` → (lon, lat) degrees. */
  def toWgs84(epsg: Int, x: Double, y: Double): (Double, Double) = epsg match {
    case Wgs84 => (x, y)
    case u if utmParams(u).isDefined =>
      val (f, lon0, fn) = utmParams(u).get
      tmInverse(tmOf(f), lon0, fn, x, y)
    case u if LccCodes.contains(u) => LccCodes(u).inverse(x, y)
    case u if NtfZones.contains(u) =>
      val (lonN, latN) = NtfZones(u).inverse(x, y)
      ntfToWgs84(lonN, latN)
    case u if u >= 31466 && u <= 31469 =>
      val (lonB, latB) = tmInverse(tmBessel, gkLon0(u), 0.0, x, y,
        k0 = 1.0, fe = gkFe(u))
      dhdnToWgs84(lonB, latB)
    case u if SwissOrigins.contains(u) =>
      val (fe, fn) = SwissOrigins(u)
      val (lonC, latC) = Swiss.inverse(x - fe, y - fn)
      ch1903ToWgs84(lonC, latC)
    case 27700 =>
      val (lonO, latO) = tmInverse(tmAiry, OsgbLon0, OsgbFn, x, y,
        k0 = OsgbK0, fe = OsgbFe)
      osgb36ToWgs84(lonO, latO)
    case 5514 =>
      val (lonS, latS) = Krovak.inverse(x, y)
      sjtskToWgs84(lonS, latS)
    case u if puwgParams(u).isDefined =>
      val (lon0, k0, fe, fn) = puwgParams(u).get
      tmInverse(tmGrs, lon0, fn, x, y, k0 = k0, fe = fe)
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
      s"unsupported source CRS EPSG:$other (supported: 4326, 3857, 3035, " +
        "UTM 326xx/327xx/258xx, LCC 2154/3034, Gauss-Krüger 31466-69, " +
        "NTF Lambert 2756x/2757x, Swiss 21781/2056, OSGB 27700, Krovak 5514, PUWG 2176-80)")
  }

  /** (lon, lat) degrees → (x, y) in `epsg`. */
  def fromWgs84(epsg: Int, lon: Double, lat: Double): (Double, Double) = epsg match {
    case Wgs84 => (lon, lat)
    case u if utmParams(u).isDefined =>
      val (f, lon0, fn) = utmParams(u).get
      tmForward(tmOf(f), lon0, fn, lon, lat)
    case u if LccCodes.contains(u) => LccCodes(u).forward(lon, lat)
    case u if NtfZones.contains(u) =>
      val (lonN, latN) = wgs84ToNtf(lon, lat)
      NtfZones(u).forward(lonN, latN)
    case u if u >= 31466 && u <= 31469 =>
      val (lonB, latB) = wgs84ToDhdn(lon, lat)
      tmForward(tmBessel, gkLon0(u), 0.0, lonB, latB, k0 = 1.0, fe = gkFe(u))
    case u if SwissOrigins.contains(u) =>
      val (fe, fn) = SwissOrigins(u)
      val (lonC, latC) = wgs84ToCh1903(lon, lat)
      val (xs, ys) = Swiss.forward(lonC, latC)
      (xs + fe, ys + fn)
    case 27700 =>
      val (lonO, latO) = wgs84ToOsgb36(lon, lat)
      tmForward(tmAiry, OsgbLon0, OsgbFn, lonO, latO, k0 = OsgbK0, fe = OsgbFe)
    case 5514 =>
      val (lonS, latS) = wgs84ToSjtsk(lon, lat)
      Krovak.forward(lonS, latS)
    case u if puwgParams(u).isDefined =>
      val (lon0, k0, fe, fn) = puwgParams(u).get
      tmForward(tmGrs, lon0, fn, lon, lat, k0 = k0, fe = fe)
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
      s"unsupported target CRS EPSG:$other (supported: 4326, 3857, 3035, " +
        "UTM 326xx/327xx/258xx, LCC 2154/3034, Gauss-Krüger 31466-69, " +
        "NTF Lambert 2756x/2757x, Swiss 21781/2056, OSGB 27700, Krovak 5514, PUWG 2176-80)")
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

  /** Is `epsg` a CRS this kernel can transform? */
  def isSupported(epsg: Int): Boolean =
    epsg == Wgs84 || epsg == WebMercator || epsg == EtrsLaea ||
      utmParams(epsg).isDefined || LccCodes.contains(epsg) ||
      (epsg >= 31466 && epsg <= 31469) || NtfZones.contains(epsg) ||
      SwissOrigins.contains(epsg) || epsg == 27700 || epsg == 5514 ||
      puwgParams(epsg).isDefined

  /** ESRI-style `.prj` WKT1 for a supported EPSG code. Carries an explicit
    * trailing AUTHORITY so [[epsgFromPrj]] round-trips exactly; the names
    * match what ArcGIS/GDAL emit so third-party tools recognize the file.
    */
  def prjWkt(epsg: Int): String = {
    require(isSupported(epsg), s"prjWkt: unsupported EPSG:$epsg")
    val gcsWgs = "GEOGCS[\"GCS_WGS_1984\",DATUM[\"D_WGS_1984\"," +
      "SPHEROID[\"WGS_1984\",6378137.0,298.257223563]]," +
      "PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]]"
    val gcsEtrs = "GEOGCS[\"GCS_ETRS_1989\",DATUM[\"D_ETRS_1989\"," +
      "SPHEROID[\"GRS_1980\",6378137.0,298.257222101]]," +
      "PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]]"
    def utm(name: String, gcs: String, lon0: Double, fn: Double) =
      s"""PROJCS["$name",$gcs,PROJECTION["Transverse_Mercator"],""" +
        "PARAMETER[\"False_Easting\",500000.0]," +
        s"""PARAMETER["False_Northing",$fn],""" +
        s"""PARAMETER["Central_Meridian",$lon0],""" +
        "PARAMETER[\"Scale_Factor\",0.9996],PARAMETER[\"Latitude_Of_Origin\",0.0]," +
        s"""UNIT["Meter",1.0],AUTHORITY["EPSG","$epsg"]]"""
    epsg match {
      case Wgs84 => gcsWgs.dropRight(1) + s""",AUTHORITY["EPSG","4326"]]"""
      case WebMercator =>
        s"""PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",$gcsWgs,""" +
          "PROJECTION[\"Mercator_Auxiliary_Sphere\"],UNIT[\"Meter\",1.0]," +
          s"""AUTHORITY["EPSG","3857"]]"""
      case EtrsLaea =>
        s"""PROJCS["ETRS_1989_LAEA",$gcsEtrs,""" +
          "PROJECTION[\"Lambert_Azimuthal_Equal_Area\"],UNIT[\"Meter\",1.0]," +
          s"""AUTHORITY["EPSG","3035"]]"""
      case u if u >= 32601 && u <= 32660 =>
        utm(s"WGS_1984_UTM_Zone_${u - 32600}N", gcsWgs, -183.0 + 6.0 * (u - 32600), 0.0)
      case u if u >= 32701 && u <= 32760 =>
        utm(s"WGS_1984_UTM_Zone_${u - 32700}S", gcsWgs, -183.0 + 6.0 * (u - 32700), 10000000.0)
      case 2154 =>
        """PROJCS["RGF_1993_Lambert_93",GEOGCS["GCS_RGF_1993",""" +
          "DATUM[\"D_RGF_1993\",SPHEROID[\"GRS_1980\",6378137.0,298.257222101]]," +
          "PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]]," +
          "PROJECTION[\"Lambert_Conformal_Conic\"]," +
          "PARAMETER[\"False_Easting\",700000.0]," +
          "PARAMETER[\"False_Northing\",6600000.0]," +
          "PARAMETER[\"Central_Meridian\",3.0]," +
          "PARAMETER[\"Standard_Parallel_1\",44.0]," +
          "PARAMETER[\"Standard_Parallel_2\",49.0]," +
          "PARAMETER[\"Latitude_Of_Origin\",46.5]," +
          """UNIT["Meter",1.0],AUTHORITY["EPSG","2154"]]"""
      case 3034 =>
        s"""PROJCS["ETRS_1989_LCC",$gcsEtrs,""" +
          "PROJECTION[\"Lambert_Conformal_Conic\"]," +
          "PARAMETER[\"False_Easting\",4000000.0]," +
          "PARAMETER[\"False_Northing\",2800000.0]," +
          "PARAMETER[\"Central_Meridian\",10.0]," +
          "PARAMETER[\"Standard_Parallel_1\",35.0]," +
          "PARAMETER[\"Standard_Parallel_2\",65.0]," +
          "PARAMETER[\"Latitude_Of_Origin\",52.0]," +
          """UNIT["Meter",1.0],AUTHORITY["EPSG","3034"]]"""
      case u if NtfZones.contains(u) =>
        val zone = Seq("I", "II", "III", "IV")((u % 10) - 1)
        val p = NtfZones(u)
        // full ESRI one-SP LCC form: Latitude_Of_Origin + Scale_Factor
        // must be present or third-party readers reconstruct lat0 = 0
        s"""PROJCS["NTF_Paris_Lambert_Zone_$zone",GEOGCS["GCS_NTF_Paris",""" +
          "DATUM[\"D_NTF\",SPHEROID[\"Clarke_1880_IGN\",6378249.2,293.4660212936265]]," +
          "PRIMEM[\"Paris\",2.337229166666667]," +
          "UNIT[\"Degree\",0.0174532925199433]]," +
          "PROJECTION[\"Lambert_Conformal_Conic\"]," +
          s"""PARAMETER["False_Easting",${p.fe}],""" +
          s"""PARAMETER["False_Northing",${p.fnn}],""" +
          "PARAMETER[\"Central_Meridian\",0.0]," +
          s"""PARAMETER["Standard_Parallel_1",${p.lat0deg}],""" +
          s"""PARAMETER["Scale_Factor",${p.k0v}],""" +
          s"""PARAMETER["Latitude_Of_Origin",${p.lat0deg}],""" +
          s"""UNIT["Meter",1.0],AUTHORITY["EPSG","$u"]]"""
      case 27700 =>
        """PROJCS["British_National_Grid",GEOGCS["GCS_OSGB_1936",""" +
          "DATUM[\"D_OSGB_1936\",SPHEROID[\"Airy_1830\",6377563.396,299.3249646]]," +
          "PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]]," +
          "PROJECTION[\"Transverse_Mercator\"]," +
          "PARAMETER[\"False_Easting\",400000.0]," +
          "PARAMETER[\"False_Northing\",-100000.0]," +
          "PARAMETER[\"Central_Meridian\",-2.0]," +
          "PARAMETER[\"Scale_Factor\",0.9996012717]," +
          "PARAMETER[\"Latitude_Of_Origin\",49.0]," +
          """UNIT["Meter",1.0],AUTHORITY["EPSG","27700"]]"""
      case u if SwissOrigins.contains(u) =>
        val (fe, fn) = SwissOrigins(u)
        val (name, gcsName, datum) =
          if (u == 2056) ("CH1903+_LV95", "GCS_CH1903+", "D_CH1903+")
          else ("CH1903_LV03", "GCS_CH1903", "D_CH1903")
        s"""PROJCS["$name",GEOGCS["$gcsName",DATUM["$datum",""" +
          "SPHEROID[\"Bessel_1841\",6377397.155,299.1528128]]," +
          "PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]]," +
          "PROJECTION[\"Hotine_Oblique_Mercator_Azimuth_Center\"]," +
          s"""PARAMETER["False_Easting",$fe],""" +
          s"""PARAMETER["False_Northing",$fn],""" +
          "PARAMETER[\"Scale_Factor\",1.0]," +
          "PARAMETER[\"Azimuth\",90.0]," +
          "PARAMETER[\"Longitude_Of_Center\",7.439583333333333]," +
          "PARAMETER[\"Latitude_Of_Center\",46.95240555555556]," +
          s"""UNIT["Meter",1.0],AUTHORITY["EPSG","$u"]]"""
      case u if puwgParams(u).isDefined =>
        val (lon0, k0, fe, fn) = puwgParams(u).get
        val name = if (u == 2180) "ETRS_1989_Poland_CS92"
          else s"ETRS_1989_Poland_CS2000_Zone_${u - 2171}"
        s"""PROJCS["$name",$gcsEtrs,""" +
          "PROJECTION[\"Transverse_Mercator\"]," +
          s"""PARAMETER["False_Easting",$fe],""" +
          s"""PARAMETER["False_Northing",$fn],""" +
          s"""PARAMETER["Central_Meridian",${math.toDegrees(lon0)}],""" +
          s"""PARAMETER["Scale_Factor",$k0],""" +
          "PARAMETER[\"Latitude_Of_Origin\",0.0]," +
          s"""UNIT["Meter",1.0],AUTHORITY["EPSG","$u"]]"""
      case 5514 =>
        """PROJCS["S-JTSK_Krovak_East_North",GEOGCS["GCS_S_JTSK",""" +
          "DATUM[\"D_S_JTSK\",SPHEROID[\"Bessel_1841\",6377397.155,299.1528128]]," +
          "PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]]," +
          "PROJECTION[\"Krovak\"]," +
          "PARAMETER[\"False_Easting\",0.0]," +
          "PARAMETER[\"False_Northing\",0.0]," +
          "PARAMETER[\"Pseudo_Standard_Parallel_1\",78.5]," +
          "PARAMETER[\"Scale_Factor\",0.9999]," +
          "PARAMETER[\"Azimuth\",30.28813975]," +
          "PARAMETER[\"Longitude_Of_Center\",24.83333333333333]," +
          "PARAMETER[\"Latitude_Of_Center\",49.5]," +
          "PARAMETER[\"X_Scale\",-1.0],PARAMETER[\"Y_Scale\",1.0]," +
          "PARAMETER[\"XY_Plane_Rotation\",90.0]," +
          """UNIT["Meter",1.0],AUTHORITY["EPSG","5514"]]"""
      case u if u >= 31466 && u <= 31469 =>
        val z = u - 31464
        s"""PROJCS["DHDN_3_Degree_Gauss_Zone_$z",GEOGCS["GCS_Deutsches_Hauptdreiecksnetz",""" +
          "DATUM[\"D_Deutsches_Hauptdreiecksnetz\"," +
          "SPHEROID[\"Bessel_1841\",6377397.155,299.1528128]]," +
          "PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]]," +
          "PROJECTION[\"Gauss_Kruger\"]," +
          s"""PARAMETER["False_Easting",${z}500000.0],""" +
          "PARAMETER[\"False_Northing\",0.0]," +
          s"""PARAMETER["Central_Meridian",${3 * z}.0],""" +
          "PARAMETER[\"Scale_Factor\",1.0],PARAMETER[\"Latitude_Of_Origin\",0.0]," +
          s"""UNIT["Meter",1.0],AUTHORITY["EPSG","$u"]]"""
      case u => // 258xx
        utm(s"ETRS_1989_UTM_Zone_${u - 25800}N", gcsEtrs, -183.0 + 6.0 * (u - 25800), 0.0)
    }
  }

  // --------------------------------------------------- .prj detection

  /** Detect the EPSG code of an ESRI `.prj` sidecar (OGC WKT1). Prefers an
    * explicit top-level AUTHORITY["EPSG", n]; falls back to the name
    * heuristics real-world .prj files need (ESRI writes no authority):
    * UTM zone names, Web-Mercator aliases, the ETRS89-LAEA grid, and
    * plain geographic WGS84/ETRS89. Returns None when unrecognized —
    * callers fail loudly rather than guess.
    */
  def epsgFromPrj(prj: String): Option[Int] = {
    val s = prj.trim
    val up = s.toUpperCase.replace(' ', '_')
    // Only an AUTHORITY that is a DIRECT child of the outermost object
    // (bracket depth 1) names the whole CRS — a GDAL-style PROJCS whose
    // only authority sits on the nested GEOGCS must NOT shortcut to 4326
    // (that would silently take UTM eastings as longitude degrees); such
    // files fall through to the name heuristics below.
    val auth = """AUTHORITY\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]""".r
      .findAllMatchIn(s)
      .filter { m =>
        var depth = 0
        var i = 0
        while (i < m.start) {
          val c = s.charAt(i)
          if (c == '[') depth += 1 else if (c == ']') depth -= 1
          i += 1
        }
        depth == 1
      }
      .toSeq.lastOption.map(_.group(1).toInt)
    if (auth.isDefined) return auth
    val utmZone = """UTM_ZONE_(\d{1,2})([NS])""".r.findFirstMatchIn(up)
    if (up.startsWith("PROJCS")) {
      utmZone match {
        case Some(m) =>
          val z = m.group(1).toInt
          val south = m.group(2) == "S"
          // The zone-name heuristic is only safe on WGS84/ETRS89 datums:
          // NAD_1927_UTM_Zone_17N / NAD_1983_UTM_Zone_17N (EPSG 267xx/269xx,
          // ubiquitous North-American shapefiles) share the name shape but a
          // different datum — treating them as 326xx would reproject with a
          // silent ~200 m datum error. Anything non-WGS/ETRS returns None so
          // the caller refuses loudly by name instead of guessing.
          if (up.contains("ETRS") && !south) Some(25800 + z)
          else if (up.contains("WGS")) {
            if (south) Some(32700 + z) else Some(32600 + z)
          } else None
        case None =>
          val gauss = """GAUSS.{0,10}ZONE_?(\d)""".r.findFirstMatchIn(up)
          if (up.contains("PSEUDO-MERCATOR") || up.contains("PSEUDO_MERCATOR") ||
            up.contains("WEB_MERCATOR")) Some(WebMercator)
          else if (up.contains("LAEA") && up.contains("ETRS")) Some(EtrsLaea)
          else if (up.contains("LAMBERT_93") || up.contains("LAMBERT-93"))
            Some(2154) // RGF93 / Lambert-93 (ESRI: RGF_1993_Lambert_93)
          else if (up.contains("ETRS") && up.contains("LCC")) Some(3034)
          else if (gauss.isDefined && (up.contains("DHDN") ||
              up.contains("HAUPTDREIECKSNETZ"))) {
            val z = gauss.get.group(1).toInt
            if (z >= 2 && z <= 5) Some(31464 + z) else None
          } else if (up.contains("BRITISH_NATIONAL_GRID") ||
              (up.contains("OSGB") && up.contains("TRANSVERSE"))) {
            Some(27700)
          } else if (up.contains("CH1903")) {
            // ESRI CH1903_LV03 / CH1903+_LV95; the '+' or LV95 marks the
            // re-referenced datum (same projection, shifted false origin)
            if (up.contains("CH1903+") || up.contains("LV95")) Some(2056)
            else Some(21781)
          } else if (up.contains("POLAND_CS92") || up.contains("PUWG_1992") ||
              up.contains("PUWG_92")) {
            Some(2180)
          } else if (up.contains("POLAND_CS2000") || up.contains("PUWG_2000")) {
            """ZONE_?(\d)""".r.findFirstMatchIn(up).map(_.group(1).toInt)
              .filter(z => z >= 5 && z <= 8).map(z => 2171 + z)
          } else if (up.contains("KROVAK") || up.contains("S_JTSK") ||
              up.contains("S-JTSK")) {
            // ESRI S-JTSK_Krovak_East_North; the legacy south-west-positive
            // variant (EPSG:5513 / 2065, no "East_North" marker) has a
            // different axis convention — refuse rather than flip signs
            // silently
            if (up.contains("EAST_NORTH") || up.contains("EAST-NORTH"))
              Some(5514)
            else None
          } else if (up.contains("NTF") && up.contains("LAMBERT")) {
            // ESRI NTF_Paris_Lambert_Zone_II etc. → the carto variants
            // (the false-northing family French national data ships in)
            """ZONE_(IV|III|II|I)""".r.findFirstMatchIn(up).map(_.group(1))
              .map {
                case "I" => 27571; case "II" => 27572
                case "III" => 27573; case _ => 27574
              }
          } else None
      }
    } else if (up.startsWith("GEOGCS")) {
      if (up.contains("WGS_1984") || up.contains("WGS_84") ||
        up.contains("WGS84") || up.contains("ETRS_1989") ||
        up.contains("ETRS89")) Some(Wgs84)
      else None
    } else None
  }

  // ------------------------------------ parametric .prj CRS (the tail)

  /** Generic position-vector Helmert bridge (WKT1 `TOWGS84`, EPSG method
    * 9606: local datum → WGS84; 3-parameter when the rotations/scale are
    * zero). Forward is the standard small-angle form `X' = D + s·M·X`
    * with `M = I + skew(rx,ry,rz)`; the inverse applies the EXACT
    * cofactor inverse of `M` (det = 1 + rx² + ry² + rz²), not the
    * first-order transpose, so round-trips close to machine precision
    * even for arc-second-scale rotations.
    */
  private final class HelmertBridge(aLoc: Double, e2Loc: Double,
      dx: Double, dy: Double, dz: Double,
      rxSec: Double, rySec: Double, rzSec: Double, ppm: Double) {
    private val rx = math.toRadians(rxSec / 3600.0)
    private val ry = math.toRadians(rySec / 3600.0)
    private val rz = math.toRadians(rzSec / 3600.0)
    private val s = 1.0 + ppm * 1e-6
    private val det = 1.0 + rx * rx + ry * ry + rz * rz

    def toWgs84(lon: Double, lat: Double): (Double, Double) = {
      val (x, y, z) = geodToXyz(aLoc, e2Loc, lon, lat)
      val x2 = dx + s * (x - rz * y + ry * z)
      val y2 = dy + s * (rz * x + y - rx * z)
      val z2 = dz + s * (-ry * x + rx * y + z)
      xyzToGeod(A, Wgs84E2, x2, y2, z2)
    }

    def fromWgs84(lon: Double, lat: Double): (Double, Double) = {
      val (x2, y2, z2) = geodToXyz(A, Wgs84E2, lon, lat)
      val u = (x2 - dx) / s; val v = (y2 - dy) / s; val w = (z2 - dz) / s
      // M⁻¹ via cofactors of I + skew (reduces to the transpose at first
      // order; the quadratic terms are what make the round-trip exact)
      val x = ((1 + rx * rx) * u + (rz + rx * ry) * v + (rx * rz - ry) * w) / det
      val y = ((rx * ry - rz) * u + (1 + ry * ry) * v + (rx + ry * rz) * w) / det
      val z = ((ry + rx * rz) * u + (ry * rz - rx) * v + (1 + rz * rz) * w) / det
      xyzToGeod(aLoc, e2Loc, x, y, z)
    }
  }

  /** A projected CRS assembled parameter-by-parameter from a `.prj` the
    * per-EPSG dispatch does not know — see [[parametricFromPrj]]. `unit`
    * is the PROJCS linear-unit-to-meter factor (PARAMETER false origins
    * arrive already converted; runtime coordinates convert on the way
    * in/out).
    */
  final class ParametricCrs private[geo] (
      fwd: (Double, Double) => (Double, Double),
      inv: (Double, Double) => (Double, Double),
      datumToWgs: (Double, Double) => (Double, Double),
      datumFromWgs: (Double, Double) => (Double, Double),
      unit: Double) extends Serializable {
    /** (x, y) in the CRS' declared linear unit → (lon, lat) WGS84 deg. */
    def toWgs84(x: Double, y: Double): (Double, Double) = {
      val (lon, lat) = inv(x * unit, y * unit)
      datumToWgs(lon, lat)
    }
    /** (lon, lat) WGS84 deg → (x, y) in the CRS' declared linear unit. */
    def fromWgs84(lon: Double, lat: Double): (Double, Double) = {
      val (lo, la) = datumFromWgs(lon, lat)
      val (x, y) = fwd(lo, la)
      (x / unit, y / unit)
    }
    /** Reproject every coordinate pair of a WKT geometry into 4326. */
    def wktToWgs84(wkt: String): String =
      transformWkt(wkt) { (x, y) => toWgs84(x, y) }

    /** The same projected CRS with its datum bridge REPLACED — the hook
      * for sub-meter datum work where a parameter Helmert is not enough:
      * pass an NTv2 grid's shift pair ([[graft.geo.Ntv2.Grid.bridge]])
      * and the projection/unit machinery is reused unchanged. The caller
      * owns datum-pair correctness (a grid file names its datums but a
      * `.prj` cannot reference one, so this is an explicit opt-in).
      */
    def withDatumBridge(
        to: (Double, Double) => (Double, Double),
        from: (Double, Double) => (Double, Double)): ParametricCrs =
      new ParametricCrs(fwd, inv, to, from, unit)
  }

  /** Build a CRS from a `.prj`'s own PARAMETER values when the per-EPSG
    * table does not recognize it — the generic tail behind the anchored
    * national families (the reference accepts ANY input CRS via pyproj,
    * `lib/initialization.py:38-39`; this covers the two workhorse
    * projected families the same way, from public formulas only).
    *
    * Accepted: `PROJECTION` Transverse_Mercator / Gauss_Kruger,
    * Lambert_Conformal_Conic (1SP when no second standard parallel, 2SP
    * otherwise), Albers(_Conic_Equal_Area), Oblique_Stereographic /
    * Double_Stereographic (EPSG 9809 — Dutch RD New and kin), or the
    * polar aspects of Stereographic (Polar_Stereographic variants A and
    * B plus the ESRI Stereographic_North/South_Pole spellings; a bare
    * non-polar "Stereographic" is the sphere-based ESRI method and
    * refuses), on ANY `SPHEROID[a, 1/f]`, with any PROJCS
    * linear UNIT
    * (the to-meter factor scales coordinates AND false origins). Datum:
    * a `TOWGS84[dx,dy,dz(,rx,ry,rz,ds)]` clause wires the generic
    * position-vector bridge; without one, only datums that realize
    * WGS84/GRS80 within the engine's accuracy class (name contains
    * WGS / ETRS / RGF / GRS) pass with the identity bridge — everything
    * else (NAD27/NAD83, non-Greenwich prime meridians, other projection
    * methods) returns None so callers keep refusing loudly instead of
    * absorbing a silent datum error. 1SP LCC additionally requires the
    * standard parallel (when present) to equal the latitude of origin —
    * a file where they differ is not a 1SP cone.
    */
  def parametricFromPrj(prj: String): Option[ParametricCrs] = {
    val s = prj.trim
    if (!s.toUpperCase.startsWith("PROJCS")) return None
    def num(m: String): Option[Double] = scala.util.Try(m.toDouble).toOption
    val projection = """PROJECTION\[\s*"([^"]+)"""".r
      .findFirstMatchIn(s).map(_.group(1).toUpperCase.replace(' ', '_'))
      .getOrElse(return None)
    val spheroid = s"""SPHEROID\\[\\s*"[^"]*"\\s*,\\s*($Num)\\s*,\\s*($Num)""".r
      .findFirstMatchIn(s).getOrElse(return None)
    val aEll = num(spheroid.group(1)).getOrElse(return None)
    val invF = num(spheroid.group(2)).getOrElse(return None)
    if (!(aEll > 6e6 && aEll < 7e6 && invF > 250 && invF < 350)) return None
    val fEll = 1.0 / invF
    val e2Ell = fEll * (2 - fEll)
    // non-Greenwich prime meridians (NTF Paris etc.) stay with their
    // anchored per-EPSG families — the generic path refuses them
    val primem = s"""PRIMEM\\[\\s*"[^"]*"\\s*,\\s*($Num)""".r
      .findFirstMatchIn(s).flatMap(m => num(m.group(1))).getOrElse(0.0)
    if (math.abs(primem) > 1e-9) return None
    // PROJCS linear unit = the LAST top-level UNIT (the GEOGCS' angular
    // unit nests deeper); WKT1 stores its to-meter factor directly
    val unit = s"""UNIT\\[\\s*"[^"]*"\\s*,\\s*($Num)""".r
      .findAllMatchIn(s).filter { m =>
        var depth = 0; var i = 0
        while (i < m.start) {
          val c = s.charAt(i)
          if (c == '[') depth += 1 else if (c == ']') depth -= 1
          i += 1
        }
        depth == 1
      }.toSeq.lastOption.flatMap(m => num(m.group(1))).getOrElse(1.0)
    if (!(unit > 0 && unit <= 1.01)) return None
    val params: Map[String, Double] =
      s"""PARAMETER\\[\\s*"([^"]+)"\\s*,\\s*($Num)""".r.findAllMatchIn(s)
        .flatMap(m => num(m.group(2))
          .map(v => m.group(1).toLowerCase.replace(' ', '_') -> v))
        .toMap
    def p(name: String, default: Double): Double =
      params.getOrElse(name, default)
    // false origins are declared in the PROJCS unit — to meters here
    val fe = p("false_easting", 0.0) * unit
    val fn0 = p("false_northing", 0.0) * unit
    val lon0deg = params.get("central_meridian")
      .orElse(params.get("longitude_of_center")).getOrElse(return None)
    val lat0 = p("latitude_of_origin", p("latitude_of_center", 0.0))
    // datum bridge: explicit TOWGS84 wins; else the identity-class names
    val towgs = s"""TOWGS84\\[([^\\]]*)\\]""".r.findFirstMatchIn(s)
      .map(_.group(1).split(",").map(_.trim).flatMap(num))
    val bridge: Option[HelmertBridge] = towgs match {
      case Some(Array(tx, ty, tz)) =>
        Some(new HelmertBridge(aEll, e2Ell, tx, ty, tz, 0, 0, 0, 0))
      case Some(Array(tx, ty, tz, rX, rY, rZ, ds)) =>
        Some(new HelmertBridge(aEll, e2Ell, tx, ty, tz, rX, rY, rZ, ds))
      case Some(_) => return None // malformed TOWGS84
      case None =>
        val datum = """DATUM\[\s*"([^"]+)"""".r.findFirstMatchIn(s)
          .map(_.group(1).toUpperCase).getOrElse(return None)
        if (Seq("WGS", "ETRS", "RGF", "GRS").exists(datum.contains)) None
        else return None // unknown datum, no TOWGS84: refuse
    }
    val datumTo: (Double, Double) => (Double, Double) =
      bridge.map(b => b.toWgs84 _).getOrElse((lon, lat) => (lon, lat))
    val datumFrom: (Double, Double) => (Double, Double) =
      bridge.map(b => b.fromWgs84 _).getOrElse((lon, lat) => (lon, lat))
    if (projection.contains("TRANSVERSE_MERCATOR") ||
        projection.contains("GAUSS_KRUGER")) {
      val series = new TmSeries(fEll, aEll)
      val lon0 = math.toRadians(lon0deg)
      val k0 = p("scale_factor", 1.0)
      // a non-equatorial latitude of origin folds into an effective false
      // northing, meridian arc from the SAME series (the OSGB treatment)
      val fn =
        if (lat0 == 0.0) fn0
        else fn0 - tmForward(series, lon0, 0.0, lon0deg, lat0, k0, 0.0)._2
      Some(new ParametricCrs(
        (lon, lat) => tmForward(series, lon0, fn, lon, lat, k0, fe),
        (x, y) => tmInverse(series, lon0, fn, x, y, k0, fe),
        datumTo, datumFrom, unit))
    } else if (projection.contains("LAMBERT_CONFORMAL_CONIC")) {
      val sp1 = p("standard_parallel_1", lat0)
      val sp2Opt = params.get("standard_parallel_2").filter(_ != sp1)
      sp2Opt match {
        case Some(sp2) =>
          if (params.get("scale_factor").exists(_ != 1.0)) return None
          val proj = new LccProj(aEll, e2Ell, lat0, lon0deg, sp1, sp2, fe, fn0)
          Some(new ParametricCrs(
            (lon, lat) => proj.forward(lon, lat),
            (x, y) => proj.inverse(x, y),
            datumTo, datumFrom, unit))
        case None =>
          if (sp1 != lat0) return None // 1SP requires sp == lat of origin
          val k0 = p("scale_factor", 1.0)
          val proj = new Lcc1Sp(aEll, e2Ell, lat0, lon0deg, k0, fe, fn0)
          Some(new ParametricCrs(
            (lon, lat) => proj.forward(lon, lat),
            (x, y) => proj.inverse(x, y),
            datumTo, datumFrom, unit))
      }
    } else if (projection.contains("ALBERS")) {
      // Albers_Conic_Equal_Area / Albers (EPSG 9822): no scale factor in
      // the method — a file declaring one ≠ 1 is not this projection
      if (params.get("scale_factor").exists(_ != 1.0)) return None
      val sp1 = params.get("standard_parallel_1").getOrElse(return None)
      val sp2 = p("standard_parallel_2", sp1)
      val proj = new AlbersProj(aEll, e2Ell, lat0, lon0deg, sp1, sp2, fe, fn0)
      Some(new ParametricCrs(
        (lon, lat) => proj.forward(lon, lat),
        (x, y) => proj.inverse(x, y),
        datumTo, datumFrom, unit))
    } else if (projection.contains("OBLIQUE_STEREOGRAPHIC") ||
        projection.contains("DOUBLE_STEREOGRAPHIC")) {
      // EPSG 9809 (the Gauss conformal-sphere double stereographic —
      // Dutch RD New and kin). A pole origin degenerates the Gauss
      // sphere construction (cos⁴φ0 → 0 is fine but χ0 → ±π/2 makes the
      // inverse's g/h singular) — that file is polar stereographic
      // mis-labeled; refuse rather than guess.
      if (math.abs(lat0) >= 89.999) return None
      val proj = new ObliqueStereo(aEll, e2Ell, lat0, lon0deg,
        p("scale_factor", 1.0), fe, fn0)
      Some(new ParametricCrs(
        (lon, lat) => proj.forward(lon, lat),
        (x, y) => proj.inverse(x, y),
        datumTo, datumFrom, unit))
    } else if (projection.contains("STEREOGRAPHIC")) {
      // Polar aspects only: Polar_Stereographic (variant A when the
      // latitude of origin is a pole, variant B when it is a standard
      // parallel) and the ESRI Stereographic_North/South_Pole spellings
      // (standard parallel parameter, pole from the name). A bare
      // "Stereographic" with a non-polar origin is ESRI's SPHERE-based
      // oblique method, not EPSG 9809 — still refused.
      val esriPole = projection.contains("_POLE")
      if (!esriPole && !projection.contains("POLAR")) return None
      if (math.abs(lat0) == 90.0 && !esriPole) {
        // variant A: scale factor at the pole
        val proj = new PolarStereo(aEll, e2Ell, south = lat0 < 0,
          p("scale_factor", 1.0), lon0deg, fe, fn0)
        Some(new ParametricCrs(
          (lon, lat) => proj.forward(lon, lat),
          (x, y) => proj.inverse(x, y),
          datumTo, datumFrom, unit))
      } else {
        // variant B: the defining parallel is standard_parallel_1 (ESRI)
        // or the latitude of origin (OGC); the method has no free scale
        // factor, and the parallel must sit in the pole's hemisphere
        if (params.get("scale_factor").exists(_ != 1.0)) return None
        val spF =
          if (esriPole) params.get("standard_parallel_1").getOrElse(return None)
          else lat0
        if (spF == 0.0) return None
        val s = if (esriPole) projection.contains("SOUTH") else spF < 0
        if (esriPole && (spF < 0) != s) return None
        // a pole-latitude standard parallel is variant A with k0 = 1
        // (the φF → pole limit of the variant-B formula, which is 0/0)
        val k0 =
          if (math.abs(spF) == 90.0) 1.0
          else PolarStereo.k0FromStdParallel(e2Ell,
            math.toRadians(math.abs(spF)))
        val proj = new PolarStereo(aEll, e2Ell, s, k0, lon0deg, fe, fn0)
        Some(new ParametricCrs(
          (lon, lat) => proj.forward(lon, lat),
          (x, y) => proj.inverse(x, y),
          datumTo, datumFrom, unit))
      }
    } else None
  }

  // Each coordinate admits a bare leading decimal point (".5", "-.5") —
  // valid WKT that a digit-first pattern would silently skip, leaving a
  // mixed projected/geographic geometry behind.
  private val Num = """-?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"""
  private val CoordRe = s"""($Num)\\s+($Num)""".r

  /** Reproject EVERY coordinate pair of any WKT geometry (point, line,
    * polygon, multi-*) into 4326 — structure-preserving text transform,
    * so every geometry family a shapefile can carry reprojects through
    * one code path.
    */
  def wktTransformToWgs84(epsg: Int, wkt: String): String = {
    if (epsg == Wgs84 || wkt == null) return wkt
    transformWkt(wkt) { (x, y) => toWgs84(epsg, x, y) }
  }

  /** Structure-preserving coordinate transform of any WKT geometry —
    * every `x y` pair is rewritten through `f`; nulls pass through. The
    * one code path behind both the per-EPSG and the parametric
    * reprojection.
    */
  def transformWkt(wkt: String)(
      f: (Double, Double) => (Double, Double)): String =
    if (wkt == null) wkt
    else CoordRe.replaceAllIn(wkt, m => {
      val (x2, y2) = f(m.group(1).toDouble, m.group(2).toDouble)
      scala.util.matching.Regex.quoteReplacement(s"$x2 $y2")
    })

  /** Reproject a WKT geometry into 4326 — alias of
    * [[wktTransformToWgs84]], kept for API compatibility; there is ONE
    * reprojection code path for all geometry families.
    */
  def wktToWgs84(epsg: Int, wkt: String): String =
    wktTransformToWgs84(epsg, wkt)
}

/** Column-level CRS functions (S4 CRS leg: reproject at ingestion). */
object CrsFns {
  import org.apache.spark.sql.functions.udf

  val toLon = udf { (epsg: Int, x: Double, y: Double) => Crs.toWgs84(epsg, x, y)._1 }
  val toLat = udf { (epsg: Int, x: Double, y: Double) => Crs.toWgs84(epsg, x, y)._2 }

  /** Forward projection out of 4326 (writing layers in a projected CRS). */
  val toX = udf { (epsg: Int, lon: Double, lat: Double) => Crs.fromWgs84(epsg, lon, lat)._1 }
  val toY = udf { (epsg: Int, lon: Double, lat: Double) => Crs.fromWgs84(epsg, lon, lat)._2 }

  /** Reproject a WKT geometry column into 4326. */
  val wktToWgs84 = udf { (epsg: Int, wkt: String) => Crs.wktToWgs84(epsg, wkt) }
}
