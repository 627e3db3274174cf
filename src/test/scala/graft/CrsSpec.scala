package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Crs

class CrsSpec extends AnyFunSuite {

  test("EPSG:3857 matches analytic values and round-trips") {
    val (x, y) = Crs.fromWgs84(3857, 180.0, 0.0)
    assert(math.abs(x - 20037508.342789244) < 1e-6)
    assert(math.abs(y) < 1e-6)
    for (lon <- Seq(-170.0, -10.5, 0.0, 10.0, 150.25); lat <- Seq(-80.0, -45.0, 0.0, 37.5, 83.0)) {
      val (mx, my) = Crs.fromWgs84(3857, lon, lat)
      val (lo, la) = Crs.toWgs84(3857, mx, my)
      assert(math.abs(lo - lon) < 1e-11 && math.abs(la - lat) < 1e-11, s"($lon,$lat)")
    }
  }

  test("EPSG:3035 false origin is exact and projection round-trips over Europe") {
    val (x0, y0) = Crs.fromWgs84(3035, 10.0, 52.0)
    assert(math.abs(x0 - 4321000.0) < 1e-6 && math.abs(y0 - 3210000.0) < 1e-6,
      s"projection center must land on the false origin, got ($x0, $y0)")
    assert(Crs.toWgs84(3035, 4321000.0, 3210000.0) == (10.0, 52.0))
    for (lon <- Seq(-10.0, 0.0, 10.0, 24.5, 34.0); lat <- Seq(35.0, 45.0, 52.0, 60.0, 70.5)) {
      val (ex, ey) = Crs.fromWgs84(3035, lon, lat)
      val (lo, la) = Crs.toWgs84(3035, ex, ey)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"($lon,$lat) → ($lo,$la)")
    }
    // Europe sits in positive-coordinate territory on the LAEA grid
    val (lx, ly) = Crs.fromWgs84(3035, -9.1, 38.7) // Lisbon
    assert(lx > 2000000 && lx < 3500000 && ly > 1500000 && ly < 3000000)
  }

  test("EPSG:3035 preserves area (equal-area property, 0.1x0.1 deg cells)") {
    // project a small cell at two very different latitudes; planar areas in
    // 3035 must match the ellipsoidal truth within 0.1%
    def cellArea(lon: Double, lat: Double): Double = {
      val c = Seq((lon, lat), (lon + 0.1, lat), (lon + 0.1, lat + 0.1), (lon, lat + 0.1))
        .map { case (lo, la) => Crs.fromWgs84(3035, lo, la) }
        .map { case (x, y) => graft.geo.Geometry.Pt(x, y) }
      graft.geo.Geometry.ringArea(c.toArray)
    }
    def ellipsoidArea(lat: Double): Double = {
      // exact ellipsoidal cell area from the authalic q function
      val a = 6378137.0
      math.toRadians(0.1) * a * a *
        (Crs.authalicQ(math.toRadians(lat + 0.1)) - Crs.authalicQ(math.toRadians(lat))) / 2
    }
    for (lat <- Seq(36.0, 52.0, 68.0)) {
      val ratio = cellArea(12.0, lat) / ellipsoidArea(lat)
      // planar polygon edges chord the projected curves → tiny positive bias
      assert(math.abs(ratio - 1.0) < 1e-5, s"lat $lat area ratio $ratio")
    }
  }

  test("wktToWgs84 reprojects polygons vertex-wise, holes and multi preserved") {
    val pts4326 = Seq((9.0, 51.0), (11.0, 51.0), (11.0, 53.0), (9.0, 53.0))
    val proj = pts4326.map { case (lo, la) => Crs.fromWgs84(3035, lo, la) }
    val wkt3035 = "POLYGON ((" +
      (proj :+ proj.head).map { case (x, y) => s"$x $y" }.mkString(", ") + "))"
    val back = Crs.wktToWgs84(3035, wkt3035)
    val ring = graft.geo.Geometry.parseGeom(back)(0).outer
    assert(ring.length == 4)
    ring.zip(pts4326).foreach { case (p, (lo, la)) =>
      assert(math.abs(p.x - lo) < 1e-9 && math.abs(p.y - la) < 1e-9)
    }
    assert(Crs.wktToWgs84(4326, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))") ==
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "4326 is a passthrough")
  }

  test("unsupported CRS fails loudly") {
    // New Zealand TM 2000 (2193) — genuinely unsupported
    intercept[IllegalArgumentException] { Crs.toWgs84(2193, 0, 0) }
    intercept[IllegalArgumentException] { Crs.fromWgs84(2193, 0, 0) }
  }

  test("Swiss LV03/LV95: round trips, origin anchor, Rigi, conformal scale") {
    // round trips over Switzerland through the full Bessel + 3-param chain
    for (lon <- Seq(6.1, 7.44, 8.55, 9.8); lat <- Seq(45.9, 46.95, 47.6)) {
      val (x, y) = Crs.fromWgs84(21781, lon, lat)
      val (lo, la) = Crs.toWgs84(21781, x, y)
      // 2e-8 deg ≈ 2 mm: the geodetic-latitude fixed-point floor through
      // TWO geocentric datum bridges (out and back)
      assert(math.abs(lo - lon) < 2e-8 && math.abs(la - lat) < 2e-8,
        s"21781 round trip ($lon, $lat) -> ($lo, $la)")
    }
    // the Bern fundamental point is the projection origin: shifting its
    // CH1903 coordinates to WGS84 and back through fromWgs84 must land on
    // exactly (600000, 200000) / LV95 (2600000, 1200000)
    val bern = Crs.toWgs84(21781, 600000.0, 200000.0)
    val (bx, by) = Crs.fromWgs84(21781, bern._1, bern._2)
    // 1 cm: two passes through the geocentric bridge's iteration floor
    assert(math.abs(bx - 600000.0) < 1e-2 && math.abs(by - 200000.0) < 1e-2)
    val (vx, vy) = Crs.fromWgs84(2056, bern._1, bern._2)
    assert(math.abs(vx - 2600000.0) < 1e-2 && math.abs(vy - 1200000.0) < 1e-2,
      s"LV95 is LV03 + (2000000, 1000000): got ($vx, $vy)")
    // independent anchor: swisstopo's published APPROXIMATE transformation
    // polynomials (WGS84 → LV03, ~1 m class) — a wholly separate published
    // derivation that embeds projection AND datum shift, so agreement
    // within 2 m over the Swiss domain pins both at once
    def approxLv03(lonW: Double, latW: Double): (Double, Double) = {
      val p = (latW * 3600 - 169028.66) / 10000
      val l = (lonW * 3600 - 26782.5) / 10000
      (600072.37 + 211455.93 * l - 10938.51 * l * p - 0.36 * l * p * p -
        44.54 * l * l * l,
        200147.07 + 308807.95 * p + 3745.25 * l * l + 76.63 * p * p -
          194.56 * l * l * p + 119.79 * p * p * p)
    }
    for (lon <- Seq(6.5, 7.44, 8.49, 9.5); lat <- Seq(46.2, 46.95, 47.5)) {
      val (gx, gy) = Crs.fromWgs84(21781, lon, lat)
      val (axp, ayp) = approxLv03(lon, lat)
      assert(math.hypot(gx - axp, gy - ayp) < 2.0,
        s"rigorous ($gx, $gy) vs swisstopo approx ($axp, $ayp) at ($lon, $lat)")
    }
    // conformal + tangent along the pseudo-equator: grid distance near Bern
    // must match the ellipsoidal geodesic to ~(d/R)²/2 ≈ 5e-6 relative
    val pA = (7.2, 46.8); val pB = (7.6, 47.1)
    val (ax, ay) = Crs.fromWgs84(21781, pA._1, pA._2)
    val (bx2, by2) = Crs.fromWgs84(21781, pB._1, pB._2)
    val grid = math.hypot(bx2 - ax, by2 - ay)
    val geo = graft.expr.GeoMath.geodesicKm(pA._2, pA._1, pB._2, pB._1) * 1000.0
    assert(math.abs(grid - geo) / geo < 2e-5,
      s"grid $grid vs geodesic $geo")
    // .prj round trip + ESRI-name detection for both variants
    assert(Crs.epsgFromPrj(Crs.prjWkt(21781)) == Some(21781))
    assert(Crs.epsgFromPrj(Crs.prjWkt(2056)) == Some(2056))
    assert(Crs.epsgFromPrj("""PROJCS["CH1903_LV03",GEOGCS["GCS_CH1903"]]""")
      == Some(21781))
    assert(Crs.epsgFromPrj("""PROJCS["CH1903+_LV95",GEOGCS["GCS_CH1903+"]]""")
      == Some(2056))
  }

  test("NTF Lambert zones: round trips, zone structure, Paris meridian") {
    // round trips over France through the full Clarke-1880-IGN + 3-param
    // datum chain (translation is exactly invertible → tight bound)
    for (lon <- Seq(-2.0, 0.5, 2.34, 5.5, 7.0); lat <- Seq(43.5, 45.0, 46.8, 48.9)) {
      val (x, y) = Crs.fromWgs84(27572, lon, lat)
      val (lo, la) = Crs.toWgs84(27572, x, y)
      // 1e-8 deg ≈ 1 mm: the fixed-point geodetic-latitude iteration floor
      assert(math.abs(lo - lon) < 1e-8 && math.abs(la - lat) < 1e-8,
        s"27572 round trip ($lon, $lat) -> ($lo, $la)")
    }
    // the carto variant differs from the base zone by EXACTLY the
    // false-northing offset — same cone, same datum, same meridian
    val (e2a, n2a) = Crs.fromWgs84(27562, 2.5, 46.5)
    val (e2b, n2b) = Crs.fromWgs84(27572, 2.5, 46.5)
    assert(math.abs(e2a - e2b) < 1e-9 && math.abs((n2b - n2a) - 2000000.0) < 1e-9)
    // natural origin: inverse of the false origin lands near (Paris
    // meridian, lat0) — displaced by the REAL ~100 m datum shift, so
    // close but not equal
    val (lo0, la0) = Crs.toWgs84(27572, 600000.0, 2200000.0)
    val paris = 2.0 + 20.0 / 60 + 14.025 / 3600
    assert(math.abs(lo0 - paris) < 0.01 && math.abs(la0 - 46.8) < 0.01,
      s"origin inverse ($lo0, $la0)")
    assert(math.abs(lo0 - paris) > 1e-5 || math.abs(la0 - 46.8) > 1e-5,
      "datum shift must actually displace the origin")
    // gross-error sanity: central Paris in Lambert II étendu is ~(602 km,
    // 2429 km) — wrong meridian/FN/k0 families all miss by far more
    val (px, py) = Crs.fromWgs84(27572, 2.3522, 48.8566)
    assert(math.abs(px - 602000) < 5000 && math.abs(py - 2429000) < 5000,
      s"Paris -> ($px, $py)")
    // .prj round trip + ESRI name heuristic
    for (code <- Seq(27561, 27564, 27572))
      assert(Crs.epsgFromPrj(Crs.prjWkt(code)) == Some(code), s"EPSG:$code")
    assert(Crs.epsgFromPrj(
      """PROJCS["NTF_Paris_Lambert_Zone_II",GEOGCS["GCS_NTF_Paris"]]""")
      == Some(27572))
  }

  test("UTM: central meridian and equator anchor the grid exactly") {
    // any point ON the central meridian must land at easting 500000
    for (lat <- Seq(-60.0, 0.0, 12.0, 52.0, 79.5)) {
      val (e, _) = Crs.fromWgs84(32632, 9.0, lat) // zone 32N: λ0 = 9°E
      assert(math.abs(e - 500000.0) < 1e-6, s"lat $lat easting $e")
    }
    // equator on the central meridian is the northing origin (north zones)
    val (_, n0) = Crs.fromWgs84(32632, 9.0, 0.0)
    assert(math.abs(n0) < 1e-6)
    // south zones carry the 10,000 km false northing
    val (_, nS) = Crs.fromWgs84(32732, 9.0, 0.0)
    assert(math.abs(nS - 10000000.0) < 1e-6)
  }

  test("UTM matches the published CN Tower reference coordinate") {
    // Wikipedia's UTM worked example: CN Tower, 43.642567°N 79.387139°W,
    // zone 17N → 630084 m E, 4833438 m N (published at metre precision)
    val (e, n) = Crs.fromWgs84(32617, -79.387139, 43.642567)
    assert(math.abs(e - 630084.0) < 1.0, s"easting $e")
    assert(math.abs(n - 4833438.0) < 1.0, s"northing $n")
    val (lon, lat) = Crs.toWgs84(32617, 630084.0, 4833438.0)
    assert(math.abs(lon - (-79.387139)) < 2e-5 && math.abs(lat - 43.642567) < 2e-5)
  }

  test("UTM round-trips across zones, hemispheres and datums to 1e-9 deg") {
    for ((epsg, lon0) <- Seq((32601, -177.0), (32632, 9.0), (32660, 177.0),
        (32733, 15.0), (25832, 9.0));
        dLon <- Seq(-2.8, 0.0, 1.3, 2.9);
        lat <- Seq(-72.0, -33.3, 0.0, 0.7, 48.1, 83.0)) {
      // keep |lat| meaningful for the hemisphere of the zone code
      val la = if (epsg == 32733) -math.abs(lat) - 0.5 else lat
      val (x, y) = Crs.fromWgs84(epsg, lon0 + dLon, la)
      val (lo2, la2) = Crs.toWgs84(epsg, x, y)
      assert(math.abs(lo2 - (lon0 + dLon)) < 1e-9 && math.abs(la2 - la) < 1e-9,
        s"EPSG:$epsg ($lon0+$dLon, $la) → ($lo2, $la2)")
    }
    // ETRS89 (GRS80) and WGS84 UTM differ only at the 0.1 mm ellipsoid
    // level — same zone must agree within a millimeter
    val (ew, nw) = Crs.fromWgs84(32632, 10.5, 51.2)
    val (ee, ne) = Crs.fromWgs84(25832, 10.5, 51.2)
    assert(math.abs(ew - ee) < 1e-3 && math.abs(nw - ne) < 1e-3)
  }

  test("epsgFromPrj: authority tag, ESRI names, and unknowns") {
    // explicit authority wins (and prjWkt output round-trips)
    for (code <- Seq(4326, 3857, 3035, 32617, 32732, 25832))
      assert(Crs.epsgFromPrj(Crs.prjWkt(code)) == Some(code), s"EPSG:$code")
    // ESRI-style .prj with no AUTHORITY — name heuristics
    val esriUtm = """PROJCS["WGS_1984_UTM_Zone_33N",GEOGCS["GCS_WGS_1984",""" +
      """DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
      """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
      """PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",500000.0],""" +
      """PARAMETER["Central_Meridian",15.0],UNIT["Meter",1.0]]"""
    assert(Crs.epsgFromPrj(esriUtm) == Some(32633))
    val esriGeo = """GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",""" +
      """SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],""" +
      """UNIT["Degree",0.0174532925199433]]"""
    assert(Crs.epsgFromPrj(esriGeo) == Some(4326))
    assert(Crs.epsgFromPrj(
      """PROJCS["ETRS_1989_UTM_Zone_32N",GEOGCS["GCS_ETRS_1989"]]""") == Some(25832))
    // GDAL-style trap: the only AUTHORITY is on the NESTED GEOGCS — it
    // names the datum, not the CRS; detection must use the UTM zone name,
    // never shortcut to 4326 (which would read eastings as degrees)
    val gdalUtm = """PROJCS["WGS_1984_UTM_Zone_33N",GEOGCS["GCS_WGS_1984",""" +
      """DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
      """AUTHORITY["EPSG","4326"]],PROJECTION["Transverse_Mercator"],""" +
      """PARAMETER["Central_Meridian",15.0],UNIT["Meter",1.0]]"""
    assert(Crs.epsgFromPrj(gdalUtm) == Some(32633))
    assert(Crs.epsgFromPrj("""PROJCS["NAD_1983_StatePlane_California"]""").isEmpty)
    assert(Crs.epsgFromPrj("not wkt at all").isEmpty)
    // NAD UTM zones share the zone-name shape but a DIFFERENT datum
    // (EPSG 267xx/269xx): detecting them as WGS84 UTM would reproject
    // with a silent ~200 m datum error — must refuse, not guess
    for (datum <- Seq("NAD_1927", "NAD_1983"))
      assert(Crs.epsgFromPrj(
        s"""PROJCS["${datum}_UTM_Zone_17N",GEOGCS["GCS_North_American_$datum",""" +
          s"""DATUM["D_$datum",SPHEROID["X",1,2]]],""" +
          """PROJECTION["Transverse_Mercator"],UNIT["Meter",1.0]]""").isEmpty,
        s"$datum UTM must not be detected as WGS84 UTM")
  }

  test("wktTransformToWgs84 handles every geometry family") {
    val (px, py) = Crs.fromWgs84(32632, 9.5, 50.5)
    val back = Crs.wktTransformToWgs84(32632, s"POINT ($px $py)")
    val m = """POINT \(([-0-9.eE]+) ([-0-9.eE]+)\)""".r.findFirstMatchIn(back).get
    assert(math.abs(m.group(1).toDouble - 9.5) < 1e-9)
    assert(math.abs(m.group(2).toDouble - 50.5) < 1e-9)
    // linestring: both vertices move, structure preserved
    val (ax, ay) = Crs.fromWgs84(32632, 9.0, 50.0)
    val (bx, by) = Crs.fromWgs84(32632, 10.0, 51.0)
    val line = Crs.wktTransformToWgs84(32632, s"LINESTRING ($ax $ay, $bx $by)")
    assert(line.startsWith("LINESTRING (") && line.count(_ == ',') == 1)
    // 4326 passthrough preserves the exact string
    assert(Crs.wktTransformToWgs84(4326, "POINT (1 2)") == "POINT (1 2)")
  }

  test("Lambert-93 / EPSG:3034: exact origin anchors and round trips") {
    // by definition the natural origin maps to the false origin EXACTLY
    val (e93, n93) = Crs.fromWgs84(2154, 3.0, 46.5)
    assert(math.abs(e93 - 700000.0) < 1e-6 && math.abs(n93 - 6600000.0) < 1e-6,
      s"Lambert-93 origin: ($e93, $n93)")
    val (e34, n34) = Crs.fromWgs84(3034, 10.0, 52.0)
    assert(math.abs(e34 - 4000000.0) < 1e-6 && math.abs(n34 - 2800000.0) < 1e-6,
      s"EPSG:3034 origin: ($e34, $n34)")
    // round trips over the legal areas (France / Europe)
    for (lon <- Seq(-4.5, 0.0, 3.0, 7.8); lat <- Seq(41.5, 44.0, 47.3, 50.8)) {
      val (x, y) = Crs.fromWgs84(2154, lon, lat)
      val (lo, la) = Crs.toWgs84(2154, x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"2154 round trip ($lon, $lat) -> ($lo, $la)")
    }
    for (lon <- Seq(-8.0, 5.0, 10.0, 24.0); lat <- Seq(36.0, 48.0, 60.0, 68.0)) {
      val (x, y) = Crs.fromWgs84(3034, lon, lat)
      val (lo, la) = Crs.toWgs84(3034, x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"3034 round trip ($lon, $lat) -> ($lo, $la)")
    }
  }

  test("Lambert conformal conic: unit scale on standard parallels, conformal off them") {
    // local scale along a parallel = projected distance / ellipsoidal
    // parallel arc (nu cos(phi) dλ); along a meridian = projected / M dφ.
    val a = 6378137.0; val f = 1.0 / 298.257222101; val e2 = f * (2 - f)
    def paraScale(epsg: Int, lon: Double, lat: Double): Double = {
      val d = 1e-4
      val (x1, y1) = Crs.fromWgs84(epsg, lon, lat)
      val (x2, y2) = Crs.fromWgs84(epsg, lon + d, lat)
      val phi = math.toRadians(lat)
      val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      math.hypot(x2 - x1, y2 - y1) / (nu * math.cos(phi) * math.toRadians(d))
    }
    def meridScale(epsg: Int, lon: Double, lat: Double): Double = {
      val d = 1e-4
      val (x1, y1) = Crs.fromWgs84(epsg, lon, lat)
      val (x2, y2) = Crs.fromWgs84(epsg, lon, lat + d)
      val phi = math.toRadians(lat)
      val s2 = math.sin(phi) * math.sin(phi)
      val m = a * (1 - e2) / math.pow(1 - e2 * s2, 1.5)
      math.hypot(x2 - x1, y2 - y1) / (m * math.toRadians(d))
    }
    // scale == 1 on both standard parallels (44°N / 49°N for Lambert-93)
    for (sp <- Seq(44.0, 49.0))
      assert(math.abs(paraScale(2154, 3.0, sp) - 1.0) < 1e-6,
        s"scale at parallel $sp = ${paraScale(2154, 3.0, sp)}")
    // < 1 between the parallels, > 1 outside — the two-SP signature
    assert(paraScale(2154, 3.0, 46.5) < 1.0)
    assert(paraScale(2154, 3.0, 41.0) > 1.0 && paraScale(2154, 3.0, 51.5) > 1.0)
    // conformal: parallel and meridian scales agree everywhere tested
    for (lon <- Seq(-2.0, 3.0, 7.0); lat <- Seq(42.5, 46.5, 50.0))
      assert(math.abs(paraScale(2154, lon, lat) - meridScale(2154, lon, lat)) < 1e-5,
        s"conformality at ($lon, $lat)")
    for (sp <- Seq(35.0, 65.0))
      assert(math.abs(paraScale(3034, 10.0, sp) - 1.0) < 1e-6,
        s"3034 scale at parallel $sp")
  }

  test("Gauss-Krüger 31466-69: independent Snyder-series + Helmert chain agrees") {
    // an INDEPENDENT formulation: Snyder ellipsoidal TM series (§8,
    // eqs 8-9..8-17) on Bessel 1841 + a spec-local Helmert using only the
    // published EPSG:1777 parameters. Agreement with the engine's Krüger
    // 6th-order + geocentric chain pins every constant.
    val aB = 6377397.155; val fB = 1.0 / 299.1528128
    val e2B = fB * (2 - fB); val ep2 = e2B / (1 - e2B)
    val aW = 6378137.0; val fW = 1.0 / 298.257223563; val e2W = fW * (2 - fW)
    def geodToXyz(a: Double, e2: Double, lon: Double, lat: Double) = {
      val phi = math.toRadians(lat); val lam = math.toRadians(lon)
      val s = math.sin(phi); val nu = a / math.sqrt(1 - e2 * s * s)
      (nu * math.cos(phi) * math.cos(lam), nu * math.cos(phi) * math.sin(lam),
        nu * (1 - e2) * s)
    }
    def xyzToGeod(a: Double, e2: Double, x: Double, y: Double, z: Double) = {
      val p = math.hypot(x, y)
      var phi = math.atan2(z, p * (1 - e2))
      for (_ <- 0 until 10) {
        val s = math.sin(phi)
        phi = math.atan2(z + e2 * (a / math.sqrt(1 - e2 * s * s)) * s, p)
      }
      (math.toDegrees(math.atan2(y, x)), math.toDegrees(phi))
    }
    def wgsToDhdn(lon: Double, lat: Double) = {
      val (x2, y2, z2) = geodToXyz(aW, e2W, lon, lat)
      val rx = math.toRadians(0.202 / 3600); val ry = math.toRadians(0.045 / 3600)
      val rz = math.toRadians(-2.455 / 3600); val sc = 1.0 + 6.7e-6
      val dx = (x2 - 598.1) / sc; val dy = (y2 - 73.7) / sc; val dz = (z2 - 418.2) / sc
      xyzToGeod(aB, e2B, dx + rz * dy - ry * dz, -rz * dx + dy + rx * dz,
        ry * dx - rx * dy + dz)
    }
    def meridArc(phi: Double): Double =
      aB * ((1 - e2B / 4 - 3 * e2B * e2B / 64 - 5 * math.pow(e2B, 3) / 256) * phi -
        (3 * e2B / 8 + 3 * e2B * e2B / 32 + 45 * math.pow(e2B, 3) / 1024) * math.sin(2 * phi) +
        (15 * e2B * e2B / 256 + 45 * math.pow(e2B, 3) / 1024) * math.sin(4 * phi) -
        (35 * math.pow(e2B, 3) / 3072) * math.sin(6 * phi))
    def snyderTm(lon0: Double, fe: Double, lon: Double, lat: Double) = {
      val phi = math.toRadians(lat)
      val t = math.tan(phi) * math.tan(phi)
      val c = ep2 * math.cos(phi) * math.cos(phi)
      val bigA = math.toRadians(lon - lon0) * math.cos(phi)
      val nu = aB / math.sqrt(1 - e2B * math.sin(phi) * math.sin(phi))
      val x = nu * (bigA + (1 - t + c) * math.pow(bigA, 3) / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(bigA, 5) / 120)
      val y = meridArc(phi) + nu * math.tan(phi) * (bigA * bigA / 2 +
        (5 - t + 9 * c + 4 * c * c) * math.pow(bigA, 4) / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(bigA, 6) / 720)
      (fe + x, y) // k0 = 1
    }
    for ((epsg, zone) <- Seq((31466, 2), (31467, 3), (31468, 4), (31469, 5));
         dlon <- Seq(-1.2, 0.0, 1.2); lat <- Seq(47.5, 50.0, 54.5)) {
      val lon = 3.0 * zone + dlon
      val (x, y) = Crs.fromWgs84(epsg, lon, lat)
      val (lonD, latD) = wgsToDhdn(lon, lat)
      val (xs, ys) = snyderTm(3.0 * zone, zone * 1000000.0 + 500000.0, lonD, latD)
      assert(math.abs(x - xs) < 0.01 && math.abs(y - ys) < 0.01,
        s"EPSG:$epsg ($lon, $lat): Krüger ($x, $y) vs Snyder ($xs, $ys)")
      // round trip through the full datum chain
      val (lo, la) = Crs.toWgs84(epsg, x, y)
      assert(math.abs(lo - lon) < 1e-7 && math.abs(la - lat) < 1e-7,
        s"EPSG:$epsg round trip ($lon, $lat) -> ($lo, $la)")
      // the datum shift is real: ~100-200 m horizontal displacement
      val shift = math.hypot((lonD - lon) * 111320 * math.cos(math.toRadians(lat)),
        (latD - lat) * 110574)
      assert(shift > 50 && shift < 500, s"DHDN shift $shift m at ($lon, $lat)")
    }
    // .prj detection for the new families
    assert(Crs.epsgFromPrj(Crs.prjWkt(2154)) == Some(2154))
    assert(Crs.epsgFromPrj(Crs.prjWkt(3034)) == Some(3034))
    assert(Crs.epsgFromPrj(Crs.prjWkt(31467)) == Some(31467))
    // ESRI-style names without AUTHORITY
    assert(Crs.epsgFromPrj("""PROJCS["RGF_1993_Lambert_93",GEOGCS["GCS_RGF_1993"]]""")
      == Some(2154))
    assert(Crs.epsgFromPrj(
      """PROJCS["DHDN_3_Degree_Gauss_Zone_3",GEOGCS["GCS_Deutsches_Hauptdreiecksnetz"]]""")
      == Some(31467))
    // unknown codes still refuse loudly by name
    val e = intercept[IllegalArgumentException] { Crs.toWgs84(2193, 600000, 200000) }
    assert(e.getMessage.contains("2193"))
  }

  test("OSGB 27700: independent OS-series chain, Caister anchor, round trips") {
    // ---- independent reference implementation: the Ordnance Survey
    // guide's own TM series on Airy 1830 (ν/ρ/η² + meridian-arc form) and
    // its own geocentric Helmert — a wholly separate derivation from the
    // engine's Krüger-series path, same pattern as the Gauss-Krüger spec
    val a = 6377563.396; val b = 6356256.909 // Airy 1830
    val e2 = 1 - b * b / (a * a)
    val k0 = 0.9996012717
    val lat0 = math.toRadians(49.0); val lon0 = math.toRadians(-2.0)
    val n = (a - b) / (a + b)
    def osForward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg); val lam = math.toRadians(lonDeg)
      val sp = math.sin(phi); val cp = math.cos(phi); val tp = math.tan(phi)
      val nu = a * k0 / math.sqrt(1 - e2 * sp * sp)
      val rho = a * k0 * (1 - e2) / math.pow(1 - e2 * sp * sp, 1.5)
      val eta2 = nu / rho - 1
      val dphi = phi - lat0; val sphi = phi + lat0
      val bigM = b * k0 * ((1 + n + 1.25 * n * n + 1.25 * n * n * n) * dphi -
        (3 * n + 3 * n * n + 21.0 / 8 * n * n * n) *
          math.sin(dphi) * math.cos(sphi) +
        (15.0 / 8 * (n * n + n * n * n)) *
          math.sin(2 * dphi) * math.cos(2 * sphi) -
        35.0 / 24 * n * n * n * math.sin(3 * dphi) * math.cos(3 * sphi))
      val dl = lam - lon0
      val nn = bigM - 100000.0 + (nu / 2 * sp * cp) * dl * dl +
        (nu / 24 * sp * cp * cp * cp * (5 - tp * tp + 9 * eta2)) *
          math.pow(dl, 4) +
        (nu / 720 * sp * math.pow(cp, 5) *
          (61 - 58 * tp * tp + math.pow(tp, 4))) * math.pow(dl, 6)
      val ee = 400000.0 + nu * cp * dl +
        (nu / 6 * cp * cp * cp * (nu / rho - tp * tp)) * math.pow(dl, 3) +
        (nu / 120 * math.pow(cp, 5) * (5 - 18 * tp * tp + math.pow(tp, 4) +
          14 * eta2 - 58 * tp * tp * eta2)) * math.pow(dl, 5)
      (ee, nn)
    }
    // the OS guide's published worked example (Caister water tower):
    // OSGB36 52°39′27.2531″N, 1°43′4.5177″E → E 651409.903, N 313177.270
    val (ce, cn) = osForward(52 + 39.0 / 60 + 27.2531 / 3600,
      1 + 43.0 / 60 + 4.5177 / 3600)
    assert(math.hypot(ce - 651409.903, cn - 313177.270) < 0.01,
      s"OS reference series vs published example: ($ce, $cn)")
    // reference WGS84 → OSGB36 geographic (own geocentric code)
    def refWgsToOsgb(lonW: Double, latW: Double): (Double, Double) = {
      val aW = 6378137.0; val fW = 1.0 / 298.257223563
      val e2W = fW * (2 - fW)
      val phi = math.toRadians(latW); val lam = math.toRadians(lonW)
      val nuW = aW / math.sqrt(1 - e2W * math.sin(phi) * math.sin(phi))
      val x0 = nuW * math.cos(phi) * math.cos(lam)
      val y0 = nuW * math.cos(phi) * math.sin(lam)
      val z0 = nuW * (1 - e2W) * math.sin(phi)
      val s = 1 + 20.4894e-6
      val rx = math.toRadians(-0.1502 / 3600); val ry = math.toRadians(-0.2470 / 3600)
      val rz = math.toRadians(-0.8421 / 3600)
      val x = -446.448 + s * (x0 - rz * y0 + ry * z0)
      val y = 125.157 + s * (rz * x0 + y0 - rx * z0)
      val z = -542.060 + s * (-ry * x0 + rx * y0 + z0)
      val p = math.hypot(x, y)
      var ph = math.atan2(z, p * (1 - e2))
      for (_ <- 0 until 12) {
        val nu2 = a / math.sqrt(1 - e2 * math.sin(ph) * math.sin(ph))
        ph = math.atan2(z + e2 * nu2 * math.sin(ph), p)
      }
      (math.toDegrees(math.atan2(y, x)), math.toDegrees(ph))
    }
    // engine chain ≡ reference chain over a UK grid (2 cm: the OS
    // series' own truncation at |dλ| up to 3°)
    for (lon <- Seq(-5.0, -2.0, 0.5, 1.5); lat <- Seq(50.5, 52.6, 55.0, 57.5)) {
      val (ge, gn) = Crs.fromWgs84(27700, lon, lat)
      val (olon, olat) = refWgsToOsgb(lon, lat)
      val (re, rn) = osForward(olat, olon)
      assert(math.hypot(ge - re, gn - rn) < 0.02,
        s"engine ($ge, $gn) vs OS reference ($re, $rn) at ($lon, $lat)")
      val (lo2, la2) = Crs.toWgs84(27700, ge, gn)
      assert(math.abs(lo2 - lon) < 2e-8 && math.abs(la2 - lat) < 2e-8,
        s"27700 round trip ($lon, $lat) -> ($lo2, $la2)")
    }
    // .prj round trip + ESRI-name detection
    assert(Crs.epsgFromPrj(Crs.prjWkt(27700)) == Some(27700))
    assert(Crs.epsgFromPrj(
      """PROJCS["British_National_Grid",GEOGCS["GCS_OSGB_1936"],PROJECTION["Transverse_Mercator"]]""")
      == Some(27700))
  }

  test("Krovak EPSG:5514: round trips, design-envelope scale, axis signs") {
    // round trips over CZ/SK through the full Bessel + 3-param chain
    for (lon <- Seq(12.9, 14.42, 17.11, 19.5, 21.26, 22.2);
         lat <- Seq(47.8, 48.7, 49.5, 50.8)) {
      val (x, y) = Crs.fromWgs84(5514, lon, lat)
      val (lo, la) = Crs.toWgs84(5514, x, y)
      assert(math.abs(lo - lon) < 2e-8 && math.abs(la - lat) < 2e-8,
        s"5514 round trip ($lon, $lat) -> ($lo, $la)")
      // EPSG:5514 East-North structure: BOTH axes negative over CZ/SK
      // (E = −westing, N = −southing from a cartographic origin NE of
      // the countries) — the Ferro-offset λ0 mix-up flips E positive
      assert(x < 0 && y < 0, s"5514 must be all-negative over CZ/SK: ($x, $y)")
    }
    // parameter anchor — the projection's published DESIGN property:
    // Krovak's tangent cone (k₀ = 0.9999 at the 78°30′ pseudo-standard
    // parallel) was fitted to keep scale distortion within ~±10 cm/km
    // over Czechoslovakia. Local grid/geodesic ratios over short
    // baselines across the whole territory must sit in a tight envelope
    // around 1; a wrong λ0 / αC / φP / k₀ blows it (measured: the
    // Ferro-offset λ0 reaches 1.0007, a 1° azimuth error 1.0005, a
    // wrong pseudo-parallel 1.24 — all outside, correct params max
    // 1.00004 on the Bessel geodesic plus ~1e-4 WGS84-ellipsoid skew).
    for ((lon, lat) <- Seq((14.42, 50.09), (16.61, 49.19), (17.11, 48.15),
        (21.26, 48.72), (18.28, 49.83), (12.9, 50.2), (22.2, 49.0));
        (dLon, dLat) <- Seq((0.15, 0.0), (0.0, 0.1))) {
      val (x1, y1) = Crs.fromWgs84(5514, lon, lat)
      val (x2, y2) = Crs.fromWgs84(5514, lon + dLon, lat + dLat)
      val grid = math.hypot(x2 - x1, y2 - y1)
      val geo = graft.expr.GeoMath.geodesicKm(lat, lon, lat + dLat, lon + dLon) * 1000.0
      val ratio = grid / geo
      assert(ratio > 0.9997 && ratio < 1.0003,
        s"Krovak design envelope violated at ($lon, $lat): scale $ratio")
    }
    // .prj round trip + ESRI-name detection; the legacy south-west
    // variant (no East_North marker) refuses rather than flipping signs
    assert(Crs.epsgFromPrj(Crs.prjWkt(5514)) == Some(5514))
    assert(Crs.epsgFromPrj(
      """PROJCS["S-JTSK_Krovak_East_North",GEOGCS["GCS_S_JTSK"],PROJECTION["Krovak"]]""")
      == Some(5514))
    assert(Crs.epsgFromPrj(
      """PROJCS["S-JTSK_Krovak",GEOGCS["GCS_S_JTSK"],PROJECTION["Krovak"]]""").isEmpty,
      "south-west-positive Krovak must refuse, not silently flip")
    // unsupported neighbors still refuse loudly
    val e = intercept[IllegalArgumentException](Crs.toWgs84(5513, 1.0, 1.0))
    assert(e.getMessage.contains("unsupported"), e.getMessage)
  }

  test("Polish PUWG 1992/2000: scale anchors, zone structure, round trips") {
    // ETRS89 TM, no datum bridge: round trips to the Krüger-series floor
    for (lon <- Seq(14.3, 17.0, 19.0, 21.5, 23.9); lat <- Seq(49.1, 52.2, 54.8)) {
      val (x, y) = Crs.fromWgs84(2180, lon, lat)
      val (lo, la) = Crs.toWgs84(2180, x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"2180 round trip ($lon, $lat) -> ($lo, $la)")
    }
    // k₀ anchor: scale ON the central meridian is exactly 0.9993 — measure
    // grid/geodesic over a short meridian arc at 19°E
    val (x1, y1) = Crs.fromWgs84(2180, 19.0, 52.0)
    val (x2, y2) = Crs.fromWgs84(2180, 19.0, 52.1)
    val geo = graft.expr.GeoMath.geodesicKm(52.0, 19.0, 52.1, 19.0) * 1000.0
    val k = math.hypot(x2 - x1, y2 - y1) / geo
    assert(math.abs(k - 0.9993) < 1e-5, s"central-meridian scale $k != 0.9993")
    // design envelope: scale over Poland's 14–24°E span stays in
    // [0.9993, 1.0010] (single-zone TM distortion budget)
    for ((lon, lat) <- Seq((14.3, 53.5), (15.5, 51.0), (18.0, 54.3),
        (21.0, 52.2), (23.9, 50.5), (22.5, 49.3))) {
      val (a1, b1) = Crs.fromWgs84(2180, lon, lat)
      val (a2, b2) = Crs.fromWgs84(2180, lon + 0.15, lat)
      val g = graft.expr.GeoMath.geodesicKm(lat, lon, lat, lon + 0.15) * 1000.0
      val r = math.hypot(a2 - a1, b2 - b1) / g
      assert(r > 0.99925 && r < 1.0010,
        s"PUWG-92 design envelope violated at ($lon, $lat): $r")
    }
    // the false easting/northing structure: central meridian at 52°N maps
    // to E = 500000 exactly; Poland's northings land positive mid-range
    assert(math.abs(x1 - 500000.0) < 1e-6, s"FE: $x1")
    assert(y1 > 100000 && y1 < 900000, s"FN structure: $y1")
    // PUWG 2000 zones: k₀ = 0.999923 on each central meridian, FE stamps
    // the zone number (λ0/3) in the millions digit
    for (epsg <- 2176 to 2179) {
      val lon0 = 3.0 * (epsg - 2171)
      val (cx, cy) = Crs.fromWgs84(epsg, lon0, 52.0)
      assert(math.abs(cx - ((epsg - 2171) * 1000000.0 + 500000.0)) < 1e-6,
        s"$epsg FE: $cx")
      val (dx, dy) = Crs.fromWgs84(epsg, lon0, 52.1)
      val g2 = graft.expr.GeoMath.geodesicKm(52.0, lon0, 52.1, lon0) * 1000.0
      val k2 = math.hypot(dx - cx, dy - cy) / g2
      assert(math.abs(k2 - 0.999923) < 1e-5, s"$epsg scale $k2")
      val (lo, la) = Crs.toWgs84(epsg, cx + 12345.0, cy + 23456.0)
      val (rx, ry) = Crs.fromWgs84(epsg, lo, la)
      assert(math.hypot(rx - cx - 12345.0, ry - cy - 23456.0) < 1e-6)
    }
    // .prj round trips + ESRI-name detection
    assert(Crs.epsgFromPrj(Crs.prjWkt(2180)) == Some(2180))
    assert(Crs.epsgFromPrj(Crs.prjWkt(2177)) == Some(2177))
    assert(Crs.epsgFromPrj(
      """PROJCS["ETRS_1989_Poland_CS92",GEOGCS["GCS_ETRS_1989"]]""") == Some(2180))
    assert(Crs.epsgFromPrj(
      """PROJCS["ETRS_1989_Poland_CS2000_Zone_7",GEOGCS["GCS_ETRS_1989"]]""")
      == Some(2178))
  }

  test("NTF .prj carries the one-SP LCC parameters third-party readers need") {
    // Latitude_Of_Origin and Scale_Factor must be IN the WKT — a reader
    // without the AUTHORITY shortcut reconstructs lat0 = 0 otherwise
    for (epsg <- Seq(27561, 27562, 27563, 27564, 27571, 27572, 27573, 27574)) {
      val wkt = Crs.prjWkt(epsg)
      assert(wkt.contains("Latitude_Of_Origin"), s"$epsg: $wkt")
      assert(wkt.contains("Scale_Factor"), s"$epsg: $wkt")
      assert(Crs.epsgFromPrj(wkt) == Some(epsg))
    }
    // zone II carries its published lat0/k0
    val z2 = Crs.prjWkt(27572)
    assert(z2.contains("\"Latitude_Of_Origin\",46.8"), z2)
    assert(z2.contains("\"Scale_Factor\",0.99987742"), z2)
  }

  // --------------------------------------------- parametric .prj reader

  private def customTmPrj(name: String, datum: String, spheroid: String,
      a: Double, invf: Double, lon0: Double, lat0: Double, k0: Double,
      fe: Double, fn: Double, towgs: String = "",
      unit: String = """UNIT["Meter",1.0]"""): String =
    s"""PROJCS["$name",GEOGCS["GCS_$datum",DATUM["D_$datum",""" +
      s"""SPHEROID["$spheroid",$a,$invf]$towgs],""" +
      """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
      """PROJECTION["Transverse_Mercator"],""" +
      s"""PARAMETER["False_Easting",$fe],""" +
      s"""PARAMETER["False_Northing",$fn],""" +
      s"""PARAMETER["Central_Meridian",$lon0],""" +
      s"""PARAMETER["Scale_Factor",$k0],""" +
      s"""PARAMETER["Latitude_Of_Origin",$lat0],$unit]"""

  test("parametricFromPrj: unknown-name TM on WGS84 equals the anchored " +
      "UTM kernel; the per-EPSG table does NOT know the file") {
    // UTM zone 33N parameters under a name neither the authority tag nor
    // the name heuristics can place — only the PARAMETER values say UTM
    val prj = customTmPrj("Some_Local_Grid_1997", "WGS_1984", "WGS_1984",
      6378137.0, 298.257223563, 15.0, 0.0, 0.9996, 500000.0, 0.0)
    assert(Crs.epsgFromPrj(prj).isEmpty, "table must not recognize it")
    val par = Crs.parametricFromPrj(prj).getOrElse(fail("parametric reader refused"))
    for (lon <- Seq(12.0, 15.0, 17.9); lat <- Seq(37.0, 48.5, 60.0)) {
      val (x, y) = Crs.fromWgs84(32633, lon, lat)
      val (lo, la) = par.toWgs84(x, y)
      assert(math.abs(lo - lon) < 1e-11 && math.abs(la - lat) < 1e-11,
        s"($lon,$lat) → ($lo,$la)")
      val (px, py) = par.fromWgs84(lon, lat)
      assert(math.abs(px - x) < 1e-5 && math.abs(py - y) < 1e-5,
        s"forward drifted: ($px,$py) vs ($x,$y)")
    }
  }

  test("parametricFromPrj: non-equatorial TM origin + TOWGS84 Helmert " +
      "reproduces the anchored OSGB chain") {
    // British National Grid parameters + the published OSGB36→WGS84
    // TOWGS84 values, under a name the heuristics cannot place
    val prj = customTmPrj("Islands_Grid_A", "Airy_Custom", "Airy_1830",
      6377563.396, 299.3249646, -2.0, 49.0, 0.9996012717, 400000.0,
      -100000.0,
      towgs = ",TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894]")
    assert(Crs.epsgFromPrj(prj).isEmpty)
    val par = Crs.parametricFromPrj(prj).getOrElse(fail("refused"))
    // Caister water tower (OS worked example): compare to the anchored
    // 27700 path — same projection, TOWGS84 vs the exact-inverse Helmert
    // agree to first order (~1e-7 deg ≈ 1 cm)
    for ((e, n) <- Seq((651409.903, 313177.27), (400000.0, 65000.0),
        (200000.0, 700000.0))) {
      val (lonA, latA) = Crs.toWgs84(27700, e, n)
      val (lonP, latP) = par.toWgs84(e, n)
      assert(math.abs(lonA - lonP) < 1e-7 && math.abs(latA - latP) < 1e-7,
        s"($e,$n): anchored ($lonA,$latA) vs parametric ($lonP,$latP)")
      val (pe, pn) = par.fromWgs84(lonP, latP)
      // two Helmert legs × iterative xyzToGeod: mm-class closure (the
      // bridge itself is a ~5 m-class transform)
      assert(math.abs(pe - e) < 5e-3 && math.abs(pn - n) < 5e-3,
        s"round trip drifted: ($pe,$pn) vs ($e,$n)")
    }
  }

  test("parametricFromPrj: 2SP Lambert conformal conic equals the " +
      "anchored Lambert-93 kernel") {
    val prj =
      """PROJCS["Hexagone_Conic_X",GEOGCS["GCS_RGF_1993",""" +
        """DATUM["D_RGF_1993",SPHEROID["GRS_1980",6378137.0,298.257222101]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Lambert_Conformal_Conic"],""" +
        """PARAMETER["False_Easting",700000.0],""" +
        """PARAMETER["False_Northing",6600000.0],""" +
        """PARAMETER["Central_Meridian",3.0],""" +
        """PARAMETER["Standard_Parallel_1",44.0],""" +
        """PARAMETER["Standard_Parallel_2",49.0],""" +
        """PARAMETER["Latitude_Of_Origin",46.5],UNIT["Meter",1.0]]"""
    assert(Crs.epsgFromPrj(prj).isEmpty, "name heuristics must not fire")
    val par = Crs.parametricFromPrj(prj).getOrElse(fail("refused"))
    for (lon <- Seq(-4.0, 3.0, 7.5); lat <- Seq(42.5, 46.5, 50.8)) {
      val (x, y) = Crs.fromWgs84(2154, lon, lat)
      val (lo, la) = par.toWgs84(x, y)
      assert(math.abs(lo - lon) < 1e-11 && math.abs(la - lat) < 1e-11,
        s"($lon,$lat) → ($lo,$la)")
    }
  }

  test("parametricFromPrj: 1SP LCC (sp1 == lat0 + scale factor) " +
      "round-trips and anchors its false origin") {
    val prj =
      """PROJCS["Custom_Conic_1SP",GEOGCS["GCS_WGS_1984",""" +
        """DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Lambert_Conformal_Conic"],""" +
        """PARAMETER["False_Easting",300000.0],""" +
        """PARAMETER["False_Northing",750000.0],""" +
        """PARAMETER["Central_Meridian",25.0],""" +
        """PARAMETER["Standard_Parallel_1",-29.0],""" +
        """PARAMETER["Scale_Factor",0.9999],""" +
        """PARAMETER["Latitude_Of_Origin",-29.0],UNIT["Meter",1.0]]"""
    val par = Crs.parametricFromPrj(prj).getOrElse(fail("refused"))
    // the grid origin is the false origin by construction
    val (x0, y0) = par.fromWgs84(25.0, -29.0)
    assert(math.abs(x0 - 300000.0) < 1e-6 && math.abs(y0 - 750000.0) < 1e-6,
      s"($x0,$y0)")
    for (lon <- Seq(17.0, 25.0, 31.5); lat <- Seq(-34.5, -29.0, -23.0)) {
      val (x, y) = par.fromWgs84(lon, lat)
      val (lo, la) = par.toWgs84(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"($lon,$lat) → ($lo,$la)")
    }
  }

  test("parametricFromPrj: a foot-unit PROJCS converts coordinates AND " +
      "false origins") {
    val ftUs = 0.30480060960121924 // US survey foot, WKT1 to-meter factor
    // UTM 33N again, but declared in US survey feet: false origin and
    // runtime coordinates are all in feet
    val prj = customTmPrj("Feet_Grid_X", "WGS_1984", "WGS_1984",
      6378137.0, 298.257223563, 15.0, 0.0, 0.9996, 500000.0 / ftUs, 0.0,
      unit = s"""UNIT["Foot_US",$ftUs]""")
    val par = Crs.parametricFromPrj(prj).getOrElse(fail("refused"))
    val (x, y) = Crs.fromWgs84(32633, 16.2, 48.1)
    val (lo, la) = par.toWgs84(x / ftUs, y / ftUs)
    assert(math.abs(lo - 16.2) < 1e-11 && math.abs(la - 48.1) < 1e-11,
      s"($lo,$la)")
  }

  test("parametricFromPrj refusals: foreign datum without TOWGS84, " +
      "unsupported projection, non-Greenwich prime meridian") {
    // NAD27 UTM (the silent-200m hazard): datum name passes no allow
    // list and there is no TOWGS84 — must refuse
    val nad = customTmPrj("NAD_1927_UTM_Zone_17N", "North_American_1927",
      "Clarke_1866", 6378206.4, 294.9786982, -81.0, 0.0, 0.9996,
      500000.0, 0.0)
    assert(Crs.parametricFromPrj(nad).isEmpty, "NAD27 must refuse")
    // same file WITH a TOWGS84 bridge is expressible
    val nadBridged = customTmPrj("NAD_1927_UTM_Zone_17N_b",
      "North_American_1927", "Clarke_1866", 6378206.4, 294.9786982,
      -81.0, 0.0, 0.9996, 500000.0, 0.0,
      towgs = ",TOWGS84[-8.0,160.0,176.0]")
    assert(Crs.parametricFromPrj(nadBridged).isDefined,
      "TOWGS84 makes the datum expressible")
    // unsupported projection method
    val albers = nad.replace("Transverse_Mercator", "Albers")
    assert(Crs.parametricFromPrj(albers).isEmpty)
    // non-Greenwich prime meridian (NTF Paris stays with its anchored
    // family)
    val paris = customTmPrj("Paris_Grid", "WGS_1984", "WGS_1984",
      6378137.0, 298.257223563, 0.0, 0.0, 1.0, 0.0, 0.0)
      .replace("""PRIMEM["Greenwich",0.0]""",
        """PRIMEM["Paris",2.337229166666667]""")
    assert(Crs.parametricFromPrj(paris).isEmpty)
    // 1SP cone whose standard parallel contradicts its origin
    val badCone =
      """PROJCS["X",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",""" +
        """SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Lambert_Conformal_Conic"],""" +
        """PARAMETER["Central_Meridian",10.0],""" +
        """PARAMETER["Standard_Parallel_1",40.0],""" +
        """PARAMETER["Latitude_Of_Origin",45.0],UNIT["Meter",1.0]]"""
    assert(Crs.parametricFromPrj(badCone).isEmpty)
  }

  // Numeric scale factors and Jacobian for the parametric-projection
  // invariant tests (WGS84 fixtures → the identity datum bridge, so
  // fromWgs84 is the pure projection). Central differences at h = 1e-5°;
  // truncation error ~1e-8 relative, so 1e-5 tolerances are conservative.
  // Anchoring by INVARANT — equal-area/conformal Jacobian structure,
  // unit scale on the defining parallels, false-origin fixpoints —
  // rather than by any external coordinate table.
  private def projDerivs(par: Crs.ParametricCrs, lon: Double, lat: Double)
      : (Double, Double, Double, Double) = {
    val h = 1e-5
    val (xe, ye) = par.fromWgs84(lon + h, lat)
    val (xw, yw) = par.fromWgs84(lon - h, lat)
    val (xn, yn) = par.fromWgs84(lon, lat + h)
    val (xs, ys) = par.fromWgs84(lon, lat - h)
    val d = 2 * h * math.Pi / 180 // per-radian derivatives
    ((xe - xw) / d, (ye - yw) / d, (xn - xs) / d, (yn - ys) / d)
  }
  private val WgsA = 6378137.0
  private val WgsE2 = { val f = 1 / 298.257223563; f * (2 - f) }
  /** (parallel scale k, meridian scale h) at a point, numerically. */
  private def numScales(par: Crs.ParametricCrs, lon: Double, lat: Double)
      : (Double, Double) = {
    val (dxl, dyl, dxp, dyp) = projDerivs(par, lon, lat)
    val s = math.sin(math.toRadians(lat))
    val nR = WgsA / math.sqrt(1 - WgsE2 * s * s)
    val mR = WgsA * (1 - WgsE2) / math.pow(1 - WgsE2 * s * s, 1.5)
    (math.hypot(dxl, dyl) / (nR * math.cos(math.toRadians(lat))),
      math.hypot(dxp, dyp) / mR)
  }
  /** |Jacobian| / (ellipsoid area element) — 1 iff locally equal-area. */
  private def areaRatio(par: Crs.ParametricCrs, lon: Double, lat: Double)
      : Double = {
    val (dxl, dyl, dxp, dyp) = projDerivs(par, lon, lat)
    val s = math.sin(math.toRadians(lat))
    val nR = WgsA / math.sqrt(1 - WgsE2 * s * s)
    val mR = WgsA * (1 - WgsE2) / math.pow(1 - WgsE2 * s * s, 1.5)
    math.abs(dxl * dyp - dxp * dyl) /
      (mR * nR * math.cos(math.toRadians(lat)))
  }

  test("parametricFromPrj: Albers equal-area — area-true Jacobian, unit " +
      "scale on both standard parallels, false-origin fixpoint, round-trips") {
    val prj =
      """PROJCS["Custom_Albers",GEOGCS["GCS_WGS_1984",""" +
        """DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Albers"],""" +
        """PARAMETER["False_Easting",1500000.0],""" +
        """PARAMETER["False_Northing",2500000.0],""" +
        """PARAMETER["Central_Meridian",-96.0],""" +
        """PARAMETER["Standard_Parallel_1",29.5],""" +
        """PARAMETER["Standard_Parallel_2",45.5],""" +
        """PARAMETER["Latitude_Of_Origin",23.0],UNIT["Meter",1.0]]"""
    val par = Crs.parametricFromPrj(prj).getOrElse(fail("refused"))
    // the projection's defining property, checked pointwise: the map
    // Jacobian equals the ellipsoidal area element everywhere
    for (lon <- Seq(-120.0, -96.0, -75.0); lat <- Seq(25.0, 37.0, 48.0)) {
      val r = areaRatio(par, lon, lat)
      assert(math.abs(r - 1) < 2e-5, s"area ratio at ($lon,$lat): $r")
      val (x, y) = par.fromWgs84(lon, lat)
      val (lo, la) = par.toWgs84(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"($lon,$lat) → ($lo,$la)")
    }
    // the cone touches at the standard parallels: parallel scale 1 there,
    // < 1 between them, > 1 outside (Snyder §14)
    for (sp <- Seq(29.5, 45.5)) {
      val (k, _) = numScales(par, -100.0, sp)
      assert(math.abs(k - 1) < 1e-5, s"k at sp=$sp: $k")
    }
    assert(numScales(par, -100.0, 37.0)._1 < 1.0 - 1e-4)
    assert(numScales(par, -100.0, 52.0)._1 > 1.0 + 1e-4)
    // grid origin = false origin
    val (x0, y0) = par.fromWgs84(-96.0, 23.0)
    assert(math.abs(x0 - 1500000.0) < 1e-6 && math.abs(y0 - 2500000.0) < 1e-6,
      s"($x0,$y0)")
  }

  test("parametricFromPrj: polar stereographic — conformal, unit scale " +
      "on the standard parallel, pole fixpoint, ESRI spelling equivalent") {
    // OGC variant B, Antarctic-shaped: standard parallel −71°S
    val ogc =
      """PROJCS["Custom_PS_B",GEOGCS["GCS_WGS_1984",""" +
        """DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Polar_Stereographic"],""" +
        """PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],""" +
        """PARAMETER["Central_Meridian",0.0],""" +
        """PARAMETER["Latitude_Of_Origin",-71.0],UNIT["Meter",1.0]]"""
    val par = Crs.parametricFromPrj(ogc).getOrElse(fail("refused"))
    for (lon <- Seq(-150.0, 0.0, 45.0, 150.0); lat <- Seq(-88.0, -75.0, -60.0)) {
      // conformal: meridian and parallel scales agree at every point
      val (k, hM) = numScales(par, lon, lat)
      assert(math.abs(k / hM - 1) < 2e-5, s"k=$k h=$hM at ($lon,$lat)")
      val (x, y) = par.fromWgs84(lon, lat)
      val (lo, la) = par.toWgs84(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"($lon,$lat) → ($lo,$la)")
    }
    // the standard parallel is true to scale; the pole maps to the origin
    assert(math.abs(numScales(par, 30.0, -71.0)._1 - 1) < 1e-5)
    val (xp, yp) = par.fromWgs84(123.0, -90.0)
    assert(math.hypot(xp, yp) < 1e-6, s"pole → ($xp,$yp)")
    // south aspect axis convention: on the central meridian, points move
    // AWAY from the pole toward +N (EPSG 9829 south orientation)
    val (x1, y1) = par.fromWgs84(0.0, -75.0)
    assert(math.abs(x1) < 1e-6 && y1 > 1000.0, s"($x1,$y1)")
    // ESRI spelling with the parallel as Standard_Parallel_1: identical
    val esri = ogc
      .replace(""""Polar_Stereographic"""", """"Stereographic_South_Pole"""")
      .replace("""PARAMETER["Latitude_Of_Origin",-71.0]""",
        """PARAMETER["Standard_Parallel_1",-71.0]""")
    val par2 = Crs.parametricFromPrj(esri).getOrElse(fail("ESRI refused"))
    for (lon <- Seq(-120.0, 60.0); lat <- Seq(-85.0, -65.0)) {
      val (xa, ya) = par.fromWgs84(lon, lat)
      val (xb, yb) = par2.fromWgs84(lon, lat)
      assert(math.abs(xa - xb) < 1e-9 && math.abs(ya - yb) < 1e-9,
        s"OGC ($xa,$ya) vs ESRI ($xb,$yb)")
    }
    // variant A (pole origin + scale factor): conformal, k0 at the pole
    val va = ogc
      .replace("""PARAMETER["Latitude_Of_Origin",-71.0]""",
        """PARAMETER["Latitude_Of_Origin",90.0],""" +
          """PARAMETER["Scale_Factor",0.994]""")
    val parA = Crs.parametricFromPrj(va).getOrElse(fail("variant A refused"))
    val (kp, hp) = numScales(parA, 10.0, 89.9)
    assert(math.abs(kp / hp - 1) < 2e-5 && math.abs(kp - 0.994) < 1e-4,
      s"near-pole scale $kp/$hp (k0=0.994)")
    val (lo9, la9) = parA.toWgs84(parA.fromWgs84(37.0, 70.0)._1,
      parA.fromWgs84(37.0, 70.0)._2)
    assert(math.abs(lo9 - 37.0) < 1e-9 && math.abs(la9 - 70.0) < 1e-9)
  }

  test("parametricFromPrj: oblique stereographic (EPSG 9809) — conformal, " +
      "k0 at the origin, origin fixpoint, Dutch-style secant growth") {
    // RD New's method with RD New's PARAMETER values (public EPSG 28992
    // definition) but on the WGS84 datum, so projection math is isolated
    // from any datum bridge. Anchored by invariant, not coordinate table.
    val prj =
      """PROJCS["Custom_Double_Stereo",GEOGCS["GCS_WGS_1984",""" +
        """DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Oblique_Stereographic"],""" +
        """PARAMETER["False_Easting",155000.0],""" +
        """PARAMETER["False_Northing",463000.0],""" +
        """PARAMETER["Central_Meridian",5.38763888888889],""" +
        """PARAMETER["Scale_Factor",0.9999079],""" +
        """PARAMETER["Latitude_Of_Origin",52.15616055555555],""" +
        """UNIT["Meter",1.0]]"""
    val par = Crs.parametricFromPrj(prj).getOrElse(fail("refused"))
    // origin fixpoint: the latitude/longitude of origin maps to the
    // false origin exactly
    val (x0, y0) = par.fromWgs84(5.38763888888889, 52.15616055555555)
    assert(math.abs(x0 - 155000.0) < 1e-6 && math.abs(y0 - 463000.0) < 1e-6,
      s"origin → ($x0,$y0)")
    // conformal at every probe point (NL-and-beyond envelope), and exact
    // round trips
    for (lon <- Seq(3.4, 5.4, 6.9); lat <- Seq(50.8, 52.2, 53.4)) {
      val (k, hM) = numScales(par, lon, lat)
      assert(math.abs(k / hM - 1) < 2e-5, s"k=$k h=$hM at ($lon,$lat)")
      val (x, y) = par.fromWgs84(lon, lat)
      val (lo, la) = par.toWgs84(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"($lon,$lat) → ($lo,$la)")
    }
    // scale at the origin is k0 (< 1: secant), growing with distance —
    // the 9809 scale structure
    val (kO, hO) = numScales(par, 5.38763888888889, 52.15616055555555)
    assert(math.abs(kO - 0.9999079) < 1e-6 && math.abs(hO - 0.9999079) < 1e-6,
      s"origin scale $kO/$hO (k0=0.9999079)")
    assert(numScales(par, 5.39, 53.4)._1 > kO + 1e-5, "scale must grow outward")
    // Double_Stereographic (ESRI spelling) is the same method
    val par2 = Crs.parametricFromPrj(prj.replace(
      """"Oblique_Stereographic"""", """"Double_Stereographic""""))
      .getOrElse(fail("Double_Stereographic refused"))
    for (lon <- Seq(4.1, 6.2); lat <- Seq(51.0, 53.0)) {
      val (xa, ya) = par.fromWgs84(lon, lat)
      val (xb, yb) = par2.fromWgs84(lon, lat)
      assert(math.abs(xa - xb) < 1e-9 && math.abs(ya - yb) < 1e-9)
    }
    // a Bessel + TOWGS84 RD-New-shaped file passes end-to-end (datum
    // bridge + projection), and round-trips through both
    val rd =
      """PROJCS["RD_New_Shaped",GEOGCS["GCS_Amersfoort",""" +
        """DATUM["D_Amersfoort",SPHEROID["Bessel_1841",6377397.155,299.1528128],""" +
        """TOWGS84[565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,4.0725]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Oblique_Stereographic"],""" +
        """PARAMETER["False_Easting",155000.0],""" +
        """PARAMETER["False_Northing",463000.0],""" +
        """PARAMETER["Central_Meridian",5.38763888888889],""" +
        """PARAMETER["Scale_Factor",0.9999079],""" +
        """PARAMETER["Latitude_Of_Origin",52.15616055555555],""" +
        """UNIT["Meter",1.0]]"""
    val parRd = Crs.parametricFromPrj(rd).getOrElse(fail("RD shape refused"))
    val (rx, ry) = parRd.fromWgs84(5.2, 52.1) // ~ Utrecht
    // sanity envelope: RD coordinates of the Netherlands sit in
    // (0..300km, 300..650km) — catches axis/sign/datum-direction slips
    assert(rx > 0 && rx < 300000 && ry > 300000 && ry < 650000,
      s"RD-shaped ($rx,$ry)")
    val (rlo, rla) = parRd.toWgs84(rx, ry)
    assert(math.abs(rlo - 5.2) < 1e-8 && math.abs(rla - 52.1) < 1e-8,
      s"RD round trip ($rlo,$rla)")
    // pole-origin "oblique" stereographic is a mislabeled polar file
    assert(Crs.parametricFromPrj(prj.replace(
      """PARAMETER["Latitude_Of_Origin",52.15616055555555]""",
      """PARAMETER["Latitude_Of_Origin",90.0]""")).isEmpty)
  }

  test("parametricFromPrj: Albers/stereographic refusal discipline") {
    def wgs(body: String) =
      """PROJCS["X",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",""" +
        """SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        body + """,UNIT["Meter",1.0]]"""
    // Albers with a non-unit scale factor is not EPSG 9822
    assert(Crs.parametricFromPrj(wgs(
      """PROJECTION["Albers"],PARAMETER["Central_Meridian",-96.0],""" +
        """PARAMETER["Standard_Parallel_1",29.5],""" +
        """PARAMETER["Scale_Factor",0.99],""" +
        """PARAMETER["Latitude_Of_Origin",23.0]""")).isEmpty)
    // Albers without any standard parallel
    assert(Crs.parametricFromPrj(wgs(
      """PROJECTION["Albers"],PARAMETER["Central_Meridian",-96.0],""" +
        """PARAMETER["Latitude_Of_Origin",23.0]""")).isEmpty)
    // oblique stereographic is a different method
    assert(Crs.parametricFromPrj(wgs(
      """PROJECTION["Stereographic"],PARAMETER["Central_Meridian",10.0],""" +
        """PARAMETER["Latitude_Of_Origin",52.0]""")).isEmpty)
    // ESRI pole name whose parallel sits in the wrong hemisphere
    assert(Crs.parametricFromPrj(wgs(
      """PROJECTION["Stereographic_South_Pole"],""" +
        """PARAMETER["Central_Meridian",0.0],""" +
        """PARAMETER["Standard_Parallel_1",71.0]""")).isEmpty)
    // polar stereographic with an equatorial origin is underdetermined
    assert(Crs.parametricFromPrj(wgs(
      """PROJECTION["Polar_Stereographic"],""" +
        """PARAMETER["Central_Meridian",0.0],""" +
        """PARAMETER["Latitude_Of_Origin",0.0]""")).isEmpty)
  }

  test("wktTransformToWgs84 transforms bare-decimal-point coordinates") {
    // ".5" / "-.5" are valid WKT numbers; a digit-first pattern would
    // skip the pair silently, mixing projected and geographic coords
    val out = Crs.wktTransformToWgs84(3857, "LINESTRING (.5 -.5, 111319.5 0)")
    val nums = """[-0-9.eE]*[0-9][-0-9.eE]*""".r.findAllIn(out).toSeq.map(_.toDouble)
    assert(nums.length == 4, s"got $out")
    assert(math.abs(nums(0)) < 1e-4 && math.abs(nums(1)) < 1e-4,
      s"sub-meter offsets must map to ~0 degrees, got $out")
    assert(math.abs(nums(2) - 1.0) < 1e-3, s"111319.5 m ~ 1 degree, got $out")
  }
}
