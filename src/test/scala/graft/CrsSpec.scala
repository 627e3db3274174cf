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
    intercept[IllegalArgumentException] { Crs.toWgs84(32632, 0, 0) }
    intercept[IllegalArgumentException] { Crs.fromWgs84(2154, 0, 0) }
  }
}
