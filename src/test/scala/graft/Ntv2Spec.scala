package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Ntv2
import java.nio.{ByteBuffer, ByteOrder}

/** NTv2 grid-shift reader spec. No real national grid ships in this
  * container, so the fixtures are synthesized BYTE-FOR-BYTE to the
  * published format (overview + subgrid records, west-positive
  * longitudes, row-major S→N / E→W node order, float32 nodes) with an
  * analytically LINEAR shift field — linear fields make bilinear
  * interpolation exact at every point, so the expected values come from
  * the formula, not from the implementation under test.
  *
  * Known residual gap, stated honestly: with zero egress and no PROJ/
  * pyproj in the container, no AUTHORITATIVE worked example (an NRCan
  * developer-guide point or a PROJ gie vector) can pin the conventions
  * against an independent reader — a builder/reader pair that mirrored
  * the same sign or ordering error would pass these tests. What bounds
  * that risk offline: the conventions asserted here are each stated
  * directly by the public format description (west-positive longitudes,
  * lat-shift-then-lon-shift node records, S→N/E→W order, NUM_OREC=11
  * probe), and the q134 correctness row has DuckDB independently
  * recompute the whole bilinear application from the node formulas as a
  * relation. Validating one national grid against PROJ on a networked
  * machine remains the right first step before production use.
  *
  * Round-10 re-check: the container has no `proj`/`cs2cs`/`pyproj`, no
  * PROJ resource dir, and no `.gsb` file anywhere on disk, and typing
  * in "published" node values from memory would risk fabricated
  * constants — strictly worse than the stated gap. The gap therefore
  * stays open BY CHOICE until a networked validation can import a real
  * vector verbatim with its source citation.
  */
class Ntv2Spec extends AnyFunSuite {

  private def rec(buf: ByteBuffer, name: String)(write: ByteBuffer => Unit): Unit = {
    buf.put(String.format("%-8s", name).getBytes("US-ASCII"))
    val before = buf.position()
    write(buf)
    while (buf.position() < before + 8) buf.put(0.toByte)
  }

  private case class Sub(name: String, parent: String,
      sLat: Double, nLat: Double, eLon: Double, wLon: Double,
      latInc: Double, lonInc: Double,
      latF: (Int, Int) => Float, lonF: (Int, Int) => Float)

  private def mkGsb(order: ByteOrder, subs: Seq[Sub],
      gsType: String = "SECONDS"): Array[Byte] = {
    val sizes = subs.map { s =>
      val nr = math.round((s.nLat - s.sLat) / s.latInc).toInt + 1
      val nc = math.round((s.wLon - s.eLon) / s.lonInc).toInt + 1
      (nr, nc)
    }
    val total = 11 * 16 +
      subs.zip(sizes).map { case (_, (nr, nc)) => 11 * 16 + nr * nc * 16 }.sum
    val buf = ByteBuffer.allocate(total).order(order)
    rec(buf, "NUM_OREC")(_.putInt(11))
    rec(buf, "NUM_SREC")(_.putInt(11))
    rec(buf, "NUM_FILE")(_.putInt(subs.size))
    rec(buf, "GS_TYPE")(_.put(String.format("%-8s", gsType).getBytes("US-ASCII")))
    rec(buf, "VERSION")(_.put("NTv2.0  ".getBytes("US-ASCII")))
    rec(buf, "SYSTEM_F")(_.put("SRCDATUM".getBytes("US-ASCII")))
    rec(buf, "SYSTEM_T")(_.put("DSTDATUM".getBytes("US-ASCII")))
    rec(buf, "MAJOR_F")(_.putDouble(6378137.0))
    rec(buf, "MINOR_F")(_.putDouble(6356752.314))
    rec(buf, "MAJOR_T")(_.putDouble(6378137.0))
    rec(buf, "MINOR_T")(_.putDouble(6356752.314))
    subs.zip(sizes).foreach { case (s, (nr, nc)) =>
      rec(buf, "SUB_NAME")(_.put(String.format("%-8s", s.name).getBytes("US-ASCII")))
      rec(buf, "PARENT")(_.put(String.format("%-8s", s.parent).getBytes("US-ASCII")))
      rec(buf, "CREATED")(_.put("20260813".getBytes("US-ASCII")))
      rec(buf, "UPDATED")(_.put("20260813".getBytes("US-ASCII")))
      rec(buf, "S_LAT")(_.putDouble(s.sLat))
      rec(buf, "N_LAT")(_.putDouble(s.nLat))
      rec(buf, "E_LONG")(_.putDouble(s.eLon))
      rec(buf, "W_LONG")(_.putDouble(s.wLon))
      rec(buf, "LAT_INC")(_.putDouble(s.latInc))
      rec(buf, "LONG_INC")(_.putDouble(s.lonInc))
      rec(buf, "GS_COUNT")(_.putInt(nr * nc))
      for (r <- 0 until nr; c <- 0 until nc) {
        buf.putFloat(s.latF(r, c)); buf.putFloat(s.lonF(r, c))
        buf.putFloat(0.01f); buf.putFloat(0.01f)
      }
    }
    buf.array()
  }

  // base grid: lat 45..46°N, lon 1..3°E (west-positive −10800..−3600),
  // 300″ × 360″ cells; shifts linear in (row, col) → bilinear-exact
  private val latF = (r: Int, c: Int) => (1.5 + 0.25 * r + 0.5 * c).toFloat
  private val lonF = (r: Int, c: Int) => (-2.0 + 0.125 * r + 0.25 * c).toFloat
  private val base = Sub("BASE", "NONE", 162000.0, 165600.0, -10800.0,
    -3600.0, 300.0, 360.0, latF, lonF)

  test("parse + bilinear shift: node-exact, mid-cell analytic, both endian") {
    for (order <- Seq(ByteOrder.LITTLE_ENDIAN, ByteOrder.BIG_ENDIAN)) {
      val g = Ntv2.parse(mkGsb(order, Seq(base)))
      assert(g.systemFrom == "SRCDATUM" && g.systemTo == "DSTDATUM")
      assert(g.subgrids.head.nRows == 13 && g.subgrids.head.nCols == 21)
      // node (r=4, c=10): lat = 45° + 4·300″, lonW = −10800 + 10·360 =
      // −7200″ → lon east = +2°
      val (dLat, dLonW) = g.shiftSeconds(2.0, 45.0 + 4 * 300.0 / 3600)
        .getOrElse(fail("inside point refused"))
      assert(math.abs(dLat - latF(4, 10)) < 1e-12, s"$dLat")
      assert(math.abs(dLonW - lonF(4, 10)) < 1e-12, s"$dLonW")
      // mid-cell (r=3.5, c=10.25): linear field → bilinear is exact
      val lat2 = (162000.0 + 3.5 * 300.0) / 3600
      val lon2 = -(-10800.0 + 10.25 * 360.0) / 3600
      val (a, b) = g.shiftSeconds(lon2, lat2).getOrElse(fail("refused"))
      assert(math.abs(a - (1.5 + 0.25 * 3.5 + 0.5 * 10.25)) < 1e-6, s"$a")
      assert(math.abs(b - (-2.0 + 0.125 * 3.5 + 0.25 * 10.25)) < 1e-6, s"$b")
      // outside the box: None (no silent extrapolation)
      assert(g.shiftSeconds(0.5, 45.5).isEmpty)
      assert(g.shiftSeconds(2.0, 47.0).isEmpty)
    }
  }

  test("forward applies east-positive sign convention; inverse round-trips") {
    val g = Ntv2.parse(mkGsb(ByteOrder.LITTLE_ENDIAN, Seq(base)))
    val (lon, lat) = (2.2, 45.4)
    val (dLat, dLonW) = g.shiftSeconds(lon, lat).get
    val (lonT, latT) = g.forward(lon, lat).get
    // west-positive shift SUBTRACTS from an east-positive longitude
    assert(math.abs(lonT - (lon - dLonW / 3600)) < 1e-12)
    assert(math.abs(latT - (lat + dLat / 3600)) < 1e-12)
    val (lonB, latB) = g.inverse(lonT, latT).get
    assert(math.abs(lonB - lon) < 1e-9 && math.abs(latB - lat) < 1e-9,
      s"round-trip ($lonB,$latB)")
  }

  test("grid bridge composes under a parametric projected CRS") {
    import graft.geo.Crs
    // a TM grid whose GEOGCS datum is the NTv2 source: projection math
    // from the .prj, datum step swapped for the grid shift
    val prj =
      """PROJCS["Grid_TM",GEOGCS["GCS_WGS_1984",""" +
        """DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Transverse_Mercator"],""" +
        """PARAMETER["False_Easting",500000.0],""" +
        """PARAMETER["False_Northing",0.0],""" +
        """PARAMETER["Central_Meridian",3.0],""" +
        """PARAMETER["Scale_Factor",0.9996],""" +
        """PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]"""
    val plain = Crs.parametricFromPrj(prj).getOrElse(fail("refused"))
    val g = Ntv2.parse(mkGsb(ByteOrder.LITTLE_ENDIAN, Seq(base)))
    val (to, from) = g.bridge
    val bridged = plain.withDatumBridge(to, from)
    val (x, y) = plain.fromWgs84(2.2, 45.4) // source-datum geographic in
    // the bridged CRS: same projected point reads back SHIFTED geographic
    val (lon1, lat1) = bridged.toWgs84(x, y)
    val (dLat, dLonW) = g.shiftSeconds(2.2, 45.4).get
    assert(math.abs(lon1 - (2.2 - dLonW / 3600)) < 1e-9, s"$lon1")
    assert(math.abs(lat1 - (45.4 + dLat / 3600)) < 1e-9, s"$lat1")
    // and round-trips through the grid's iterative inverse
    val (x2, y2) = bridged.fromWgs84(lon1, lat1)
    assert(math.abs(x2 - x) < 1e-4 && math.abs(y2 - y) < 1e-4,
      s"($x2,$y2) vs ($x,$y)")
    // outside grid coverage: loud refusal, not silent identity
    intercept[IllegalArgumentException] { bridged.toWgs84(
      plain.fromWgs84(10.0, 55.0)._1, plain.fromWgs84(10.0, 55.0)._2) }
  }

  test("finest covering subgrid wins; parser refuses non-SECONDS and junk") {
    // child densifies the NE quarter with a constant field that differs
    // from the parent's — points inside the child must use it
    val child = Sub("CHILD", "BASE", 163800.0, 165600.0, -7200.0, -3600.0,
      150.0, 180.0, (_, _) => 10.0f, (_, _) => 20.0f)
    val g = Ntv2.parse(mkGsb(ByteOrder.LITTLE_ENDIAN, Seq(base, child)))
    val (dLat, dLonW) = g.shiftSeconds(1.5, 45.8).get
    assert(dLat == 10.0 && dLonW == 20.0, s"child must win: $dLat/$dLonW")
    assert(g.shiftSeconds(2.5, 45.2).get._1 != 10.0, "parent area unaffected")
    intercept[IllegalArgumentException] {
      Ntv2.parse(mkGsb(ByteOrder.LITTLE_ENDIAN, Seq(base), gsType = "RADIANS"))
    }
    intercept[IllegalArgumentException] {
      Ntv2.parse(Array.fill[Byte](256)(7))
    }
  }
}
