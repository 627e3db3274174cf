package graft.geo

/** NTv2 grid-shift file (`.gsb`) reader + bilinear shift application —
  * the sub-meter datum-transformation tail that parameter-based Helmert
  * bridges cannot reach (the reference delegates this class of work to
  * pyproj's grid files, `lib/initialization.py:26,38`; this implements
  * the same public format natively).
  *
  * Format (public: NRCan "National Transformation version 2" developer's
  * guide; independently documented in the PROJ and GDAL sources):
  *
  *   - 11 overview records of 16 bytes (8-char name + 8-byte value):
  *     NUM_OREC/NUM_SREC/NUM_FILE are int32 (+4 pad), GS_TYPE/VERSION/
  *     SYSTEM_F/SYSTEM_T are 8-char strings, MAJOR_F/MINOR_F/MAJOR_T/
  *     MINOR_T are float64.
  *   - per subgrid, 11 header records: SUB_NAME/PARENT/CREATED/UPDATED
  *     strings; S_LAT/N_LAT/E_LONG/W_LONG/LAT_INC/LONG_INC float64 in
  *     ARC-SECONDS with LONGITUDE POSITIVE WEST (the format's trap);
  *     GS_COUNT int32.
  *   - GS_COUNT node records of 4×float32: lat shift (arc-sec), lon
  *     shift (arc-sec, positive west), two accuracy fields. Nodes run
  *     row-major from S_LAT northward, within a row from E_LONG
  *     westward.
  *   - Either endianness; detected from NUM_OREC's known value (11).
  *
  * Scale posture: a national grid file is megabytes — driver-read once
  * and broadcast-sized, like the CRS sidecars; application is pure
  * per-row math. The shift direction is source→target datum; [[Grid
  * .inverse]] iterates the forward shift (3 rounds ≪ 1e-9° residual —
  * shifts are ~1e-3° and vary slowly).
  */
object Ntv2 {

  final case class SubGrid(name: String, parent: String,
      sLat: Double, nLat: Double, eLon: Double, wLon: Double,
      latInc: Double, lonInc: Double, nRows: Int, nCols: Int,
      latShift: Array[Float], lonShift: Array[Float]) {
    /** point (arc-sec, lon positive WEST) inside this subgrid's box? */
    def contains(lonSecW: Double, latSec: Double): Boolean =
      latSec >= sLat && latSec <= nLat && lonSecW >= eLon && lonSecW <= wLon
    def cellArea: Double = latInc * lonInc
  }

  final case class Grid(systemFrom: String, systemTo: String,
      subgrids: Seq[SubGrid]) {

    /** Bilinear (Δlat, Δlon) in arc-seconds (Δlon positive WEST) at an
      * east-positive degree position; None outside every subgrid. Among
      * covering subgrids the FINEST (smallest cell) wins — NTv2 child
      * grids densify subareas of their parent.
      */
    def shiftSeconds(lonDeg: Double, latDeg: Double)
        : Option[(Double, Double)] = {
      val lonW = -lonDeg * 3600.0
      val lat = latDeg * 3600.0
      val g = subgrids.filter(_.contains(lonW, lat))
        .sortBy(s => (s.cellArea, s.name)).headOption.getOrElse(return None)
      // fractional node position; clamp so the N/W edges use the last cell
      val rf = math.min((lat - g.sLat) / g.latInc, g.nRows - 1.0)
      val cf = math.min((lonW - g.eLon) / g.lonInc, g.nCols - 1.0)
      val r0 = math.min(rf.toInt, g.nRows - 2).max(0)
      val c0 = math.min(cf.toInt, g.nCols - 2).max(0)
      val dr = rf - r0; val dc = cf - c0
      def bil(a: Array[Float]): Double = {
        val i00 = r0 * g.nCols + c0
        val i01 = i00 + 1; val i10 = i00 + g.nCols; val i11 = i10 + 1
        a(i00) * (1 - dr) * (1 - dc) + a(i01) * (1 - dr) * dc +
          a(i10) * dr * (1 - dc) + a(i11) * dr * dc
      }
      Some((bil(g.latShift), bil(g.lonShift)))
    }

    /** source-datum → target-datum geographic coordinates (east-positive
      * degrees); None outside grid coverage.
      */
    def forward(lonDeg: Double, latDeg: Double): Option[(Double, Double)] =
      shiftSeconds(lonDeg, latDeg).map { case (dLat, dLonW) =>
        (lonDeg - dLonW / 3600.0, latDeg + dLat / 3600.0)
      }

    /** The (to, from) function pair for
      * [[graft.geo.Crs.ParametricCrs.withDatumBridge]] — grid-shift datum
      * transformation composed under an existing projected CRS. Points
      * OUTSIDE grid coverage throw instead of passing through: the whole
      * point of a grid bridge is sub-meter accuracy, and silently
      * degrading to identity would corrupt coordinates by the full datum
      * offset with no signal.
      */
    def bridge: ((Double, Double) => (Double, Double),
        (Double, Double) => (Double, Double)) = {
      def fail(lon: Double, lat: Double): Nothing =
        throw new IllegalArgumentException(
          f"($lon%.6f, $lat%.6f) outside NTv2 grid coverage " +
            s"($systemFrom → $systemTo) — no silent fallthrough")
      ((lon, lat) => forward(lon, lat).getOrElse(fail(lon, lat)),
        (lon, lat) => inverse(lon, lat).getOrElse(fail(lon, lat)))
    }

    /** target-datum → source-datum: fixed-point iteration on the forward
      * shift (the standard NTv2 reverse application).
      */
    def inverse(lonDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      var lon = lonDeg; var lat = latDeg
      var i = 0
      while (i < 4) {
        val (dLat, dLonW) = shiftSeconds(lon, lat).getOrElse(return None)
        lon = lonDeg + dLonW / 3600.0
        lat = latDeg - dLat / 3600.0
        i += 1
      }
      Some((lon, lat))
    }
  }

  /** Parse a `.gsb` from bytes (driver-side; national grids are MBs). */
  def parse(bytes: Array[Byte]): Grid = {
    import java.nio.{ByteBuffer, ByteOrder}
    require(bytes.length >= 11 * 16, "NTv2: truncated overview header")
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // endianness from NUM_OREC == 11
    val buf =
      if (le.getInt(8) == 11) le
      else {
        val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
        require(be.getInt(8) == 11,
          s"NTv2: NUM_OREC is ${le.getInt(8)}/${be.getInt(8)} in either " +
            "byte order — not an NTv2 overview header")
        be
      }
    def name(off: Int): String =
      new String(bytes, off, 8, "US-ASCII")
    def str(off: Int): String =
      new String(bytes, off + 8, 8, "US-ASCII").trim
    def i32(off: Int): Int = buf.getInt(off + 8)
    def f64(off: Int): Double = buf.getDouble(off + 8)
    def rec(base: Int, want: String, idx: Int): Int = {
      val off = base + idx * 16
      require(name(off).trim.equalsIgnoreCase(want.trim),
        s"NTv2: expected record '$want' at offset $off, found '${name(off)}'")
      off
    }
    val nFile = i32(rec(0, "NUM_FILE", 2))
    val gsType = str(rec(0, "GS_TYPE", 3))
    require(gsType.equalsIgnoreCase("SECONDS"),
      s"NTv2: GS_TYPE '$gsType' unsupported (only SECONDS grids)")
    val sysF = str(rec(0, "SYSTEM_F", 5))
    val sysT = str(rec(0, "SYSTEM_T", 6))
    require(nFile >= 1 && nFile < 4096, s"NTv2: NUM_FILE $nFile out of range")
    var off = 11 * 16
    val subs = (0 until nFile).map { _ =>
      require(bytes.length >= off + 11 * 16, "NTv2: truncated subgrid header")
      val sub = str(rec(off, "SUB_NAME", 0))
      val parent = str(rec(off, "PARENT", 1))
      val sLat = f64(rec(off, "S_LAT", 4))
      val nLat = f64(rec(off, "N_LAT", 5))
      val eLon = f64(rec(off, "E_LONG", 6))
      val wLon = f64(rec(off, "W_LONG", 7))
      val latInc = f64(rec(off, "LAT_INC", 8))
      val lonInc = f64(rec(off, "LONG_INC", 9))
      val gsCount = i32(rec(off, "GS_COUNT", 10))
      require(latInc > 0 && lonInc > 0 && nLat > sLat && wLon > eLon,
        s"NTv2: degenerate subgrid '$sub' extents")
      val nRows = math.round((nLat - sLat) / latInc).toInt + 1
      val nCols = math.round((wLon - eLon) / lonInc).toInt + 1
      require(nRows >= 2 && nCols >= 2 && nRows.toLong * nCols == gsCount,
        s"NTv2: subgrid '$sub' GS_COUNT $gsCount != $nRows x $nCols")
      off += 11 * 16
      require(bytes.length >= off + gsCount * 16, s"NTv2: '$sub' truncated nodes")
      val latS = new Array[Float](gsCount)
      val lonS = new Array[Float](gsCount)
      var i = 0
      while (i < gsCount) {
        latS(i) = buf.getFloat(off); lonS(i) = buf.getFloat(off + 4)
        off += 16; i += 1
      }
      SubGrid(sub, parent, sLat, nLat, eLon, wLon, latInc, lonInc,
        nRows, nCols, latS, lonS)
    }
    Grid(sysF, sysT, subs)
  }

  def read(path: String): Grid =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}
