package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.geo.Geometry
import graft.geo.Geometry.{Poly, Pt}

/** S4/S7: real ESRI shapefile scan and sink, pure JDK (ByteBuffer over the
  * public shapefile + dBASE III formats — no external codec dependency).
  *
  * Reference behavior reproduced: `gpd.read_file(path, bbox=...)`
  * (code/lib/initialization.py:26,38-39,57-58,79-80) including the bbox
  * record skip, and the pyshp polyline/polygon writers
  * (code/lib/spatial_functions.py:266-268,460-466;
  * code/lib/correction_functions.py:543-553,665-678).
  *
  * Geometry model: WKT string column (`geometry`), same as every other
  * vector layer in the engine — downstream spatial operators are unchanged.
  * Shape types: Point (1), PolyLine (3), Polygon (5) with multi-ring /
  * hole handling (SHP outer rings are clockwise, holes counter-clockwise;
  * holes are assigned to the smallest containing outer ring).
  *
  * Scale posture: shapefiles are the reference's *dimension* layers
  * (country/region polygons, grid endpoints — thousands of records, MBs),
  * always the broadcast side of a spatial join; a bounded driver-side
  * parse + createDataFrame is the right 100 TB shape, mirroring the
  * documented EuCsv/ExcelTable contract. Both read and write go through
  * the Hadoop FileSystem API so hdfs/s3a paths work. The reader refuses
  * files > 256 MB loudly rather than OOM silently. Fact-scale geometry
  * belongs in parquet WKT columns, not .shp.
  */
object Shapefile {

  private val MaxBytes = 256L << 20

  // ------------------------------------------------------------------ read

  /** Read `base.shp` + `base.dbf` into (attrs..., geometry WKT).
    *
    * CRS: when a `base.prj` sidecar exists, its CRS is detected
    * ([[graft.geo.Crs.epsgFromPrj]]) and every geometry is reprojected
    * into 4326 at ingestion — the reference's transparent
    * `gpd.read_file(...).to_crs(epsg:4326)` (code/lib/initialization.py:
    * 39,58,80). A `.prj` outside the per-EPSG table falls back to the
    * generic parametric TM/LCC reader
    * ([[graft.geo.Crs.parametricFromPrj]]); when that too cannot express
    * it, the read FAILS LOUDLY (naming the EPSG if one was detected)
    * instead of silently mixing meters into a lon/lat world.
    * Without a `.prj`, coordinates are taken as already-4326 (the
    * pre-round-4 contract). The `bbox` filter applies in FILE coordinates
    * (pre-reprojection), matching gpd's bbox semantics.
    *
    * @param base path without extension (like gpd.read_file minus suffix
    *             resolution); `.shp`/`.dbf` are appended.
    * @param bbox optional (xmin, ymin, xmax, ymax) — records whose shape
    *             bbox does not intersect it are skipped at scan, before
    *             geometry decode (the gpd `bbox=` pushdown).
    */
  def read(spark: SparkSession, base: String,
      bbox: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    val shp = readBytes(spark, base + ".shp")
    val geoms0 = parseShp(shp, bbox) // Seq[(recordIndex0Based, wkt)]
    val geoms = readPrjTransform(spark, base) match {
      case None => geoms0
      case Some(tx) =>
        geoms0.map { case (i, w) => (i, graft.geo.Crs.transformWkt(w)(tx)) }
    }
    val (fields, dbfRows) = parseDbf(readBytes(spark, base + ".dbf"))
    val rows = geoms.map { case (i, wkt) =>
      require(i < dbfRows.length,
        s"$base: .shp record ${i + 1} has no .dbf row (${dbfRows.length} attrs)")
      Row.fromSeq(dbfRows(i).toSeq :+ wkt)
    }
    val schema = StructType(fields :+ StructField("geometry", StringType))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 5000)),
      schema)
  }

  /** Coordinate transform to 4326 for the `.prj` sidecar if one exists
    * (None = no sidecar or already geographic WGS84); loud failure on an
    * unrecognized or untransformable CRS. Resolution order: a recognized
    * AND kernel-supported EPSG code takes the anchored per-family path;
    * anything else falls through to the generic parametric TM/LCC reader
    * ([[graft.geo.Crs.parametricFromPrj]] — driven by the file's own
    * PARAMETER values); only when BOTH fail does the read refuse.
    */
  private def readPrjTransform(spark: SparkSession,
      base: String): Option[(Double, Double) => (Double, Double)] = {
    val p = new Path(base + ".prj")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val prj = new String(readBytes(spark, base + ".prj"), StandardCharsets.UTF_8)
    graft.geo.Crs.epsgFromPrj(prj) match {
      case Some(graft.geo.Crs.Wgs84) => None
      case Some(epsg) if graft.geo.Crs.isSupported(epsg) =>
        Some((x, y) => graft.geo.Crs.toWgs84(epsg, x, y))
      case detected =>
        graft.geo.Crs.parametricFromPrj(prj) match {
          case Some(par) => Some((x, y) => par.toWgs84(x, y))
          case None =>
            val why = detected
              .map(e => s"EPSG:$e detected but not supported by the CRS kernel")
              .getOrElse("unrecognized (no EPSG code detected)")
            throw new IllegalArgumentException(
              s"$base.prj: unsupported CRS — $why, and the .prj's " +
                "PARAMETERs are not a parametric TM/LCC on a " +
                "WGS84/ETRS-class datum or TOWGS84 bridge; reproject the " +
                s"layer to EPSG:4326 upstream. WKT head:\n${prj.take(400)}")
        }
    }
  }

  /** Shape-type code of a .shp file (1 point, 3 polyline, 5 polygon). */
  def shapeType(spark: SparkSession, base: String): Int = {
    val b = readBytes(spark, base + ".shp")
    ByteBuffer.wrap(b, 32, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
  }

  /** .shp record stream → (0-based index, WKT), bbox-skipped. */
  private def parseShp(bytes: Array[Byte],
      bbox: Option[(Double, Double, Double, Double)]): Seq[(Int, String)] = {
    require(bytes.length >= 100, s".shp too short (${bytes.length} bytes)")
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == 9994, s"not a shapefile (magic ${be.getInt(0)})")
    val fileWords = be.getInt(24)
    val end = math.min(bytes.length.toLong, fileWords.toLong * 2).toInt
    val out = Seq.newBuilder[(Int, String)]
    var pos = 100
    var idx = 0
    while (pos + 8 <= end) {
      val contentWords = be.getInt(pos + 4)
      val le = ByteBuffer.wrap(bytes, pos + 8, contentWords * 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = le.getInt
      val wkt: String = shapeType match {
        case 0 => null // null shape
        case 1 =>
          val x = le.getDouble; val y = le.getDouble
          if (bbox.exists { case (x0, y0, x1, y1) =>
            x < x0 || x > x1 || y < y0 || y > y1 }) null
          else s"POINT ($x $y)"
        case 3 | 5 =>
          val xmin = le.getDouble; val ymin = le.getDouble
          val xmax = le.getDouble; val ymax = le.getDouble
          val skip = bbox.exists { case (x0, y0, x1, y1) =>
            xmax < x0 || xmin > x1 || ymax < y0 || ymin > y1 }
          if (skip) null
          else {
            val nParts = le.getInt; val nPoints = le.getInt
            val parts = Array.fill(nParts)(le.getInt)
            val xs = new Array[Double](nPoints)
            val ys = new Array[Double](nPoints)
            var i = 0
            while (i < nPoints) { xs(i) = le.getDouble; ys(i) = le.getDouble; i += 1 }
            val rings = (0 until nParts).map { p =>
              val lo = parts(p)
              val hi = if (p + 1 < nParts) parts(p + 1) else nPoints
              (lo until hi).map(i => Pt(xs(i), ys(i))).toArray
            }
            if (shapeType == 3) lineWkt(rings) else polygonWkt(rings)
          }
        case t => throw new IllegalArgumentException(
          s"unsupported shape type $t (supported: 0,1,3,5)")
      }
      if (wkt != null) out += ((idx, wkt))
      pos += 8 + contentWords * 2
      idx += 1
    }
    out.result()
  }

  private def ringStr(r: Array[Pt]): String = {
    val closed = if (r.length > 1 && r.head == r.last) r else r :+ r.head
    closed.map(p => s"${p.x} ${p.y}").mkString("(", ", ", ")")
  }

  private def lineWkt(parts: Seq[Array[Pt]]): String = {
    def open(r: Array[Pt]) = r.map(p => s"${p.x} ${p.y}").mkString("(", ", ", ")")
    if (parts.length == 1) "LINESTRING " + open(parts.head)
    else "MULTILINESTRING (" + parts.map(open).mkString(", ") + ")"
  }

  /** SHP ring soup → WKT. Outer = clockwise (signedArea < 0 in math
    * orientation), hole = counter-clockwise; each hole goes to the
    * smallest outer ring containing its first vertex (ESRI spec rule).
    * Degenerate all-CCW files (common in the wild) fall back to treating
    * every ring as an outer.
    */
  private def polygonWkt(rings0: Seq[Array[Pt]]): String = {
    val rings = rings0.filter(_.length >= 3)
      .map(r => if (r.head == r.last) r.dropRight(1) else r).filter(_.length >= 3)
    require(rings.nonEmpty, "polygon record with no valid ring")
    var outers = rings.filter(r => Geometry.signedArea(r) < 0)
    var holes = rings.filterNot(r => Geometry.signedArea(r) < 0)
    if (outers.isEmpty) { outers = rings; holes = Nil }
    val assigned = outers.map(o => (o, Seq.newBuilder[Array[Pt]]))
    holes.foreach { h =>
      val p = h.head
      val candidates = assigned.filter { case (o, _) => Geometry.containsXY(o, p.x, p.y) }
      if (candidates.nonEmpty) {
        candidates.minBy { case (o, _) => math.abs(Geometry.signedArea(o)) }
          ._2 += h
      } // orphan hole: dropped (matches lenient GDAL behavior)
    }
    val polys = assigned.map { case (o, hs) =>
      (o +: hs.result()).map(ringStr).mkString("(", ", ", ")")
    }
    if (polys.length == 1) "POLYGON " + polys.head
    else "MULTIPOLYGON (" + polys.mkString(", ") + ")"
  }

  /** dBASE III: (schema fields, rows). N/F → double (long when 0 decimals
    * and it fits), L → boolean, C/D → trimmed string.
    */
  private def parseDbf(bytes: Array[Byte]): (Seq[StructField], Array[Array[Any]]) = {
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = le.getInt(4)
    val headerSize = le.getShort(8) & 0xffff
    val recordSize = le.getShort(10) & 0xffff
    // field descriptors: 32 bytes each from offset 32 until 0x0D terminator
    case class Fld(name: String, typ: Char, len: Int, dec: Int)
    val flds = Seq.newBuilder[Fld]
    var off = 32
    while (off + 32 <= headerSize && bytes(off) != 0x0d) {
      val name = new String(bytes, off, 11, StandardCharsets.US_ASCII)
        .takeWhile(_ != ' ').trim
      val typ = bytes(off + 11).toChar
      val len = bytes(off + 16) & 0xff
      val dec = bytes(off + 17) & 0xff
      flds += Fld(name, typ, len, dec)
      off += 32
    }
    val fields = flds.result()
    require(headerSize + nRec.toLong * recordSize <= bytes.length + 1,
      s".dbf truncated: $nRec records x $recordSize bytes past EOF (${bytes.length})")
    val schema = fields.map { f =>
      val dt = f.typ match {
        case 'N' | 'F' => if (f.dec == 0 && f.len < 19) LongType else DoubleType
        case 'L' => BooleanType
        case _ => StringType
      }
      StructField(f.name, dt)
    }
    val rows = new Array[Array[Any]](nRec)
    var r = 0
    while (r < nRec) {
      var p = headerSize + r * recordSize
      val deleted = bytes(p) == '*'
      p += 1
      val vals = new Array[Any](fields.length)
      var c = 0
      fields.foreach { f =>
        val s = new String(bytes, p, f.len, StandardCharsets.ISO_8859_1).trim
        vals(c) = f.typ match {
          case 'N' | 'F' =>
            if (s.isEmpty || s == "*") null
            else if (f.dec == 0 && f.len < 19) java.lang.Long.valueOf(s.toDouble.toLong)
            else java.lang.Double.valueOf(s)
          case 'L' =>
            if ("YyTt".contains(s.headOption.getOrElse('?'))) java.lang.Boolean.TRUE
            else if ("NnFf".contains(s.headOption.getOrElse('?'))) java.lang.Boolean.FALSE
            else null
          case _ => if (s.isEmpty) null else s
        }
        p += f.len; c += 1
      }
      rows(r) = if (deleted) null else vals
      r += 1
    }
    // deleted rows stay as positional placeholders (null attrs) so .shp
    // record indices line up; they only surface if the .shp kept the shape
    (schema, rows.map(v => if (v == null) new Array[Any](fields.length) else v))
  }

  // ----------------------------------------------------------------- write

  /** Write (attrs..., wktCol) as `base.shp` + `.shx` + `.dbf`. Geometry
    * type is inferred from the first row (POINT / LINESTRING / POLYGON
    * families; a file mixes only within one family, per the SHP spec).
    * When `epsg` is given, a `.prj` sidecar is written too (the
    * coordinates are assumed to already BE in that CRS — the writer never
    * reprojects).
    */
  def write(df: DataFrame, wktCol: String, base: String,
      epsg: Option[Int] = None): Unit = {
    val cols = df.schema.fields.filter(_.name != wktCol)
    val rows = df.collect() // bounded: dimension layers only, like the reader
    require(rows.length < 1000000, s"refusing to write ${rows.length} records " +
      "as .shp — fact-scale geometry belongs in parquet WKT")
    val wktIdx = df.schema.fieldIndex(wktCol)
    val geoms = rows.map(r => r.getString(wktIdx))
    val shpType =
      if (geoms.forall(w => w == null || w.startsWith("POINT"))) 1
      else if (geoms.forall(w => w == null || w.startsWith("LINESTRING") ||
        w.startsWith("MULTILINESTRING"))) 3
      else 5

    // --- records
    val recs = geoms.map { w =>
      if (w == null) { val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN); b.putInt(0); b.array() }
      else shpType match {
        case 1 =>
          val p = coordsOf(w).head
          val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
          b.putInt(1); b.putDouble(p.x); b.putDouble(p.y); b.array()
        case 3 =>
          val parts = parseLines(w)
          encodeParts(3, parts)
        case _ =>
          val polys = Geometry.parseGeom(w)
          // outer CW, holes CCW per spec
          val rings = polys.flatMap { pl =>
            val o = if (Geometry.signedArea(pl.outer) < 0) pl.outer else pl.outer.reverse
            val hs = pl.holes.map(h => if (Geometry.signedArea(h) > 0) h else h.reverse)
            (o +: hs.toSeq).map(r => r :+ r.head) // SHP rings are closed
          }
          encodeParts(5, rings)
      }
    }

    // --- .shp / .shx
    val pts = geoms.filter(_ != null).flatMap(coordsOf)
    val (bx0, by0, bx1, by1) =
      if (pts.isEmpty) (0.0, 0.0, 0.0, 0.0)
      else (pts.map(_.x).min, pts.map(_.y).min, pts.map(_.x).max, pts.map(_.y).max)
    def header(totalWords: Int): Array[Byte] = {
      val h = ByteBuffer.allocate(100)
      h.order(ByteOrder.BIG_ENDIAN); h.putInt(0, 9994); h.putInt(24, totalWords)
      h.order(ByteOrder.LITTLE_ENDIAN)
      h.putInt(28, 1000); h.putInt(32, shpType)
      h.putDouble(36, bx0); h.putDouble(44, by0); h.putDouble(52, bx1); h.putDouble(60, by1)
      h.array()
    }
    val shp = new ByteArrayOutputStream()
    val shx = new ByteArrayOutputStream()
    var offWords = 50
    val shpBody = new ByteArrayOutputStream()
    val shxBody = new ByteArrayOutputStream()
    recs.zipWithIndex.foreach { case (content, i) =>
      val words = content.length / 2
      val rh = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      rh.putInt(i + 1); rh.putInt(words)
      shpBody.write(rh.array()); shpBody.write(content)
      val xh = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      xh.putInt(offWords); xh.putInt(words)
      shxBody.write(xh.array())
      offWords += 4 + words
    }
    shp.write(header(offWords)); shp.write(shpBody.toByteArray)
    shx.write(header(50 + 4 * recs.length)); shx.write(shxBody.toByteArray)

    // --- .dbf
    val dbf = buildDbf(cols, rows.map(r => cols.map(c => r.get(r.fieldIndex(c.name)))))

    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    def put(path: String, bytes: Array[Byte]): Unit = {
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val os = fs.create(p, true)
      try os.write(bytes) finally os.close()
    }
    put(base + ".shp", shp.toByteArray)
    put(base + ".shx", shx.toByteArray)
    put(base + ".dbf", dbf)
    epsg.foreach { e =>
      put(base + ".prj", graft.geo.Crs.prjWkt(e).getBytes(StandardCharsets.UTF_8))
    }
  }

  /** All coordinates of any WKT (regex scan) — bbox math + point parse. */
  private def coordsOf(w: String): Array[Pt] =
    "[-0-9.eE]+\\s+[-0-9.eE]+".r.findAllIn(w).map { s =>
      val a = s.trim.split("\\s+"); Pt(a(0).toDouble, a(1).toDouble)
    }.toArray

  private def parseLines(w: String): Seq[Array[Pt]] =
    if (w.startsWith("MULTILINESTRING"))
      "\\(([^()]+)\\)".r.findAllMatchIn(w).map(m => ptsOf(m.group(1))).toSeq
    else Seq(ptsOf(w.substring(w.indexOf('(') + 1, w.lastIndexOf(')'))))

  private def ptsOf(body: String): Array[Pt] =
    body.split(",").map { s =>
      val a = s.trim.split("\\s+"); Pt(a(0).toDouble, a(1).toDouble)
    }

  private def encodeParts(typ: Int, rings: Seq[Array[Pt]]): Array[Byte] = {
    val nPoints = rings.map(_.length).sum
    val b = ByteBuffer.allocate(4 + 32 + 8 + 4 * rings.length + 16 * nPoints)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(typ)
    val all = rings.flatten
    b.putDouble(all.map(_.x).min); b.putDouble(all.map(_.y).min)
    b.putDouble(all.map(_.x).max); b.putDouble(all.map(_.y).max)
    b.putInt(rings.length); b.putInt(nPoints)
    var acc = 0
    rings.foreach { r => b.putInt(acc); acc += r.length }
    rings.foreach(_.foreach { p => b.putDouble(p.x); b.putDouble(p.y) })
    b.array()
  }

  private def buildDbf(cols: Array[StructField], rows: Array[Array[Any]]): Array[Byte] = {
    case class Fld(name: String, typ: Char, len: Int, dec: Int)
    // DBF names are <=10 chars: dedupe positionally after truncation (same
    // rule as EuCsv/ExcelTable headers) so two long names can't collide
    val seen = scala.collection.mutable.Map.empty[String, Int]
    def dbfName(n: String): String = {
      val base = n.take(10)
      val k = seen.getOrElse(base, 0); seen(base) = k + 1
      if (k == 0) base else (base.take(10 - (k.toString.length + 1)) + "_" + k)
    }
    val flds = cols.map { c =>
      c.dataType match {
        case LongType | IntegerType | ShortType => Fld(dbfName(c.name), 'N', 18, 0)
        case DoubleType | FloatType => Fld(dbfName(c.name), 'N', 19, 6)
        case BooleanType => Fld(dbfName(c.name), 'L', 1, 0)
        case _ => Fld(dbfName(c.name), 'C', 64, 0)
      }
    }
    val recordSize = 1 + flds.map(_.len).sum
    val headerSize = 32 + 32 * flds.length + 1
    val out = ByteBuffer.allocate(headerSize + recordSize * rows.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x03.toByte); out.put(126.toByte); out.put(1.toByte); out.put(1.toByte)
    out.putInt(rows.length)
    out.putShort(headerSize.toShort); out.putShort(recordSize.toShort)
    out.position(32)
    flds.foreach { f =>
      val name = f.name.getBytes(StandardCharsets.US_ASCII).take(10)
      out.put(java.util.Arrays.copyOf(name, 11))
      out.put(f.typ.toByte)
      out.position(out.position() + 4)
      out.put(f.len.toByte); out.put(f.dec.toByte)
      out.position(out.position() + 14)
    }
    out.put(0x0d.toByte)
    def pad(s: String, n: Int, right: Boolean, numeric: Boolean): Array[Byte] = {
      require(!(numeric && s.length > n),
        s"numeric value '$s' exceeds DBF field width $n — refusing silent truncation")
      val t = if (s.length > n) s.take(n) else s // text: truncate like dBASE
      val sp = " " * (n - t.length)
      ((if (right) sp + t else t + sp)).getBytes(StandardCharsets.ISO_8859_1)
    }
    rows.foreach { r =>
      out.put(' '.toByte)
      flds.zip(r).foreach { case (f, v) =>
        val s = (f.typ, v) match {
          case (_, null) => ""
          case ('N', x: java.lang.Number) if f.dec == 0 => x.longValue().toString
          case ('N', x: java.lang.Number) =>
            String.format(java.util.Locale.ROOT, s"%.${f.dec}f", Double.box(x.doubleValue()))
          case ('L', b: java.lang.Boolean) => if (b) "T" else "F"
          case (_, x) => x.toString
        }
        out.put(pad(s, f.len, right = f.typ == 'N', numeric = f.typ == 'N'))
      }
    }
    out.put(0x1a.toByte)
    java.util.Arrays.copyOf(out.array(), out.position())
  }

  private def readBytes(spark: SparkSession, path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    require(st.isFile, s"$path: not a plain file")
    require(st.getLen <= MaxBytes,
      s"$path: ${st.getLen} bytes exceeds the ${MaxBytes >> 20} MB driver-side " +
        "limit for dimension layers; ingest large geometry as parquet WKT")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](st.getLen.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }
}
