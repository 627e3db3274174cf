package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S3/S10: real XLSX scan + multi-sheet workbook sink, pure JDK
  * (java.util.zip + StAX) — no external codec dependency. An .xlsx file is
  * a zip of XML parts; the reader resolves workbook.xml → rels →
  * worksheet part + sharedStrings, the writer emits inline-string /
  * numeric cells, [Content_Types], rels and workbook parts.
  *
  * Reference behavior reproduced: `pd.read_excel(..., skiprows=…,
  * usecols=…, sheet_name=…)` (code/lib/correction_functions.py:36,77,235,
  * 279) — header offset, column slice, sheet select. [[read]] keeps the
  * original all-string contract (cast downstream, same as EuCsv);
  * [[readTyped]] adds pd.read_excel's cell-type + number-format-style
  * inference, so numerics/booleans/date-styled cells arrive typed.
  *
  * Scale posture: config workbooks are single small driver-side files
  * (same documented class as EuCsv header-offset reads); both read and
  * write go through the Hadoop FileSystem API so hdfs/s3a paths work. The
  * reader REFUSES anything but one plain file. Large tabular data belongs
  * in parquet/CSV, not XLSX.
  */
object ExcelTable {

  // ------------------------------------------------------------------ read

  /** Read one sheet into a string-typed DataFrame. Date-STYLED numeric
    * cells (same styles.xml detection as [[readTyped]]) render as the
    * timestamp's string form, not the raw Excel serial — so a
    * write→read round trip of a date column returns
    * "2020-01-01 12:00:00.0", never "43831.5".
    * @param sheet     sheet name; null → first sheet
    * @param headerRow 0-based index of the header row (rows above skipped —
    *                  pandas `skiprows`/`header`)
    * @param usecols   optional 0-based inclusive column slice (pandas
    *                  `usecols="C:F"` equivalent)
    */
  def read(spark: SparkSession, path: String, sheet: String = null,
      headerRow: Int = 0, usecols: Option[(Int, Int)] = None): DataFrame = {
    val (names, data, parts) = loadSheet(spark, path, sheet, headerRow, usecols)
    val dateStyles = parts.get("xl/styles.xml").map(parseDateStyles)
      .getOrElse(Set.empty[Int])
    def render(c: Cell): String = c.t match {
      case "s" | "inlineStr" | "str" | "b" | "e" => c.raw
      case _ if dateStyles(c.style) =>
        serialToTimestamp(c.raw.trim.toDouble).toString
      case _ => c.raw
    }
    val schema = StructType(names.map(n => StructField(n, StringType)).toSeq)
    val rows = data.map(r =>
      Row.fromSeq(r.map(c => if (c == null) null else render(c)).toSeq))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  /** Shared sheet resolution for [[read]]/[[readTyped]]: zip → workbook →
    * rels → worksheet grid, header slice, positional name dedup (same rule
    * as EuCsv.readMultiHeader). Returns (column names, sliced DATA rows as
    * cells, all zip parts — for styles lookup).
    */
  private def loadSheet(spark: SparkSession, path: String, sheet: String,
      headerRow: Int, usecols: Option[(Int, Int)])
      : (Array[String], Array[Array[Cell]], Map[String, Array[Byte]]) = {
    val parts = readZip(spark, path)
    def part(name: String): Array[Byte] = parts.getOrElse(name,
      throw new IllegalArgumentException(s"$path: missing workbook part $name"))

    // workbook.xml: ordered (sheetName, relId)
    val sheets = parseSheets(part("xl/workbook.xml"))
    require(sheets.nonEmpty, s"$path: workbook has no sheets")
    val (_, relId) =
      if (sheet == null) sheets.head
      else sheets.find(_._1 == sheet).getOrElse(throw new IllegalArgumentException(
        s"$path: no sheet '$sheet' (have ${sheets.map(_._1).mkString(", ")})"))

    // rels: relId -> worksheet part path (targets are workbook-relative)
    val rels = parseRels(part("xl/_rels/workbook.xml.rels"))
    val target = rels.getOrElse(relId, throw new IllegalArgumentException(
      s"$path: unresolved sheet relationship $relId"))
    val sheetPart = if (target.startsWith("/")) target.drop(1) else "xl/" + target

    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings)
      .getOrElse(Array.empty[String])
    val grid = parseGrid(part(sheetPart), shared)

    require(grid.length > headerRow, s"$path: sheet has ${grid.length} rows, " +
      s"header row $headerRow out of range")
    val width = grid.map(_.length).max
    val (lo, hi) = usecols.getOrElse((0, width - 1))
    def slice(r: Array[Cell]): Array[Cell] =
      (lo to hi).map(i => if (i < r.length) r(i) else null).toArray

    val header = slice(grid(headerRow)).map(c => if (c == null) null else c.raw)
    val names0 = header.zipWithIndex.map { case (h, i) =>
      if (h == null || h.trim.isEmpty) s"_c${i + lo}" else h.trim
    }
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val names = names0.map { n =>
      val k = seen.getOrElse(n, 0); seen(n) = k + 1
      if (k == 0) n else s"${n}_$k"
    }
    (names, grid.drop(headerRow + 1).map(slice), parts)
  }

  /** Sheet names in workbook order (pd.ExcelFile(...).sheet_names). */
  def sheetNames(spark: SparkSession, path: String): Seq[String] =
    parseSheets(readZip(spark, path)("xl/workbook.xml")).map(_._1)

  // ----------------------------------------------------------- typed read

  /** Read one sheet with pd.read_excel-like TYPE INFERENCE: numeric cells
    * arrive as long/double, boolean cells as boolean, and number-format
    * styles tagged as dates (builtin 14–22/45–47 or a custom y/m/d/h/s
    * format code from styles.xml) convert from Excel serial days to
    * timestamps. A column takes the narrowest type covering every
    * non-null data cell; mixed columns fall back to string — exactly the
    * per-column inference pd.read_excel performs. Same driver-side small-
    * workbook contract as [[read]] (which stays the all-string variant).
    */
  def readTyped(spark: SparkSession, path: String, sheet: String = null,
      headerRow: Int = 0, usecols: Option[(Int, Int)] = None): DataFrame = {
    val (names, cells, parts) = loadSheet(spark, path, sheet, headerRow, usecols)
    val dateStyles = parts.get("xl/styles.xml").map(parseDateStyles)
      .getOrElse(Set.empty[Int])

    def interpret(c: Cell): Any =
      if (c == null) null
      else c.t match {
        case "s" | "inlineStr" | "str" => c.raw
        case "b" => c.raw.trim == "1"
        case "e" => null // error cell → null, like pandas NaN
        case _ => // numeric
          val d = c.raw.trim.toDouble
          if (dateStyles(c.style)) serialToTimestamp(d) else Double.box(d)
      }

    val data = cells.map(_.map(interpret))

    // per-column type: narrowest covering all non-null cells
    import org.apache.spark.sql.types._
    val colTypes: Array[DataType] = names.indices.map { i =>
      val vs = data.iterator.map(r => r(i)).filter(_ != null).toSeq
      if (vs.isEmpty) StringType
      else if (vs.forall(_.isInstanceOf[java.sql.Timestamp])) TimestampType
      else if (vs.forall(_.isInstanceOf[java.lang.Boolean])) BooleanType
      else if (vs.forall(_.isInstanceOf[java.lang.Double])) {
        val ds = vs.map(_.asInstanceOf[java.lang.Double].doubleValue())
        if (ds.forall(d => d == math.rint(d) && math.abs(d) < 9.2e18)) LongType
        else DoubleType
      } else StringType
    }.toArray
    def coerce(v: Any, dt: DataType): Any = (v, dt) match {
      case (null, _) => null
      case (d: java.lang.Double, LongType) => Long.box(d.longValue())
      case (v, StringType) => v match {
        case d: java.lang.Double =>
          if (d.doubleValue() == math.rint(d.doubleValue()) &&
            math.abs(d.doubleValue()) < 9.2e18) d.longValue().toString
          else d.toString
        case other => other.toString
      }
      case (v, _) => v
    }
    val schema = StructType(names.zip(colTypes).map { case (n, t) => StructField(n, t) }.toSeq)
    val rows = data.map(r => Row.fromSeq(
      r.zip(colTypes).map { case (v, t) => coerce(v, t) }.toSeq))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  /** Excel serial day (1899-12-30 epoch) → timestamp, ms precision.
    * Excel serials are NAIVE wall-clock datetimes (like pandas' datetime64
    * result), so the conversion goes through LocalDateTime — the value is
    * the same on any JVM default timezone, not a fixed UTC instant.
    */
  private val SerialEpoch = java.time.LocalDateTime.of(1899, 12, 30, 0, 0)

  private def serialToTimestamp(serial: Double): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      SerialEpoch.plus(math.round(serial * 86400000.0),
        java.time.temporal.ChronoUnit.MILLIS))

  /** styles.xml → the cellXf indices whose number format renders a date:
    * builtin ids 14–22 (dates/times) and 45–47 (durations …mm:ss…), or a
    * custom formatCode containing y/m/d/h/s pattern letters outside
    * quoted literals and [] sections.
    */
  private def parseDateStyles(bytes: Array[Byte]): Set[Int] = {
    val r = xmlReader(bytes)
    val custom = Map.newBuilder[Int, String]
    val xfIds = Seq.newBuilder[Int]
    var inCellXfs = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            var id = -1; var code = ""
            for (i <- 0 until r.getAttributeCount) r.getAttributeLocalName(i) match {
              case "numFmtId" => id = r.getAttributeValue(i).trim.toInt
              case "formatCode" => code = r.getAttributeValue(i)
              case _ =>
            }
            if (id >= 0) custom += id -> code
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            var id = 0
            for (i <- 0 until r.getAttributeCount)
              if (r.getAttributeLocalName(i) == "numFmtId")
                id = r.getAttributeValue(i).trim.toInt
            xfIds += id
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
    }
    r.close()
    val customMap = custom.result()
    def isDateFmt(id: Int): Boolean =
      (id >= 14 && id <= 22) || (id >= 45 && id <= 47) ||
        customMap.get(id).exists { code =>
          val bare = code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
          bare.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
        }
    xfIds.result().zipWithIndex.collect { case (fmtId, xf) if isDateFmt(fmtId) => xf }.toSet
  }

  /** Load all zip entries of a SINGLE small workbook file via Hadoop FS. */
  private def readZip(spark: SparkSession, path: String): Map[String, Array[Byte]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val status = fs.globStatus(p)
    require(status != null && status.length == 1 && status(0).isFile,
      s"ExcelTable.read requires exactly one workbook file; '$path' matched " +
        s"${if (status == null) 0 else status.length}")
    val in = new ZipInputStream(fs.open(status(0).getPath))
    try {
      val out = Map.newBuilder[String, Array[Byte]]
      var e: ZipEntry = in.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out += e.getName -> in.readAllBytes()
        e = in.getNextEntry
      }
      out.result()
    } finally in.close()
  }

  private def xmlReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** workbook.xml → ordered (name, r:id) per <sheet>. */
  private def parseSheets(bytes: Array[Byte]): Seq[(String, String)] = {
    val r = xmlReader(bytes)
    val out = Seq.newBuilder[(String, String)]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        var name: String = null; var rid: String = null
        for (i <- 0 until r.getAttributeCount) {
          r.getAttributeLocalName(i) match {
            case "name" => name = r.getAttributeValue(i)
            case "id"   => rid = r.getAttributeValue(i) // r:id
            case _ =>
          }
        }
        if (name != null && rid != null) out += name -> rid
      }
    }
    r.close()
    out.result()
  }

  /** workbook.xml.rels → Id → Target. */
  private def parseRels(bytes: Array[Byte]): Map[String, String] = {
    val r = xmlReader(bytes)
    val out = Map.newBuilder[String, String]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
        var id: String = null; var tgt: String = null
        for (i <- 0 until r.getAttributeCount) {
          r.getAttributeLocalName(i) match {
            case "Id" => id = r.getAttributeValue(i)
            case "Target" => tgt = r.getAttributeValue(i)
            case _ =>
          }
        }
        if (id != null && tgt != null) out += id -> tgt
      }
    }
    r.close()
    out.result()
  }

  /** sharedStrings.xml → one string per <si> (rich-text runs concatenated). */
  private def parseSharedStrings(bytes: Array[Byte]): Array[String] = {
    val r = xmlReader(bytes)
    val out = Array.newBuilder[String]
    val sb = new StringBuilder
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => sb.clear()
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += sb.toString
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** One parsed cell before interpretation: OOXML type attr, style index,
    * raw text (shared strings already resolved).
    */
  private final case class Cell(t: String, style: Int, raw: String)

  /** worksheet sheetData → dense row-major cell grid (sparse cells null).
    * Cell types: t="s" shared string (resolved here), t="inlineStr"
    * (<is><t>), t="str" (formula string result), t="b"/default numeric →
    * raw <v> text; the s= style index rides along for date detection.
    */
  private def parseGrid(bytes: Array[Byte], shared: Array[String]): Array[Array[Cell]] = {
    val r = xmlReader(bytes)
    val rows = Array.newBuilder[Array[Cell]]
    var cur: scala.collection.mutable.ArrayBuffer[Cell] = null
    var colIdx = -1   // 0-based column of the current cell
    var cellType = "" // t attribute
    var style = 0     // s attribute
    var inV = false; var inIsT = false
    val text = new StringBuilder
    def endCell(): Unit = {
      if (colIdx >= 0) {
        while (cur.length <= colIdx) cur += null
        val raw = text.toString
        cur(colIdx) =
          if (raw.isEmpty) null
          else cellType match {
            case "s" => Cell("s", style, shared(raw.trim.toInt))
            case t => Cell(t, style, raw)
          }
      }
      colIdx = -1; cellType = ""; style = 0; text.clear()
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cur = scala.collection.mutable.ArrayBuffer.empty[Cell]
            case "c" =>
              var ref: String = null; cellType = ""; style = 0
              for (i <- 0 until r.getAttributeCount) {
                r.getAttributeLocalName(i) match {
                  case "r" => ref = r.getAttributeValue(i)
                  case "t" => cellType = r.getAttributeValue(i)
                  case "s" => style = r.getAttributeValue(i).trim.toInt
                  case _ =>
                }
              }
              colIdx = if (ref != null) colOf(ref) else cur.length
              text.clear()
            case "v" => inV = true
            case "t" => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" => endCell()
            case "row" => rows += cur.toArray; cur = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }


  /** "BC12" → 0-based column index (A=0, Z=25, AA=26…). */
  private def colOf(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  // ----------------------------------------------------------------- write

  /** S10: multi-sheet workbook sink — one real .xlsx with one sheet per
    * (name, df), string columns as inline-string cells, numeric columns as
    * numeric cells. Sheets are collected on the driver: model-export
    * workbooks are the reference's small output files
    * (code/lib/generate_models.py:200-238 writes the same via xlsxwriter);
    * big relations stay in parquet/CSV sinks.
    */
  def write(spark: SparkSession, path: String, sheets: Seq[(String, DataFrame)]): Unit = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new ZipOutputStream(fs.create(p, true))
    def entry(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    try {
      val n = sheets.length
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
          (1 to n).map(i =>
            s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
            .mkString + "</Types>")
      // style 0 = general, style 1 = builtin date format 14 (m/d/yyyy):
      // date/timestamp columns write serials tagged s="1", so readTyped
      // (and pd.read_excel) round-trip them as datetimes
      entry("xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
          """<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>""" +
          """<borders count="1"><border/></borders>""" +
          """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
          """<cellXfs count="2"><xf numFmtId="0"/>""" +
          """<xf numFmtId="14" applyNumberFormat="1"/></cellXfs>""" +
          "</styleSheet>")
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          "</Relationships>")
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
          sheets.zipWithIndex.map { case ((name, _), i) =>
            s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString + "</sheets></workbook>")
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          (1 to n).map(i =>
            s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
            .mkString +
          s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
          "</Relationships>")
      for (((_, df), i) <- sheets.zipWithIndex)
        entry(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df))
    } finally out.close()
  }

  private def sheetXml(df: DataFrame): String = {
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
    val kinds = df.schema.fields.map(_.dataType match {
      case _: NumericType => 'n'
      case TimestampType | DateType => 'd'
      case _ => 's'
    })
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def strCell(v: String): String =
      if (v == null) "" else s"""<c t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
    def numCell(v: Any): String =
      if (v == null) "" else s"<c><v>$v</v></c>"
    def dateCell(v: Any): String = {
      // wall-clock (naive) serial — the exact inverse of serialToTimestamp,
      // timezone-independent
      val ldt = v match {
        case t: java.sql.Timestamp => t.toLocalDateTime
        case d: java.sql.Date => d.toLocalDate.atStartOfDay
        case other => throw new IllegalArgumentException(
          s"date column holds ${other.getClass}")
      }
      val millis = java.time.temporal.ChronoUnit.MILLIS.between(
        java.time.LocalDateTime.of(1899, 12, 30, 0, 0), ldt)
      val serial = millis / 86400000.0
      s"""<c s="1"><v>$serial</v></c>"""
    }
    sb.append("<row>").append(df.columns.map(strCell).mkString).append("</row>")
    for (row <- df.collect()) {
      sb.append("<row>")
      for (i <- kinds.indices) {
        val v = row.get(i)
        sb.append(
          if (v == null) "<c/>"
          else kinds(i) match {
            case 'n' => numCell(v)
            case 'd' => dateCell(v)
            case _ => strCell(v.toString)
          })
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")
}
