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
  * 279) — header offset, column slice, sheet select; all columns
  * string-typed on scan (cast downstream, same contract as EuCsv).
  *
  * Scale posture: config workbooks are single small driver-side files
  * (same documented class as EuCsv header-offset reads); both read and
  * write go through the Hadoop FileSystem API so hdfs/s3a paths work. The
  * reader REFUSES anything but one plain file. Large tabular data belongs
  * in parquet/CSV, not XLSX.
  */
object ExcelTable {

  // ------------------------------------------------------------------ read

  /** Read one sheet into a string-typed DataFrame.
    * @param sheet     sheet name; null → first sheet
    * @param headerRow 0-based index of the header row (rows above skipped —
    *                  pandas `skiprows`/`header`)
    * @param usecols   optional 0-based inclusive column slice (pandas
    *                  `usecols="C:F"` equivalent)
    */
  def read(spark: SparkSession, path: String, sheet: String = null,
      headerRow: Int = 0, usecols: Option[(Int, Int)] = None): DataFrame = {
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
    val grid = parseSheetCells(part(sheetPart), shared)

    require(grid.length > headerRow, s"$path: sheet has ${grid.length} rows, " +
      s"header row $headerRow out of range")
    val width = grid.map(_.length).max
    val (lo, hi) = usecols.getOrElse((0, width - 1))
    def slice(r: Array[String]): Array[String] =
      (lo to hi).map(i => if (i < r.length) r(i) else null).toArray

    val header = slice(grid(headerRow))
    val names0 = header.zipWithIndex.map { case (h, i) =>
      if (h == null || h.trim.isEmpty) s"_c${i + lo}" else h.trim
    }
    // dedupe colliding names positionally (same rule as EuCsv.readMultiHeader)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val names = names0.map { n =>
      val k = seen.getOrElse(n, 0); seen(n) = k + 1
      if (k == 0) n else s"${n}_$k"
    }
    val schema = StructType(names.map(n => StructField(n, StringType)).toSeq)
    val rows = grid.drop(headerRow + 1).map(r => Row.fromSeq(slice(r).toSeq))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  /** Sheet names in workbook order (pd.ExcelFile(...).sheet_names). */
  def sheetNames(spark: SparkSession, path: String): Seq[String] =
    parseSheets(readZip(spark, path)("xl/workbook.xml")).map(_._1)

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

  /** worksheet sheetData → dense row-major string grid (sparse cells null).
    * Cell types: t="s" shared string, t="inlineStr" (<is><t>), t="str"
    * (formula string result), t="b"/default numeric → raw <v> text.
    */
  private def parseSheetCells(bytes: Array[Byte], shared: Array[String]): Array[Array[String]] = {
    val r = xmlReader(bytes)
    val rows = Array.newBuilder[Array[String]]
    var cur: scala.collection.mutable.ArrayBuffer[String] = null
    var colIdx = -1   // 0-based column of the current cell
    var cellType = "" // t attribute
    var inV = false; var inIsT = false
    val text = new StringBuilder
    def endCell(): Unit = {
      if (colIdx >= 0) {
        while (cur.length <= colIdx) cur += null
        val raw = text.toString
        cur(colIdx) =
          if (raw.isEmpty) null
          else cellType match {
            case "s" => shared(raw.trim.toInt)
            case _ => raw
          }
      }
      colIdx = -1; cellType = ""; text.clear()
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cur = scala.collection.mutable.ArrayBuffer.empty[String]
            case "c" =>
              var ref: String = null; cellType = ""
              for (i <- 0 until r.getAttributeCount) {
                r.getAttributeLocalName(i) match {
                  case "r" => ref = r.getAttributeValue(i)
                  case "t" => cellType = r.getAttributeValue(i)
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
          (1 to n).map(i =>
            s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
            .mkString + "</Types>")
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
            .mkString + "</Relationships>")
      for (((_, df), i) <- sheets.zipWithIndex)
        entry(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df))
    } finally out.close()
  }

  private def sheetXml(df: DataFrame): String = {
    val numeric = df.schema.fields.map(_.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    })
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def strCell(v: String): String =
      if (v == null) "" else s"""<c t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
    def numCell(v: Any): String =
      if (v == null) "" else s"<c><v>$v</v></c>"
    sb.append("<row>").append(df.columns.map(strCell).mkString).append("</row>")
    for (row <- df.collect()) {
      sb.append("<row>")
      for (i <- numeric.indices) {
        val v = row.get(i)
        sb.append(
          if (v == null) "<c/>"
          else if (numeric(i)) numCell(v)
          else strCell(v.toString))
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
