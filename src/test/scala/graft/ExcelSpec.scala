package graft

import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ExcelTable

/** S3 (real XLSX scan) + S10 (real multi-sheet XLSX sink). The foreign-file
  * test builds an .xlsx by hand with SHARED strings, sparse cells and a
  * header offset — the layout pandas/xlsxwriter produce — so the reader is
  * proven against files our own writer did not create.
  */
class ExcelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("write + read round-trip: two sheets, numeric and string cells, nulls") {
    val path = java.nio.file.Files.createTempDirectory("xlsx").toString + "/book.xlsx"
    val plants = Seq(("ST", "DE", 120.5), ("WT", "FR", 33.25), (null, "ES", 0.0))
      .toDF("type", "country", "cap_mw")
    val years = Seq((2015, "a&b <c>"), (2016, "päivä"))
      .toDF("year", "note")
    ExcelTable.write(spark, path, Seq("plants" -> plants, "years" -> years))

    assert(ExcelTable.sheetNames(spark, path) == Seq("plants", "years"))
    val p = ExcelTable.read(spark, path, sheet = "plants")
    assert(p.columns.toSeq == Seq("type", "country", "cap_mw"))
    val rows = p.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(("ST", "DE", "120.5"), ("WT", "FR", "33.25"), (null, "ES", "0.0")))
    val y = ExcelTable.read(spark, path, sheet = "years")
    val yr = y.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(yr == Set(("2015", "a&b <c>"), ("2016", "päivä")), "XML escaping + UTF-8 survive")
  }

  test("readTyped: date-styled, numeric, boolean cells round-trip typed") {
    import org.apache.spark.sql.types._
    val path = java.nio.file.Files.createTempDirectory("xlsx").toString + "/typed.xlsx"
    val ts1 = java.sql.Timestamp.valueOf("2015-06-01 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2016-12-31 18:30:00")
    val df = Seq(
      ("ST", 2015L, 120.5, ts1),
      ("WT", 2016L, 33.25, ts2))
      .toDF("type", "year", "cap_mw", "commissioned")
    ExcelTable.write(spark, path, Seq("plants" -> df))

    val typed = ExcelTable.readTyped(spark, path)
    assert(typed.schema.fields.map(f => (f.name, f.dataType)).toSeq == Seq(
      ("type", StringType), ("year", LongType), ("cap_mw", DoubleType),
      ("commissioned", TimestampType)),
      typed.schema.treeString)
    val got = typed.orderBy("year").collect()
    assert(got(0).getString(0) == "ST" && got(0).getLong(1) == 2015L &&
      got(0).getDouble(2) == 120.5 && got(0).getTimestamp(3) == ts1)
    assert(got(1).getTimestamp(3) == ts2, s"got ${got(1).getTimestamp(3)}")
    // the all-string read contract on the same file: numerics stay raw
    // text, but date-STYLED cells render as the timestamp's string form —
    // a write→read round trip of a date column must never surface the
    // bare Excel serial ("42156.0")
    val raw = ExcelTable.read(spark, path)
    assert(raw.schema.fields.forall(_.dataType == StringType))
    val rawRows = raw.orderBy("year").collect()
    assert(rawRows(0).getString(1) == "2015")
    assert(rawRows(0).getString(3) == ts1.toString,
      s"date column must read back as '${ts1.toString}', got '${rawRows(0).getString(3)}'")
    assert(rawRows(1).getString(3) == ts2.toString, rawRows(1).getString(3))
  }

  test("readTyped: mixed columns fall back to string, customs formats detected") {
    // hand-built sheet: col A mixes text and number -> string;
    // col B numeric with CUSTOM date format -> timestamp
    val path = java.nio.file.Files.createTempDirectory("xlsx").toString + "/mixed.xlsx"
    val out = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name)); out.write(content.getBytes("UTF-8")); out.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
    entry("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    entry("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><numFmts count="1"><numFmt numFmtId="164" formatCode="dd/mm/yyyy hh:mm"/></numFmts><cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="164"/></cellXfs></styleSheet>""")
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row><c t="inlineStr"><is><t>a</t></is></c><c t="inlineStr"><is><t>b</t></is></c></row>""" +
        """<row><c t="inlineStr"><is><t>text</t></is></c><c s="1"><v>42156</v></c></row>""" +
        """<row><c><v>7</v></c><c s="1"><v>42156.5</v></c></row>""" +
        "</sheetData></worksheet>")
    out.close()
    val typed = ExcelTable.readTyped(spark, path)
    import org.apache.spark.sql.types._
    assert(typed.schema("a").dataType == StringType)
    assert(typed.schema("b").dataType == TimestampType)
    val vs = typed.orderBy("b").collect()
    assert(vs(0).getString(0) == "text")
    assert(vs(0).getTimestamp(1) == java.sql.Timestamp.valueOf("2015-06-01 00:00:00"))
    assert(vs(1).getString(0) == "7") // mixed column -> integral double as "7"
    assert(vs(1).getTimestamp(1) == java.sql.Timestamp.valueOf("2015-06-01 12:00:00"))
  }

  test("foreign xlsx: shared strings, sparse cells, header offset, usecols") {
    // hand-built workbook mimicking pandas/xlsxwriter output: a title row
    // above the header (→ headerRow=1), shared-string cells, a skipped cell
    // (C3 absent), and an extra leading column to slice away.
    val path = java.nio.file.Files.createTempDirectory("xlsx").toString + "/foreign.xlsx"
    val out = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name)); out.write(content.getBytes("UTF-8")); out.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>""")
    entry("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="ENTSO-E" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4"><si><t>Country</t></si><si><t>Load</t></si><si><r><t>D</t></r><r><t>E</t></r></si><si><t>FR</t></si></sst>""")
    // row1: title (ignored); row2: header (junk, Country, Load);
    // row3: DE with C3 MISSING (sparse); row4: FR, 450.5
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>Hourly load 2015</t></is></c></row>""" +
        """<row r="2"><c r="A2" t="inlineStr"><is><t>junk</t></is></c><c r="B2" t="s"><v>0</v></c><c r="C2" t="s"><v>1</v></c></row>""" +
        """<row r="3"><c r="A3"><v>1</v></c><c r="B3" t="s"><v>2</v></c></row>""" +
        """<row r="4"><c r="A4"><v>2</v></c><c r="B4" t="s"><v>3</v></c><c r="C4"><v>450.5</v></c></row>""" +
        """</sheetData></worksheet>""")
    out.close()

    val df = ExcelTable.read(spark, path, sheet = "ENTSO-E",
      headerRow = 1, usecols = Some((1, 2)))
    assert(df.columns.toSeq == Seq("Country", "Load"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("DE", null), ("FR", "450.5")),
      "rich-text shared string concatenated; sparse cell null; usecols slice")
  }

  test("reader refuses globs matching multiple files") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx").toString
    val d1 = Seq((1, "a")).toDF("k", "v")
    ExcelTable.write(spark, s"$dir/a.xlsx", Seq("s" -> d1))
    ExcelTable.write(spark, s"$dir/b.xlsx", Seq("s" -> d1))
    val e = intercept[IllegalArgumentException] {
      ExcelTable.read(spark, s"$dir/*.xlsx")
    }
    assert(e.getMessage.contains("exactly one workbook"))
  }
}
