package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns
import graft.sources.Warc

class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pages = Seq(
    ("<urn:graft:1>", "http://a.example.com/x", "2026-08-15T00:00:00Z",
      "text/html; charset=utf-8", 200,
      "<html><body><p>hello ünï😀 world</p></body></html>"),
    ("<urn:graft:2>", "http://b.example.com/y", "2026-08-15T00:00:01Z",
      "text/plain", 404, "not here\r\nWARC/1.0\r\nlooks like a record"),
    ("<urn:graft:3>", "http://c.example.com/z", "2026-08-15T00:00:02Z",
      "text/html; charset=utf-8", 200, ""))
    .toDF("record_id", "target_uri", "warc_date",
      "http_content_type", "http_status", "body")

  test("WARC write -> read round trip is value-exact, plain and gzip, " +
      "and payload bytes that LOOK like a record header cannot desync") {
    for (gz <- Seq(false, true)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_warc_$gz").toString
      Warc.write(pages.repartition(2), dir, gzip = gz)
      val back = Warc.read(spark, dir)
        .select("record_id", "target_uri", "warc_date",
          "http_status", "http_content_type", "body")
        .collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
          r.getInt(3), r.getString(4), r.getString(5)))).toMap
      assert(back.keySet == Set("<urn:graft:1>", "<urn:graft:2>", "<urn:graft:3>"))
      assert(back("<urn:graft:1>") == (("http://a.example.com/x",
        "2026-08-15T00:00:00Z", 200, "text/html; charset=utf-8",
        "<html><body><p>hello ünï😀 world</p></body></html>")))
      // Content-Length framing: the embedded "WARC/1.0" survives as body
      assert(back("<urn:graft:2>")._5.contains("WARC/1.0"))
      assert(back("<urn:graft:2>")._3 == 404)
      assert(back("<urn:graft:3>")._5 == "")
    }
  }

  test("type pruning and warcinfo records") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_t").toString
    Warc.write(pages.repartition(1), dir)
    val all = Warc.read(spark, dir, types = Set.empty)
    assert(all.filter(col("warc_type") === "warcinfo").count() == 1)
    assert(all.filter(col("warc_type") === "response").count() == 3)
    // default read prunes to responses at the parse
    assert(Warc.read(spark, dir).count() == 3)
  }

  test("malformed WARC fails loudly; permissive keeps the parsed prefix") {
    val base = java.nio.file.Files.createTempDirectory("graft_warc_bad")
    val good = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:x:1>\r\nWARC-Target-URI: http://x/\r\n" +
      "WARC-Date: 2026-08-15T00:00:00Z\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      "Content-Length: 43\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhello" +
      "\r\n\r\n"
    java.nio.file.Files.writeString(base.resolve("part-00000.warc"),
      good + "GARBAGE NOT A RECORD")
    val e = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, base.toString).collect()
    }
    assert(e.getMessage.contains("malformed WARC") ||
      Option(e.getCause).exists(_.getMessage.contains("malformed WARC")))
    val kept = Warc.read(spark, base.toString, permissive = true).collect()
    assert(kept.length == 1 && kept(0).getAs[String]("body") == "hello")
    // the HTTP body is bounded by WARC framing, not the HTTP header:
    // Content-Length: 2 lies (the 48-byte payload has 10 body bytes, but
    // a short HTTP claim must not truncate what the WARC length frames)
    val lying = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:x:2>\r\nWARC-Target-URI: http://y/\r\n" +
      "WARC-Date: 2026-08-15T00:00:00Z\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      "Content-Length: 48\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\ntruncated!" +
      "\r\n\r\n"
    val base2 = java.nio.file.Files.createTempDirectory("graft_warc_lie")
    java.nio.file.Files.writeString(base2.resolve("part-00000.warc"), lying)
    val r = Warc.read(spark, base2.toString).collect()
    assert(r.length == 1 && r(0).getAs[String]("body") == "truncated!")
  }

  test("htmlToText / htmlLinks / htmlTitle extraction chain") {
    val html =
      "<html><head><title>My  Page</title>" +
        "<script>var x = \"<p>not text</p>\";</script>" +
        "<style>p { color: red; }</style></head>" +
        "<body><!-- hidden --><h1>Head</h1>" +
        "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>" +
        "<div>second   line</div>" +
        "<a href=\"http://out.example.org/p?b=2\">x</a>" +
        "<a href='http://two.example.org/'>y</a>" +
        "<a name=\"no-href\">z</a></body></html>"
    val r = Seq(html).toDF("h").select(
      TextFns.htmlToText(col("h")).as("t"),
      TextFns.htmlLinks(col("h")).as("l"),
      TextFns.htmlTitle(col("h")).as("ti")).collect()(0)
    assert(r.getString(0) ==
      "My Page\nHead\na & b <tag> \"q\" 's' end\nsecond line\nx y z")
    assert(r.getSeq[String](1) ==
      Seq("http://out.example.org/p?b=2", "http://two.example.org/"))
    assert(r.getString(2) == "My Page")
    // null stays null; no title -> null
    val r2 = Seq(("<p>x</p>", null: String)).toDF("h", "n").select(
      TextFns.htmlTitle(col("h")).as("a"),
      TextFns.htmlToText(col("n")).as("b")).collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  test("WET conversion records round trip with optional provenance") {
    val texts = Seq(
      ("<urn:wet:1>", "http://a/", "2026-08-15T00:00:00Z",
        "extracted text\nline two", "<urn:doc:1>"),
      ("<urn:wet:2>", "http://b/", "2026-08-15T00:00:01Z", "", null))
      .toDF("record_id", "target_uri", "warc_date", "body", "refers_to")
    val dir = java.nio.file.Files.createTempDirectory("graft_wet").toString
    Warc.writeConversions(texts.repartition(1), dir, gzip = true)
    val back = Warc.read(spark, dir, types = Set("conversion"))
      .select("record_id", "refers_to", "body", "http_status")
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), r.getString(2), r.isNullAt(3)))).toMap
    assert(back("<urn:wet:1>") ==
      ((Some("<urn:doc:1>"), "extracted text\nline two", true)))
    assert(back("<urn:wet:2>") == ((None, "", true)))
    // a refers_to-less relation writes fine too
    val dir2 = java.nio.file.Files.createTempDirectory("graft_wet2").toString
    Warc.writeConversions(texts.drop("refers_to").limit(1), dir2)
    assert(Warc.read(spark, dir2, types = Set("conversion")).count() == 1)
  }

  test("htmlAnchors pairs hrefs with cleaned anchor text in order") {
    val html = "<a href=\"http://a/\">one <b>bold</b></a>" +
      "<a name=\"skip\">no</a>" +
      "<a class=\"c\" href='http://b/'>  spaced\n text </a>" +
      "<a href=\"http://c/\"></a>"
    val got = Seq(html).toDF("h")
      .select(explode(TextFns.htmlAnchors(col("h"))).as("a"))
      .select(col("a.href"), col("a.text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("http://a/", "one bold"),
      ("http://b/", "spaced text"), ("http://c/", "")))
  }

  test("htmlAnchors: attribute boundary and per-quote values") {
    // data-href is NOT a link; a double-quoted href legally contains
    // a single quote (and vice versa) without truncating.
    val html = "<a data-href=\"http://evil/\">not a link</a>" +
      "<a href=\"http://a/it's\">apos inside</a>" +
      "<a href='http://b/say\"hi\"'>quote inside</a>" +
      "<a\nhref=\"http://c/\">newline before attr</a>"
    val got = Seq(html).toDF("h")
      .select(explode(TextFns.htmlAnchors(col("h"))).as("a"))
      .select(col("a.href"), col("a.text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("http://a/it's", "apos inside"),
      ("http://b/say\"hi\"", "quote inside"),
      ("http://c/", "newline before attr")))
  }

  test("gunzipAll refuses a chain that inflates past the cap") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(Array.fill[Byte](1 << 20)('x'))   // 1 MiB of 'x' — tiny gz
    gz.close()
    val raw = bos.toByteArray
    val ex = intercept[IllegalArgumentException] {
      Warc.gunzipAll(raw, maxBytes = 1 << 16)
    }
    assert(ex.getMessage.contains("re-shard"))
    // under the cap it inflates fine
    assert(Warc.gunzipAll(raw).length == (1 << 20))
  }
}
