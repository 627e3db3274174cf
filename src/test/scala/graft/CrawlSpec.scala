package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Crawl

class CrawlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("crawlDelta: presence markers, not fingerprint nullability, " +
      "decide added/removed; null fps compare as unchanged") {
    val old = Seq(
      ("u1", Some(10L)), // unchanged
      ("u2", Some(20L)), // changed
      ("u3", Some(30L)), // removed
      ("u4", None),      // null fp both sides -> unchanged, NOT added
      ("u5", None))      // null -> value = changed
      .toDF("url", "fp")
    val neu = Seq(
      ("u1", Some(10L)),
      ("u2", Some(21L)),
      ("u4", None),
      ("u5", Some(5L)),
      ("u6", Some(60L))) // added
      .toDF("url", "fp")
    val got = Crawl.crawlDelta(old, neu, "url", "fp")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got == Map("u1" -> "unchanged", "u2" -> "changed",
      "u3" -> "removed", "u4" -> "unchanged", "u5" -> "changed",
      "u6" -> "added"))
    // both fingerprints ride along for downstream routing
    val row = Crawl.crawlDelta(old, neu, "url", "fp")
      .filter(col("url") === "u2").head()
    assert(row.getLong(1) == 20L && row.getLong(2) == 21L)
  }

  test("duplicate keys in a snapshot are refused loudly") {
    val dup = Seq(("u1", 1L), ("u1", 2L), ("u2", 3L)).toDF("url", "fp")
    val ok = Seq(("u1", 1L)).toDF("url", "fp")
    val e = intercept[IllegalArgumentException] {
      Crawl.crawlDelta(dup, ok, "url", "fp")
    }
    assert(e.getMessage.contains("duplicate"))
    // and the guard can be waived for pre-resolved inputs
    assert(Crawl.crawlDelta(ok, ok, "url", "fp",
      requireUniqueKeys = false).count() == 1)
  }

  test("mainContent: link-dense and short blocks drop, prose survives " +
      "in order, script decoys removed, no-content docs absent") {
    val pages = Seq(
      (1L, "<html><body>" +
        "<nav><a href=\"/a\">AAAA</a> <a href=\"/b\">BBBBBB</a></nav>" +
        "<p>this is a long enough prose paragraph</p>" +
        "<script>var x = \"<p>decoy paragraph that is long enough</p>\";" +
        "</script>" +
        "<p>second paragraph with <a href=\"/x\">tiny</a> link share</p>" +
        "<p>short</p>" +
        "<footer><a href=\"/tos\">Terms of Service Terms</a></footer>" +
        "</body></html>"),
      (2L, "<html><body><div><a href=\"/\">only links here</a></div>" +
        "</body></html>"))
      .toDF("doc_id", "html")
    val got = Crawl.mainContent(pages, "doc_id", "html",
      minChars = 10, maxLinkPct = 30)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L ->
      ("this is a long enough prose paragraph\n" +
        "second paragraph with tiny link share")))
    // doc 2: its only block is 100% link text -> absent entirely
    assert(!got.contains(2L))
    // footer dropped by DENSITY (len 21 >= 10 but links are 100%)
  }

  private val robotsTxt =
    """# comment line
      |Disallow: /orphan-rule-before-any-group/
      |User-Agent: GraftBot
      |disallow: /bot/   # trailing comment
      |Crawl-delay: 5
      |
      |User-agent: otherbot
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/pub
      |Disallow: /tmp*.log$
      |Disallow:
      |""".stripMargin

  test("parseRobots: RFC 9309 groups — named-agent shadowing, " +
      "case-insensitive fields/agents, comments, UA runs, empty " +
      "Disallow and pre-group rules dropped") {
    val robots = Seq(("h1", robotsTxt)).toDF("host", "txt")
    val forBot = Crawl.parseRobots(robots, "host", "txt", "graftbot")
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet
    assert(forBot == Set(("/bot/", false))) // star group shadowed
    val forOther = Crawl.parseRobots(robots, "host", "txt", "randombot")
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet
    assert(forOther == Set(("/private/", false), ("/private/pub", true),
      ("/tmp*.log$", false)))
  }

  test("robotsAllowed: longest match wins, allow wins ties, wildcards " +
      "and $ anchors, no-rule hosts and no-match paths default allowed, " +
      "duplicate url rows survive") {
    val robots = Seq(("h1", robotsTxt)).toDF("host", "txt")
    val rules = Crawl.parseRobots(robots, "host", "txt", "randombot")
    val urls = Seq(
      "http://h1/private/a",        // disallowed
      "http://h1/private/pub-x",    // allow beats the shorter disallow
      "http://h1/tmp123.log",       // wildcard + $ match -> disallowed
      "http://h1/tmp123.logs",      // $ anchor: no match -> allowed
      "http://h1/free",             // no match -> allowed
      "http://h1",                  // bare authority -> path '/' -> allowed
      "http://h2/private/a",        // host with no rules -> allowed
      "http://h1/private/a")        // duplicate row must survive
      .toDF("url")
    val got = Crawl.robotsAllowed(urls, "url", rules).collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    assert(got.length == 8)
    val byUrl = got.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byUrl("http://h1/private/a") == Seq(false, false))
    assert(byUrl("http://h1/private/pub-x") == Seq(true))
    assert(byUrl("http://h1/tmp123.log") == Seq(false))
    assert(byUrl("http://h1/tmp123.logs") == Seq(true))
    assert(byUrl("http://h1/free") == Seq(true))
    assert(byUrl("http://h1") == Seq(true))
    assert(byUrl("http://h2/private/a") == Seq(true))
  }

  test("crawlDelays: group selection mirrors parseRobots, max among " +
      "binding groups, malformed ignored; fetchSchedule serializes " +
      "per host") {
    import graft.operators.Crawl
    val robots = Seq(
      // named group (delay 3) shadows the * group (delay 9); a second
      // binding named group raises the max to 4
      ("h1", "User-agent: graftbot\nCrawl-delay: 3\nDisallow: /a\n\n" +
        "User-agent: GRAFTBOT\nCrawl-delay: 4\nDisallow: /b\n\n" +
        "User-agent: *\nCrawl-delay: 9\nDisallow: /c"),
      // only a * group binds
      ("h2", "User-agent: *\nCrawl-delay: 7\nDisallow: /d"),
      // malformed, negative, and absurd values are ignored -> absent
      ("h3", "User-agent: *\nCrawl-delay: soon\nDisallow: /e"),
      ("h4", "User-agent: *\nCrawl-delay: -2\nDisallow: /f"),
      ("h6", "User-agent: *\nCrawl-delay: inf\nDisallow: /h"),
      // fractional delays ceil (never under-throttle): 1.5 -> 2
      ("h5", "User-agent: *\nCrawl-delay: 1.5\nDisallow: /g"))
      .toDF("host", "txt")
    val d = Crawl.crawlDelays(robots, "host", "txt", "graftbot")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(d == Map("h1" -> 4L, "h2" -> 7L, "h5" -> 2L))
    val urls = Seq("http://h1/x", "http://h1/a", "http://h9/q",
      "http://h2/z").toDF("u")
    val sched = Crawl.fetchSchedule(urls, "u", d.toSeq.toDF("host",
        "delay"), defaultDelay = 5L)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // h1: urls sorted -> /a slot 0, /x slot 1 at delay 4
    assert(sched("http://h1/a") == ((4L, 0L, 0L)))
    assert(sched("http://h1/x") == ((4L, 1L, 4L)))
    assert(sched("http://h2/z") == ((7L, 0L, 0L)))
    assert(sched("http://h9/q") == ((5L, 0L, 0L)))   // default delay
  }

  test("recrawlSchedule: change-rate tiers, single-obs cold, next " +
      "visit arithmetic") {
    import graft.operators.Crawl
    val obs = Seq(
      // frozen: 4 obs, same fp -> cold
      ("uF", 10L, 7L), ("uF", 20L, 7L), ("uF", 30L, 7L), ("uF", 40L, 7L),
      // alternating: 100% change rate -> hot
      ("uH", 10L, 0L), ("uH", 20L, 1L), ("uH", 30L, 0L), ("uH", 40L, 1L),
      // one change over 4 transitions = 25% -> warm at 20/60 bounds
      ("uW", 10L, 0L), ("uW", 20L, 0L), ("uW", 30L, 1L), ("uW", 40L, 1L),
      ("uW", 50L, 1L),
      // single observation: no signal -> cold
      ("u1", 99L, 5L))
      .toDF("url", "ts", "fp")
    val r = Crawl.recrawlSchedule(obs, "url", "ts", "fp", hotPct = 60,
        warmPct = 20, hotEvery = 100L, warmEvery = 1000L,
        coldEvery = 10000L)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(4), x.getLong(5))))
      .toMap
    assert(r("uF") == ((4L, 0L, "cold", 10040L)))
    assert(r("uH") == ((4L, 3L, "hot", 140L)))
    assert(r("uW") == ((5L, 1L, "warm", 1050L)))
    assert(r("u1") == ((1L, 0L, "cold", 10099L)))
    intercept[IllegalArgumentException] {
      Crawl.recrawlSchedule(obs, "url", "ts", "fp", hotPct = 10,
        warmPct = 20, hotEvery = 1L, warmEvery = 2L, coldEvery = 3L)
    }
  }

  test("sitemapUrls: url and index entries, whitespace-trimmed locs, " +
      "amp decode, absent lastmod null, junk docs emit nothing") {
    val docs = Seq(
      (1L, "<urlset>\n<url><loc> http://a.example.org/p?x=1&amp;y=2 " +
        "</loc><lastmod> 2026-01-02 </lastmod></url>\n" +
        "<url><loc>http://a.example.org/q</loc></url>\n</urlset>"),
      (2L, "<sitemapindex><sitemap><loc>http://a.example.org/s1.xml" +
        "</loc></sitemap></sitemapindex>"),
      (3L, "plain text, not a sitemap"),
      (4L, "<urlset><url><lastmod>2026</lastmod></url></urlset>"))
      .toDF("doc_id", "xml")
    val got = Crawl.sitemapUrls(docs, "doc_id", "xml").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(got == Set(
      (1L, "url", "http://a.example.org/p?x=1&y=2", Some("2026-01-02")),
      (1L, "url", "http://a.example.org/q", None),
      (2L, "sitemap", "http://a.example.org/s1.xml", None)),
      s"got $got")
  }

  test("gunzipText -> sitemapUrls: a gzipped .xml.gz member sitemap " +
      "inflates in-plan and extracts; non-gzip bytes and bombs refuse " +
      "loudly; null payloads stay null") {
    import graft.expr.GraftExpressions
    def rc(t: Throwable): Throwable =
      if (t.getCause == null) t else rc(t.getCause)
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    val xml = "<urlset><url><loc>http://a.example.org/p?x=1&amp;y=2" +
      "</loc><lastmod>2026-02-03</lastmod></url></urlset>"
    val docs = Seq((1L, gz(xml))).toDF("doc_id", "gz")
      .select(col("doc_id"),
        GraftExpressions.gunzipText(col("gz")).as("xml"))
    val got = Crawl.sitemapUrls(docs, "doc_id", "xml").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(got == Set((1L, "url", "http://a.example.org/p?x=1&y=2",
      Some("2026-02-03"))), s"got $got")
    // null in -> null out (no row from the extractor, no error)
    val nulls = Seq((2L, Option.empty[Array[Byte]])).toDF("doc_id", "gz")
      .select(col("doc_id"),
        GraftExpressions.gunzipText(col("gz")).as("xml"))
    assert(nulls.collect()(0).isNullAt(1))
    // non-gzip bytes refuse with the magic-byte message
    val bad = intercept[Exception] {
      Seq((3L, "plain".getBytes("UTF-8"))).toDF("doc_id", "gz")
        .select(GraftExpressions.gunzipText(col("gz"))).collect()
    }
    assert(rc(bad).getMessage.contains("not gzip"), rc(bad).getMessage)
    // decompression past maxBytes refuses (bomb guard)
    val bomb = intercept[Exception] {
      Seq((4L, gz("x" * 100000))).toDF("doc_id", "gz")
        .select(GraftExpressions.gunzipText(col("gz"), maxBytes = 1024))
        .collect()
    }
    assert(rc(bomb).getMessage.contains("decompresses past"),
      rc(bomb).getMessage)
    // SQL surface
    graft.expr.GraftExpressions.register(spark)
    Seq((5L, gz("<x/>"))).toDF("doc_id", "gz")
      .createOrReplaceTempView("gz_docs")
    assert(spark.sql("SELECT gunzip_text(gz) AS t FROM gz_docs")
      .collect()(0).getString(0) == "<x/>")
  }
}
