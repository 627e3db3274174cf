package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextIndex
import graft.sources.Warc
import graft.streaming.EventStream

class CrawlStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wave(landing: java.nio.file.Path, tag: String,
      docs: Seq[(Long, String)]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory(s"crawl_$tag")
    val pages = docs.toDF("id", "words").select(
      concat(lit("<urn:crawl:"), col("id"), lit(">")).as("record_id"),
      concat(lit("http://h"), col("id") % 3, lit(".example.com/p/"),
        col("id")).as("target_uri"),
      lit("2026-08-15T00:00:00Z").as("warc_date"),
      lit("text/html; charset=utf-8").as("http_content_type"),
      when(col("id") % 10 === 9, 404).otherwise(200).cast("int")
        .as("http_status"),
      concat(lit("<html><body><p>"), col("words"),
        lit("</p></body></html>")).as("body"))
    Warc.write(pages.repartition(1), tmp.toString, gzip = true)
    val walk = java.nio.file.Files.list(tmp)
    try walk.filter(p => p.getFileName.toString.endsWith(".warc.gz"))
      .forEach { p =>
        java.nio.file.Files.move(p,
          landing.resolve(s"$tag-${p.getFileName}")); ()
      }
    finally walk.close()
  }

  test("crawlTextIndexStream: landed WARC shards become BM25-searchable " +
      "micro-batch by micro-batch; 404s never index; maintenance " +
      "verdict surfaces in-stream") {
    val base = java.nio.file.Files.createTempDirectory("graft_crawlstream")
    val landing = java.nio.file.Files.createDirectory(base.resolve("landing"))
    val idx = base.resolve("idx").toString
    val ckpt = base.resolve("ckpt").toString
    val mlog = base.resolve("mlog").toString
    TextIndex.write(Seq((1L, "seed corpus page")).toDF("doc_id", "text"),
      "doc_id", "text", idx, nBuckets = 8)
    val q = EventStream.crawlTextIndexStream(
      Warc.readStream(spark, landing.toString), idx, ckpt,
      docId = regexp_extract(col("record_id"), "([0-9]+)", 1),
      maintenanceEvery = 1, maintenanceLog = mlog)
    try {
      wave(landing, "w1", Seq(10L -> "spark crawl content one",
        11L -> "unrelated filler words", 19L -> "gone page"))
      q.processAllAvailable()
      val afterW1 = TextIndex.search(spark, idx, Seq("spark"), 10)
        .collect().map(_.getLong(0)).toSet
      assert(afterW1 == Set(10L), s"got $afterW1")
      wave(landing, "w2", Seq(20L -> "more spark crawl arriving"))
      q.processAllAvailable()
    } finally q.stop()
    val hits = TextIndex.search(spark, idx, Seq("spark"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(10L, 20L), s"got $hits")
    // the 404 page (id 19) must never have been indexed
    val none = TextIndex.search(spark, idx, Seq("gone"), 10).collect()
    assert(none.isEmpty)
    // maintenance verdicts surfaced per batch into the parquet log
    val log = spark.read.parquet(mlog)
    assert(log.count() >= 2)
    assert(log.select("index_path").distinct().collect()
      .map(_.getString(0)).toSeq == Seq(idx))
  }
}
