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
}
