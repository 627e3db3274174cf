package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonlDocs

class JsonlDocsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("JSONL round trip is value-exact: escaping, null-field omission, " +
      "nested metadata, gzip shards") {
    val base = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = Seq(
      ("a", Some("line one\nline\ttwo \"quoted\" back\\slash ü😀"),
        Some("src0"), Some(7L)),
      ("b", None, Some("src1"), None), // null text AND null metadata field
      ("c", Some(""), None, Some(0L)))
      .toDF("id", "text", "source", "n")
      .select(col("id"), col("text"), col("source"),
        lit("2026-08-15").as("added"),
        struct(col("n").as("n_chars"),
          array(lit("en")).as("langs")).as("metadata"))
    JsonlDocs.write(docs, s"$base/plain")
    val back = JsonlDocs.read(spark, s"$base/plain")
      .select(col("id"), col("text"), col("source"),
        col("metadata.n_chars").as("n"))
      .collect()
      .map(r => r.getString(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(back("a") ==
      (((Some("line one\nline\ttwo \"quoted\" back\\slash ü😀"),
        Some("src0"), Some(7L)))))
    assert(back("b") == ((None, Some("src1"), None)))
    assert(back("c") == ((Some(""), None, Some(0L))))
    // gzip shards read identically (per-file parallelism caveat in doc)
    JsonlDocs.write(docs, s"$base/gz", compression = Some("gzip"))
    assert(JsonlDocs.read(spark, s"$base/gz").count() == 3)
  }

  test("FAILFAST keeps corruption loud; permissive null-fills the bad line") {
    val base = java.nio.file.Files.createTempDirectory("graft_jsonl2")
    val f = base.resolve("part-0.json")
    java.nio.file.Files.writeString(f,
      """{"id":"ok","text":"fine"}
        |{not json at all
        |{"id":"ok2","text":"also fine"}
        |""".stripMargin)
    val e = intercept[org.apache.spark.SparkException] {
      JsonlDocs.read(spark, base.toString).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")),
      e.getMessage)
    val perm = JsonlDocs.read(spark, base.toString, permissive = true)
      .select("id").collect().map(r => Option(r.getString(0))).toSet
    assert(perm == Set(Some("ok"), Some("ok2"), None))
  }
}
