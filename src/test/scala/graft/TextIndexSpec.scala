package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, TextIndex}

class TextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def corpus() = Seq(
    (1L, "spark streaming joins the query planner"),
    (2L, "spark spark spark"),
    (3L, "a completely different document about nothing"),
    (4L, "query planner and query optimizer"),
    (5L, "join the spark query club today")).toDF("doc_id", "text")

  test("index search matches direct bm25 exactly and prunes partitions") {
    val docs = corpus()
    val path = java.nio.file.Files.createTempDirectory("tix").resolve("idx").toString
    TextIndex.write(docs, "doc_id", "text", path, nBuckets = 64)

    val terms = Seq("spark", "query", "join")
    val probe = TextIndex.search(spark, path, terms, k = 10)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected partition-pruned postings scan:\n$plan")

    val viaIndex = probe.collect()
      .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9) / 1e9, r.getLong(2)))
    val direct = Curation.bm25(docs, "doc_id", "text", terms)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(10).collect()
      .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9) / 1e9, r.getLong(2)))
    assert(viaIndex.toSeq == direct.toSeq)
  }

  test("empty corpus refuses BEFORE touching disk — no half-built index") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val path = java.nio.file.Files.createTempDirectory("tix3").resolve("idx").toString
    intercept[IllegalArgumentException] {
      TextIndex.write(empty, "doc_id", "text", path)
    }
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      "refusal must leave no postings directory behind")
  }

  test("search only reads the buckets its terms hash to") {
    val docs = corpus()
    val path = java.nio.file.Files.createTempDirectory("tix2").resolve("idx").toString
    TextIndex.write(docs, "doc_id", "text", path, nBuckets = 256)
    // single-term probe: exactly one bucket directory may be listed
    val probe = TextIndex.search(spark, path, Seq("spark"), 5)
    val scan = probe.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"))
    assert(probe.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 5L))
  }
}
