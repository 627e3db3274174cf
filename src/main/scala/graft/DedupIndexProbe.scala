package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale probe for the persisted signature index (SCALE.md): grow the
  * EXISTING corpus ×1/×10/×100 while probing the SAME fixed ingestion
  * batch, and time
  *
  *  - the one-time index build (expected ~linear in corpus),
  *  - the per-batch indexed probe (expected ~flat — cost follows the
  *    batch via partition-pruned index reads),
  *  - the union-path `dedupIncremental` (expected ~linear in corpus —
  *    the cost shape the index exists to remove).
  *
  * Also asserts the two load-bearing probe-plan properties: the final
  * plan's only parquet scans are partition-pruned index relations, and
  * the index stores no text column at all.
  */
object DedupIndexProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-46s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // fixed batch: near-dups of a slice of the ORIGINAL corpus + fresh
    // docs, ids above any replica range
    val batch = docs0.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 4000000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s*", "").as("text"))
      .unionByName(docs0.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 4100000000L).as("doc_id"),
          format_string("fresh alpha %d beta %d gamma", col("doc_id"),
            col("doc_id") * 7).as("text")))
      .cache()
    val nBatch = batch.count()

    for (mult <- mults) {
      val reps = spark.range(mult).select(col("id").as("rep"))
      val corpus = docs0.crossJoin(reps)
        .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
          concat_ws(" ", col("text"), concat(lit("rep"), col("rep"))).as("text"))
        .repartition(32).cache()
      val n = corpus.count()
      println(s"[probe] corpus x$mult = $n docs, batch = $nBatch docs")
      val idx = java.nio.file.Files.createTempDirectory("graft_dixp")
        .resolve("idx").toString
      time(s"x$mult index build") {
        Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx,
          shingleN = 2, k = 16, bands = 4, nBuckets = 64)
      }
      val survivors = time(s"x$mult indexed probe (batch-only cost)") {
        Dedup.dedupIncrementalIndexed(batch, idx, "doc_id", "text",
          threshold = 0.6).count()
      }
      val survivorsU = time(s"x$mult union-path dedupIncremental") {
        Dedup.dedupIncremental(corpus, batch, "doc_id", "text",
          threshold = 0.6, shingleN = 2, k = 16, bands = 4).count()
      }
      require(survivors == survivorsU,
        s"x$mult: indexed $survivors != union $survivorsU")
      val plan = Dedup.dedupIncrementalIndexed(batch, idx, "doc_id", "text",
        threshold = 0.6).queryExecution.executedPlan.toString
      require(plan.contains("PartitionFilters: [ib"),
        s"docs/ scan not partition-pruned:\n$plan")
      require(!spark.read.parquet(s"$idx/docs").schema.fieldNames.contains("text"),
        "index must not store text")
      // the ROLLING step: appending the batch's survivors must cost like
      // the batch (flat across corpus sizes), where the rebuild
      // alternative costs like the corpus — the whole point of the append
      val surv = Dedup.dedupIncrementalIndexed(batch, idx, "doc_id", "text",
        threshold = 0.6).localCheckpoint(true)
      time(s"x$mult append survivors (batch-sized)") {
        Dedup.appendToSignatureIndex(surv, "doc_id", "text", idx)
      }
      time(s"x$mult index REBUILD (corpus-sized alternative)") {
        val idx2 = java.nio.file.Files.createTempDirectory("graft_dixp2")
          .resolve("idx").toString
        Dedup.writeSignatureIndex(corpus.unionByName(
            surv.select(col("doc_id"), col("text"))), "doc_id", "text", idx2,
          shingleN = 2, k = 16, bands = 4, nBuckets = 64)
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
