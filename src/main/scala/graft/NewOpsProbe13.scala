package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-13 operator family at 10k / 100k / 1M rows.
  * Claims under test:
  *
  *   - Curation.c4Filter: line explode + per-doc rebuild + broadcast
  *     badword join + doc-local regexes — linear in corpus lines.
  *   - Curation.bloomLineDedup: distinct normalized lines + broadcast
  *     ≤ mBits register membership + per-doc rebuild — linear, no
  *     shared-line shuffle (the scale win over exact lineDedup).
  *   - Curation.ccnetBuckets: lattice-sized (group, score) counts +
  *     one keyed join + residual tie row_number — linear, no
  *     whole-group sort.
  *   - QualityModel.ngramMulticlassScore: char-n-gram explode ×
  *     broadcast weight lattice + map-side (doc, class) sums —
  *     scan-bound in total n-gram count.
  *   - Curation.registeredDomains (PSL wildcard/exception forms):
  *     distinct hosts × broadcast rules — linear in distinct hosts.
  *
  * Usage: sbt "runMain graft.NewOpsProbe13" → one JSON line per scale.
  */
object NewOpsProbe13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Curation, QualityModel}
    import graft.functions.Sketches
    import spark.implicits._
    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(10000, 100000, 1000000)) {
      // 6 lines of 10 tokens per doc, ~40% of lines carry terminal
      // punctuation, 10% of docs share a boilerplate first line
      val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        concat(
          when(col("id") % 10 === 0, lit("shared cookie banner line.\n"))
            .otherwise(lit("")),
          expr("array_join(transform(sequence(0, 5), " +
            "i -> concat(array_join(transform(sequence(0, 9), " +
            "j -> concat('w', pmod(id * 37 + (i * 10 + j) * 13 + j, " +
            "4096))), ' '), " +
            "CASE WHEN pmod(id + i, 5) < 2 THEN '.' ELSE '' END)), " +
            "'\n')")).as("text"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
        .localCheckpoint()
      // short docs for the n-gram explode (1 line, 10 tokens)
      val shortDocs = spark.range(n.toLong).select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(0, 9), " +
          "j -> concat('w', pmod(id * 37 + j * 13, 4096))), ' ')")
          .as("text")).localCheckpoint()
      val hosts = spark.range(n.toLong).select(
        expr("concat('sub', pmod(id, 3), '.site', pmod(id, 200000), " +
          "CASE WHEN id % 5 = 0 THEN '.blog.ck' ELSE '.com' END)")
          .as("host")).localCheckpoint()

      val bw = Seq("badwordx", "badwordy").toDF("w")
      val tC4 = time {
        Curation.c4Filter(docs, "doc_id", "text", bw, "w")
          .groupBy(col("drop_reason")).count().collect()
      }
      // registers from the 10%-of-docs reference shard's lines
      val refNorms = docs.filter(col("doc_id") % 10 === 0)
        .select(explode(split(col("text"), "\n")).as("__l"))
        .select(lower(trim(col("__l"))).as("__norm"))
        .filter(col("__norm") =!= "").distinct()
      val regs = Sketches.bloomRegisters(refNorms, "__norm",
        mBits = 1 << 20, kHashes = 4).localCheckpoint()
      val tBloom = time {
        Curation.bloomLineDedup(docs, "doc_id", "text", regs,
          mBits = 1 << 20, kHashes = 4)
          .agg(sum(col("dropped_lines"))).head()
      }
      val scored = docs.select(col("doc_id"), col("source"),
        pmod(col("doc_id") * 7919, lit(1000)).as("score"))
      val tCcnet = time {
        Curation.ccnetBuckets(scored, "source", "score", "doc_id")
          .groupBy(col("bucket")).count().collect()
      }
      val cls = Seq(("en", 5L, -1L), ("de", 11L, 0L), ("fr", 17L, 1L))
        .toDF("lang", "p", "bias")
      val w = spark.range(0, 1000).select(col("id").as("bucket"))
        .crossJoin(cls)
        .select(col("bucket"), col("lang"),
          ((col("bucket") * col("p")) % 7 - 3).as("weight"))
      val b = cls.select(col("lang"), col("bias"))
      val tNgram = time {
        QualityModel.ngramMulticlassScore(shortDocs, "doc_id", "text",
          w, "bucket", "lang", "weight", b, "lang", "bias",
          nMin = 2, nMax = 3, nBuckets = 1000)
          .filter(col("is_pred") === 1).count()
      }
      val rules = Seq("com", "co.uk", "*.ck", "!www.ck").toDF("s")
      val tPsl = time {
        Curation.registeredDomains(hosts, "host", rules, "s")
          .filter(col("registered_domain").isNotNull).count()
      }
      println(s"""{"probe":"newops13","n":$n,""" +
        f""""c4_filter_sec":$tC4%.2f,"bloom_line_dedup_sec":$tBloom%.2f,""" +
        f""""ccnet_buckets_sec":$tCcnet%.2f,"ngram_lid_sec":$tNgram%.2f,""" +
        f""""psl_domains_sec":$tPsl%.2f}""")
    }
    spark.stop()
  }
}
