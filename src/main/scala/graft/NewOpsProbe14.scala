package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-14 operators at 100k / 1M rows. Claims
  * under test:
  *
  *   - TrainPrep.interleaveOrder: one small broadcast join + one
  *     (source, shard)-partitioned rank — linear, no global sort.
  *   - TrainPrep.fewShot: |test|·|pool| broadcast fan-out with the
  *     pool FIXED — linear in test items.
  *   - Crawl.recrawlSchedule: url-partitioned lag + one agg — linear.
  *   - UnigramTok: word counting is corpus-linear, but the seed vocab,
  *     Viterbi DP and EM run on the DISTINCT-WORD relation — growing
  *     the corpus ×10 under a fixed vocabulary must NOT grow the DP
  *     cost ×10 (the SentencePiece shape).
  *   - SentAlign.galeChurch: per-document DP — linear in documents at
  *     fixed sentences/doc.
  *
  * Usage: sbt "runMain graft.NewOpsProbe14" → one JSON line per scale.
  */
object NewOpsProbe14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Crawl, SentAlign, TrainPrep, UnigramTok}

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(100000, 1000000)) {
      // ~30-word docs over a FIXED 4096-word vocabulary (corpus grows,
      // vocabulary does not — the unigram claim)
      val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        expr("concat('src', pmod(id, 12))").as("source"),
        expr("array_join(transform(sequence(0, 29), " +
          "j -> concat('w', pmod(id * 37 + j * 13, 4096))), ' ')")
          .as("text")).localCheckpoint()

      var rows = 0L
      val tInterleave = time {
        rows = TrainPrep.interleaveOrder(docs, "doc_id", "source",
          ratios = (0 until 12).map(i => (s"src$i", 1 + i % 3)),
          nShards = 32, seed = 7L).count()
      }

      val test = docs.filter(col("doc_id") % 200 === 0)
        .select(col("doc_id"))
      val pool = docs.filter(col("doc_id") % (n / 500) === 0)
        .select(col("doc_id"), expr("pmod(doc_id, 7)").as("lab"))
      var fsRows = 0L
      val tFewShot = time {
        fsRows = TrainPrep.fewShot(test, "doc_id", pool, "doc_id",
          "lab", k = 8, seed = 1L).count()
      }

      val obs = docs.select(
        concat(lit("u"), pmod(col("doc_id"), lit(n / 20L))).as("url"),
        col("doc_id").as("ts"), pmod(col("doc_id"), lit(3L)).as("fp"))
      var tiers = 0L
      val tRecrawl = time {
        tiers = Crawl.recrawlSchedule(obs, "url", "ts", "fp",
          hotPct = 60, warmPct = 20, hotEvery = 1L, warmEvery = 10L,
          coldEvery = 100L).count()
      }

      var pieces = 0L
      val tUnigram = time {
        val words = UnigramTok.wordCounts(docs, "text")
        val vocab = UnigramTok.seedVocab(words, maxPieceLen = 4,
          minCount = 3)
        pieces = UnigramTok.emPieceCounts(
          UnigramTok.viterbiSegments(words, vocab, maxPieceLen = 4))
          .count()
      }

      // 10 sentences/doc, every 5th doc merges sentences 1+2 on side B
      val lens = docs.select(col("doc_id"),
        expr("transform(sequence(0, 9), " +
          "j -> CAST(10 + pmod(doc_id * 31 + j * 17, 20) AS BIGINT))")
          .as("la"))
        .withColumn("lb", expr("CASE WHEN doc_id % 5 = 0 THEN " +
          "concat(slice(la, 1, 1), array(la[2] + la[3] + 1), " +
          "slice(la, 4, 7)) ELSE la END"))
      val aSide = lens.select(col("doc_id"),
        posexplode(col("la")).as(Seq("ix", "len")))
      val bSide = lens.select(col("doc_id"),
        posexplode(col("lb")).as(Seq("ix", "len")))
      var beads = 0L
      val tAlign = time {
        beads = SentAlign.galeChurch(aSide, bSide, "doc_id", "ix", "len")
          .count()
      }

      println(s"""{"probe":"newops14","n":$n,""" +
        s""""interleave_sec":${f"$tInterleave%.2f"},"interleave_rows":$rows,""" +
        s""""fewshot_sec":${f"$tFewShot%.2f"},"fewshot_rows":$fsRows,""" +
        s""""recrawl_sec":${f"$tRecrawl%.2f"},"recrawl_urls":$tiers,""" +
        s""""unigram_sec":${f"$tUnigram%.2f"},"unigram_pieces":$pieces,""" +
        s""""align_sec":${f"$tAlign%.2f"},"align_beads":$beads}""")
    }
    spark.stop()
  }
}
