package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-10 operator family: BPE training, batch
  * perceptron, CDC chunking, winnowing, and backoff-LM scoring, at
  * synthetic corpora of 10k / 100k / 1M documents (~60 tokens each —
  * 60M tokens at the top size). Claims under test:
  *
  *   - Bpe.train: cost ≈ one corpus scan + vocabulary-sized iterations.
  *     The vocabulary here is held constant while docs grow ×100, so the
  *     merge loop should be FLAT and only the word-count scan grows.
  *   - perceptronTrain: epochs × one map-side agg — linear, no state
  *     growth.
  *   - cdcChunks/winnowFingerprints: per-doc kernels + one hash-keyed
  *     agg — linear.
  *   - backoffDocStats: three count aggs + five equi joins — the joins
  *     dominate; near-linear under AQE.
  *
  * Usage: sbt "runMain graft.NewOpsProbe" → one JSON line per scale.
  */
object NewOpsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{Bpe, NgramLm}
    import graft.operators.{ContentChunks, QualityModel}
    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(10000, 100000, 1000000)) {
      // ~60 tokens/doc from a fixed 4k-word vocabulary (constant across
      // scales, as in a real corpus where vocabulary saturates)
      val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(0, 59), " +
          "j -> concat('w', pmod(id * 37 + j * j * 13 + j, 4096))), ' ')")
          .as("text"))
        .localCheckpoint()
      val tBpe = time { Bpe.train(docs, "text", nMerges = 4) }
      val tPerc = time {
        val f = QualityModel.docFeatures(docs, "text")
          .withColumn("y", when(col("doc_id") % 3 === 0, 1L)
            .otherwise(lit(-1L)))
        QualityModel.perceptronTrain(f, "y", QualityModel.featureCols, 3)
      }
      val tCdc = time {
        ContentChunks.cdcSharedChunks(
          ContentChunks.cdcChunks(docs, "doc_id", "text", 3, 32)).count()
      }
      val tWin = time {
        ContentChunks.winnowShared(
          ContentChunks.winnowFingerprints(docs, "doc_id", "text", 5, 8))
          .count()
      }
      val tLm = time {
        NgramLm.backoffDocStats(docs,
          docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text").count()
      }
      println(f"""{"probe":"newops","n":$n,"bpe_sec":$tBpe%.2f,""" +
        f""""perceptron_sec":$tPerc%.2f,"cdc_sec":$tCdc%.2f,""" +
        f""""winnow_sec":$tWin%.2f,"lm_sec":$tLm%.2f}""")
    }
    spark.stop()
  }
}
