package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the single-pass aggregation shapes added in round 9:
  * covariance (mergeable ~16 KB buffer), HLL and CMS registers. The
  * claim under test: cost is ONE corpus scan with map-side partial
  * aggregation — wall-clock should scale ~linearly in rows with no
  * shuffle blow-up (the shuffled state is ≤ KBs regardless of n).
  *
  * Usage: sbt "runMain graft.SketchProbe" → one JSON line per scale.
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(20000, 200000, 2000000)) {
      val vecs = spark.range(n.toLong).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> sin(id * 0.37 + j) * 2.0D)")
          .as("embedding"))
      val keys = spark.range(n.toLong)
        .select(concat(lit("key"), col("id") % (n / 10)).as("k"))
      // materialize generators once so the timed runs measure the agg
      vecs.count(); keys.count()
      val tCov = time {
        graft.functions.EmbeddingStats.covarianceMatrix(vecs, "embedding")
          .count()
      }
      val tHll = time {
        graft.functions.Sketches.hllRegisters(keys, "k").count()
      }
      val tCms = time {
        graft.functions.Sketches.cmsRegisters(keys, "k").count()
      }
      println(f"""{"probe":"sketch","n":$n,"cov_sec":$tCov%.2f,""" +
        f""""hll_sec":$tHll%.2f,"cms_sec":$tCms%.2f}""")
    }
    spark.stop()
  }
}
