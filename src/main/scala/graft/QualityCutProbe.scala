package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-10 per-source quality cut: the window form
  * (`topQualityPerGroup`, one sort task per source) against the scale
  * form (`topQualityPerGroupAtScale`, lattice-bounded aggregate +
  * broadcast threshold + map-side filter) on a corpus with ONE DOMINANT
  * source — the straggler shape the rewrite exists for. The claim under
  * test: the window form's cost is the dominant source's single-task
  * sort (serial in its size), while the scale form stays a parallel
  * one-scan aggregation; both return the identical row set.
  *
  * Usage: sbt "runMain graft.QualityCutProbe" → one JSON line per scale.
  */
object QualityCutProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Curation
    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(100000, 1000000, 10000000)) {
      // 95% of rows in one source, the rest spread over 20 — and a 6-dp
      // score lattice like the real quality score
      val df = spark.range(n.toLong).select(col("id"),
        when(col("id") % 20 === 0,
            concat(lit("small"), (col("id") / 20) % 19))
          .otherwise(lit("dominant")).as("g"),
        (round(sin(col("id") * 0.37) * 500000.0) / 1000000.0).as("score"))
        .localCheckpoint(true) // materialize so timed runs measure the cut
      val tWindow = time {
        Curation.topQualityPerGroup(df, "g", "score", "id", 0.75).count()
      }
      val tScale = time {
        Curation.topQualityPerGroupAtScale(df, "g", "score", "id", 0.75)
          .count()
      }
      // identical output, asserted at every scale
      val diff = Curation.topQualityPerGroup(df, "g", "score", "id", 0.75)
        .select(col("id"))
        .exceptAll(Curation
          .topQualityPerGroupAtScale(df, "g", "score", "id", 0.75)
          .select(col("id")))
        .count()
      require(diff == 0, s"scale form diverged at n=$n: $diff rows")
      println(f"""{"probe":"quality_cut","n":$n,"window_sec":$tWindow%.2f,""" +
        f""""at_scale_sec":$tScale%.2f}""")
      df.unpersist()
    }
    spark.stop()
  }
}
