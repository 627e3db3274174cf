package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-18 inversion-count operators. Claim
  * under test: [[graft.operators.Ops.kendallTauLarge]] and
  * [[graft.operators.Ops.mannKendallLarge]] are ~LINEAR in rows per
  * group (the O(n²) siblings refuse past maxN=4096 because their
  * pair join is quadratic BY DEFINITION — at 1M rows that join
  * would be 5·10¹¹ pairs). The probe scales ONE group 125k → 1M
  * rows (tie-rich: x on a 2000-value lattice, y on a 500-value
  * lattice) and prints per-scale wall seconds; the pass criterion
  * is cost growing ~n (within the JVM-noise band), not ~n².
  *
  * Usage: sbt "runMain graft.NewOpsProbe18" → one JSON line per
  * scale; committed as NEWOPS_PROBE_r18.json.
  */
object NewOpsProbe18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Ops

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm the JIT + codegen caches at a small scale first
    for (n <- Seq(10000L, 125000L, 250000L, 500000L, 1000000L)) {
      val rows = spark.range(n).select(
        col("id"),
        lit("g").as("grp"),
        pmod(col("id") * 2654435761L % 1000003L, lit(2000L)).as("x"),
        pmod(col("id") * 40503L % 99991L, lit(500L)).as("v"))
        .localCheckpoint()
      var ktRows = 0L
      val tKt = time {
        ktRows = Ops.kendallTauLarge(rows, "grp", "id", "x", "v")
          .count()
      }
      var mkRows = 0L
      val tMk = time {
        mkRows = Ops.mannKendallLarge(rows, "grp", "id", "id", "v")
          .count()
      }
      if (n >= 125000L)
        println(s"""{"probe":"inversion_count_r18","n":$n,""" +
          s""""kendall_tau_large_sec":$tKt,"rows_kt":$ktRows,""" +
          s""""mann_kendall_large_sec":$tMk,"rows_mk":$mkRows}""")
    }
    spark.stop()
  }
}
