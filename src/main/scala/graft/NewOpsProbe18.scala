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
      // drop this scale's checkpoint blocks so they can't age the
      // next scale's timing (the q180 JVM-aging lesson)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // theilSenLarge: the O(n^2) estimator made ~n log n — at 1M
    // rows the pair join would be 5e11 slopes; the 16-ary
    // parametric search runs ~8 engine rounds instead
    for (n <- Seq(250000L, 1000000L)) {
      val rows = spark.range(n).select(
        lit("g").as("grp"), col("id").as("x"),
        (pmod(col("id") * 40503L % 99991L, lit(20000L))
          + expr("id div 2")).as("y"))
        .localCheckpoint()
      var ts = 0L
      val tTs = time {
        ts = Ops.theilSenLarge(rows, "grp", "x", "y").count()
      }
      println(s"""{"probe":"theil_sen_large_r18","n":$n,""" +
        s""""sec":$tTs,"rows":$ts}""")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // rollingMedianLarge: claim 1 — cost FLAT in w (the histogram
    // needs no window buffer; w only shifts the lag offset)
    for (w <- Seq(1000, 10000, 50000)) {
      val rows = spark.range(100000L).select(
        lit("g").as("grp"), col("id"),
        pmod(col("id") * 2654435761L % 1000003L, lit(16L)).as("v"))
        .localCheckpoint()
      var rm = 0L
      val tRm = time {
        rm = Ops.rollingMedianLarge(rows, "grp", "id", "id", "v",
          w = w, maxLattice = 64).count()
      }
      println(s"""{"probe":"rolling_median_large_r18","n":100000,""" +
        s""""w":$w,"lattice":16,"sec":$tRm,"rows":$rm}""")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // claim 2 — ~linear in rows at the deployment shape (keys
    // partition the data; a SINGLE million-row key additionally pays
    // WindowExec's per-group spill past its in-memory buffer —
    // measured ~39 s, stated in the operator doc)
    for (n <- Seq(500000L, 1000000L, 2000000L)) {
      val rows = spark.range(n).select(
        concat(lit("k"), pmod(col("id"), lit(10L))).as("grp"),
        col("id"),
        pmod(col("id") * 2654435761L % 1000003L, lit(16L)).as("v"))
        .localCheckpoint()
      var rm = 0L
      val tRm = time {
        rm = Ops.rollingMedianLarge(rows, "grp", "id", "id", "v",
          w = 10000, maxLattice = 64).count()
      }
      println(s"""{"probe":"rolling_median_large_r18","n":$n,""" +
        s""""keys":10,"w":10000,"lattice":16,"sec":$tRm,"rows":$rm}""")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
