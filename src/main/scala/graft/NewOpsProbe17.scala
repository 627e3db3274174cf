package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-17 operators at 100k / 1M rows. Claims
  * under test:
  *
  *   - Experiment.logRank: one (exp, t) agg + one exp-partitioned
  *     window + one fold — linear in subjects, state bounded by an
  *     experiment's distinct event times.
  *   - Drift.ksDrift: one (key, value) count + one key-partitioned
  *     window over DISTINCT values + one fold — linear.
  *   - Drift.psi: one (key, bucket) agg + one key fold — linear,
  *     flat in bucket count.
  *   - Drift.cusum: ONE key-partitioned window pass (four running
  *     aggregates) — linear in rows.
  *   - Ops.theilSen: O(n²) pairs per group BY DESIGN under the loud
  *     maxN contract — the probe holds group size fixed (128) and
  *     scales the group COUNT, which is the contracted deployment
  *     shape; cost must scale with total pairs, i.e. linearly in
  *     groups.
  *   - EvalMetrics.ndcgAtK: one query-partitioned rank window + one
  *     fold — linear.
  *   - EvalMetrics.bradleyTerry: per-round broadcast join + model-
  *     keyed agg over a pair-sized ledger — linear in pairs at fixed
  *     iters (probed at 1k models / ~32k pairs).
  *
  * Usage: sbt "runMain graft.NewOpsProbe17" → one JSON line per scale.
  */
object NewOpsProbe17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Drift, EvalMetrics, Experiment, Ops}

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(100000, 1000000)) {
      val rows = spark.range(n.toLong).select(
        col("id"),
        pmod(expr("id div 2"), lit(8L)).as("exp"),
        pmod(col("id"), lit(2L)).as("g"),
        pmod(col("id") * 31, lit(2000L)).as("v"),
        pmod(col("id") * 7, lit(500L)).as("t"),
        pmod(col("id"), lit(16L)).as("bucket"),
        (col("id") % 2).as("p"))
        .localCheckpoint()

      var lrRows = 0L
      val tLr = time {
        lrRows = Experiment.logRank(
          rows.select(col("exp"), col("g"), col("t").as("dur"),
            pmod(col("id") * 13, lit(2L)).as("ev")),
          "exp", "g", "dur", "ev").count()
      }
      var ksRows = 0L
      val tKs = time {
        ksRows = Drift.ksDrift(
          rows.select(col("exp").as("key"), col("g"), col("v")),
          "key", "g", "v").count()
      }
      var psiRows = 0L
      val tPsi = time {
        psiRows = Drift.psi(
          rows.select(col("exp").as("key"), col("bucket"), col("p")),
          "key", "bucket", "p").count()
      }
      var cuRows = 0L
      val tCu = time {
        cuRows = Drift.cusum(
          rows.select(pmod(col("id"), lit(64L)).as("key"),
            col("id").as("ts"), col("id").as("tie"), col("v")),
          "key", "ts", "tie", "v", mu = 1000L, kappa = 50L).count()
      }
      // fixed group size 128 (inside the contract), group count scales
      var thRows = 0L
      val tTh = time {
        thRows = Ops.theilSen(
          rows.select(expr("id div 128").as("grp"),
            pmod(col("id"), lit(128L)).as("x"), col("v").as("y")),
          "grp", "x", "y", maxN = 256).count()
      }
      var ndRows = 0L
      val tNd = time {
        ndRows = EvalMetrics.ndcgAtK(
          rows.select(pmod(col("id"), lit(n / 100L)).as("q"),
            (expr("id div " + (n / 100L)) + 1L).as("rank"),
            pmod(col("id") * 3, lit(4L)).as("rel")),
          "q", "rank", "rel", k = 10).count()
      }
      // ledger: ~1k models, every (i, i+j) pair for j in 1..32
      val ledger = spark.range(32000L).select(
        pmod(col("id"), lit(1000L)).as("m_lo_raw"),
        (pmod(col("id"), lit(1000L)) + pmod(col("id"), lit(32L)) + 1L)
          .as("m_hi_raw"))
        .select(col("m_lo_raw").as("m_lo"),
          pmod(col("m_hi_raw"), lit(1000L)).as("m_hi"))
        .filter(col("m_lo") =!= col("m_hi"))
        .select(least(col("m_lo"), col("m_hi")).as("m_lo"),
          greatest(col("m_lo"), col("m_hi")).as("m_hi"))
        .groupBy(col("m_lo"), col("m_hi"))
        .agg(count(lit(1)).as("n"))
        .withColumn("wins_lo", expr("n div 2"))
        .withColumn("wins_hi", col("n") - col("wins_lo"))
        .withColumn("ties", lit(0L))
        .localCheckpoint()
      var btRows = 0L
      val tBt = time {
        btRows = EvalMetrics.bradleyTerry(ledger, iters = 8).count()
      }
      // 16-dim synthetic embeddings: posexplode fan-out is the cost
      val vecs = rows.select(col("exp").as("key"), col("p"),
        array((0 until 16).map(i =>
          (pmod(col("id") * (i + 3), lit(1000L)).cast("double") / 500.0
            - 1.0).cast("float")): _*).as("vec"))
      var edRows = 0L
      val tEd = time {
        edRows = Drift.embeddingDrift(vecs, "key", "p", "vec",
          dim = 16).count()
      }
      var qdRows = 0L
      val tQd = time {
        qdRows = Drift.quantileDrift(
          rows.select(col("exp").as("key"), col("p"), col("v")),
          "key", "p", "v", pcts = Seq(25, 50, 75, 95)).count()
      }
      // cost is b x the base scan by construction — probe at b = 32
      var bcRows = 0L
      val tBc = time {
        bcRows = Experiment.bootstrapCi(
          rows.select(col("exp").as("key"), col("id"), col("v")),
          "key", "id", "v", b = 32).count()
      }

      println(s"""{"probe":"newops17","n":$n,""" +
        s""""logrank_sec":${f"$tLr%.2f"},"lr_rows":$lrRows,""" +
        s""""ks_sec":${f"$tKs%.2f"},"ks_keys":$ksRows,""" +
        s""""psi_sec":${f"$tPsi%.2f"},"psi_rows":$psiRows,""" +
        s""""cusum_sec":${f"$tCu%.2f"},"cusum_rows":$cuRows,""" +
        s""""theilsen_sec":${f"$tTh%.2f"},"th_groups":$thRows,""" +
        s""""ndcg_sec":${f"$tNd%.2f"},"ndcg_queries":$ndRows,""" +
        s""""bt_sec":${f"$tBt%.2f"},"bt_models":$btRows,""" +
        s""""embdrift_sec":${f"$tEd%.2f"},"ed_keys":$edRows,""" +
        s""""quantdrift_sec":${f"$tQd%.2f"},"qd_rows":$qdRows,""" +
        s""""bootstrap32_sec":${f"$tBc%.2f"},"bc_keys":$bcRows}""")
    }
    spark.stop()
  }
}
