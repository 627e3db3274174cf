package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-17 batch-3/4/5/6 operators at 100k / 1M
  * rows. Claims under test:
  *
  *   - Ops.rollingMedian: ONE key-partitioned window sort carrying a
  *     w-element buffer per position — linear in rows at fixed w
  *     (the ≤ 512 contract bounds the buffer, not the data).
  *   - Ops.robustOutliers (and madPerGroup inside it): two rank
  *     windows + one stats join — linear.
  *   - Experiment.holmBonferroni: one family-partitioned rank
  *     window — linear in hypotheses.
  *   - Funnel.markovRemovalEffect: transition relation is channel²-
  *     sized after one user-windowed pass; 8 value-iteration rounds
  *     on channel-sized state — linear in events at fixed channels
  *     (probed at 8 channels).
  *   - Ops.mannKendallTrend: O(n²) pairs per group BY DESIGN under
  *     the loud maxN contract — group size fixed at 128, group
  *     COUNT scales; cost must scale with total pairs.
  *   - EvalMetrics.seasonalNaiveBacktest: two lags off one key
  *     window + one fold — linear.
  *   - Drift.changepointAmoc: one key-windowed prefix pass + one
  *     argmax fold — linear.
  *   - Experiment.sprtBinary: one experiment-partitioned window +
  *     one fold — linear.
  *   - Ops.associationRules: distinct-membership agg + basket-keyed
  *     pair join — linear in baskets at fixed items/basket.
  *   - EvalMetrics.wordErrorRate: row-local (tokenize → ASCII encode
  *     → codegen'd levenshtein), no shuffle — linear in pairs.
  *   - EvalMetrics.isotonicFitMicro: n³/6 relation per key under the
  *     loud maxN=64 contract — key size fixed at 32, key COUNT
  *     scales; cost must scale with keys.
  *
  * Usage: sbt "runMain graft.NewOpsProbe17b" → one JSON line per
  * scale.
  */
object NewOpsProbe17b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Drift, EvalMetrics, Experiment, Funnel, Ops}

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(100000, 1000000)) {
      val rows = spark.range(n.toLong).select(
        col("id"),
        pmod(expr("id div 2"), lit(8L)).as("key"),
        pmod(col("id"), lit(2L)).as("g"),
        pmod(col("id") * 31, lit(2000L)).as("v"),
        col("id").as("ts"),
        pmod(col("id"), lit(5L)).as("stratum"))
        .localCheckpoint()

      var rmRows = 0L
      val tRm = time {
        rmRows = Ops.rollingMedian(rows, "key", "ts", "id", "v", 5)
          .count()
      }
      var roRows = 0L
      val tRo = time {
        roRows = Ops.robustOutliers(rows, "key", "id", "v", 1500L)
          .count()
      }
      var holmRows = 0L
      val tHolm = time {
        holmRows = Experiment.holmBonferroni(
          rows.select(col("key"), col("id"),
            pmod(col("id") * 7919, lit(1000001L)).as("p")),
          "key", "id", "p", 50000L).count()
      }
      // markov: 8 channels + a conversion type, ~n events over n/20
      // users in time order
      var mkRows = 0L
      val tMk = time {
        mkRows = Funnel.markovRemovalEffect(
          rows.select(pmod(col("id"), lit((n / 20).toLong)).as("u"),
            when(pmod(col("id") * 13, lit(9L)) === 0, lit("conv"))
              .otherwise(concat(lit("ch"),
                pmod(col("id") * 13, lit(9L)).cast("string")))
              .as("et"),
            col("ts"), col("id")),
          "u", "et", "ts", "id", "conv").count()
      }
      // mann-kendall: groups of 128, group count scales with n
      var mkdRows = 0L
      val tMkd = time {
        mkdRows = Ops.mannKendallTrend(
          rows.select(expr("id div 128").as("grp"), col("ts"),
            col("id"), col("v")),
          "grp", "ts", "id", "v").count()
      }
      var btRows = 0L
      val tBt = time {
        btRows = EvalMetrics.seasonalNaiveBacktest(rows, "key", "ts",
          "id", "v", m = 24).count()
      }
      var amRows = 0L
      val tAm = time {
        amRows = Drift.changepointAmoc(rows, "key", "ts", "id", "v",
          minSeg = 24).count()
      }
      var spRows = 0L
      val tSp = time {
        spRows = Experiment.sprtBinary(
          rows.select(col("key"), col("ts"), col("id"),
            pmod(col("id") * 13, lit(2L)).as("c")),
          "key", "ts", "id", "c", 480L, 520L, 50L, 100L).count()
      }
      // association rules: n/10 baskets x <= 10 items from a
      // 40-item catalog
      var arRows = 0L
      val tAr = time {
        arRows = Ops.associationRules(
          rows.select(expr("id div 10").as("bk"),
            concat(lit("i"), pmod(col("id") * 17, lit(40L))
              .cast("string")).as("it")),
          "bk", "it", minSupportPpm = 0L, maxItemsPerBasket = 16)
          .count()
      }
      // WER: n/10 pairs of 8-token sentences over a tiny vocab
      var werRows = 0L
      val tWer = time {
        val sent = (c: org.apache.spark.sql.Column) =>
          concat_ws(" ", (0 until 8).map(j =>
            concat(lit("w"), pmod(c * (j + 3), lit(30L))
              .cast("string"))): _*)
        werRows = EvalMetrics.wordErrorRate(
          spark.range((n / 10).toLong).select(col("id"),
            sent(col("id")).as("h"), sent(col("id") + 1).as("r")),
          "id", "h", "r").count()
      }
      // isotonic: keys of 32 positions, key count scales with n/100
      var isoRows = 0L
      val tIso = time {
        isoRows = EvalMetrics.isotonicFitMicro(
          spark.range((n / 100).toLong * 32).select(
            expr("id div 32").as("k"), pmod(col("id"), lit(32L))
              .as("t"), col("id").as("e"),
            pmod(col("id") * 31, lit(2000L)).as("v")),
          "k", "t", "e", "v", maxN = 32).count()
      }
      println(f"""{"probe":"newops17b","n":$n,""" +
        f""""rollmed_sec":$tRm%.2f,"rm_rows":$rmRows,""" +
        f""""outlier_sec":$tRo%.2f,"ro_rows":$roRows,""" +
        f""""holm_sec":$tHolm%.2f,"holm_rows":$holmRows,""" +
        f""""markov_sec":$tMk%.2f,"mk_rows":$mkRows,""" +
        f""""mannkendall_sec":$tMkd%.2f,"mk_groups":$mkdRows,""" +
        f""""backtest_sec":$tBt%.2f,"bt_keys":$btRows,""" +
        f""""amoc_sec":$tAm%.2f,"amoc_keys":$amRows,""" +
        f""""sprt_sec":$tSp%.2f,"sprt_keys":$spRows,""" +
        f""""assoc_sec":$tAr%.2f,"ar_rules":$arRows,""" +
        f""""wer_sec":$tWer%.2f,"wer_pairs":$werRows,""" +
        f""""iso_sec":$tIso%.2f,"iso_rows":$isoRows}""")
    }
    spark.stop()
  }
}
