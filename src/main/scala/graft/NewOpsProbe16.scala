package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-16 operators at 100k / 1M rows. Claims
  * under test:
  *
  *   - Funnel.funnelWithin: the step-timeout predicate adds no
  *     shuffle — same chained-min shape (and cost) as funnel.
  *   - Funnel.sessionStats: one user-partitioned window pass + one
  *     map-side-combined fold — linear in events.
  *   - Experiment.mannWhitneyU: one (exp, value) count + one
  *     exp-partitioned window over DISTINCT values — linear, state
  *     bounded by distinct metric values per experiment.
  *   - Experiment.abTestK / srmCheck: one distinct-user agg + k-row
  *     folds — linear in events, flat in arm count.
  *   - Anonymize.noisySums: one map-side-combined clipped sum —
  *     linear.
  *   - SemiStructured.jsonPathProfile: parse-once variant recursion,
  *     map-side explodes, one count shuffle — linear in payload bytes
  *     at fixed depth.
  *
  * Usage: sbt "runMain graft.NewOpsProbe16" → one JSON line per scale.
  */
object NewOpsProbe16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Anonymize, Experiment, Funnel, SemiStructured}

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(100000, 1000000)) {
      // n events over n/100 users, 5 types, ~minute-spaced timestamps
      val evs = spark.range(n.toLong).select(
        col("id").as("event_id"),
        pmod(col("id"), lit(n / 100L)).as("user_id"),
        element_at(array(lit("view"), lit("click"), lit("buy"),
          lit("view"), lit("err")),
          (pmod(col("id") * 7, lit(5L)) + 1).cast("int")).as("event_type"),
        (col("id") * 60000000000L / (n / 100L)).as("ts"),
        pmod(col("id") * 31, lit(2000L)).as("v"))
        .localCheckpoint()

      var fwRows = 0L
      val tWithin = time {
        fwRows = Funnel.funnelWithin(evs, "user_id", "event_type", "ts",
          Seq("view", "click", "buy"), maxStepGap = 3600000000000L)
          .count()
      }
      var ssRows = 0L
      val tSess = time {
        ssRows = Funnel.sessionStats(evs, "user_id", "ts", "event_id",
          gapNs = 1800000000000L).count()
      }
      var mwRows = 0L
      val tMw = time {
        mwRows = Experiment.mannWhitneyU(
          evs.select(col("event_type"),
            pmod(col("user_id"), lit(2L)).as("g"), col("v")),
          "event_type", "g", "v").count()
      }
      var abRows = 0L
      val tAb = time {
        abRows = Experiment.abTestK(
          evs.withColumn("variant", pmod(col("user_id"), lit(5L))),
          "user_id", "variant", "event_type", "buy").count()
      }
      var srmRows = 0L
      val tSrm = time {
        srmRows = Experiment.srmCheck(
          evs.withColumn("variant", pmod(col("user_id"), lit(4L))),
          "user_id", "variant",
          Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L)).count()
      }
      var nsRows = 0L
      val tNs = time {
        nsRows = Anonymize.noisySums(
          evs.select(pmod(col("user_id"), lit(997L)).as("key"), col("v")),
          "key", "v", clip = 500L).count()
      }
      val payloads = evs.select(col("event_type"),
        concat(lit("{\"u\":"), col("user_id"),
          lit(",\"meta\":{\"k\":"), pmod(col("user_id"), lit(7L)),
          lit(",\"t\":[\"a\","), pmod(col("user_id"), lit(3L)),
          lit("]},\"z\":null}")).as("p"))
      var jpRows = 0L
      val tJp = time {
        jpRows = SemiStructured.jsonPathProfile(payloads, "p",
          "event_type", maxDepth = 4).count()
      }

      println(s"""{"probe":"newops16","n":$n,""" +
        s""""funnel_within_sec":${f"$tWithin%.2f"},"fw_users":$fwRows,""" +
        s""""sessions_sec":${f"$tSess%.2f"},"sessions":$ssRows,""" +
        s""""mannwhitney_sec":${f"$tMw%.2f"},"mw_exps":$mwRows,""" +
        s""""abtestk_sec":${f"$tAb%.2f"},"ab_arms":$abRows,""" +
        s""""srm_sec":${f"$tSrm%.2f"},"srm_arms":$srmRows,""" +
        s""""noisysums_sec":${f"$tNs%.2f"},"ns_keys":$nsRows,""" +
        s""""jsonpaths_sec":${f"$tJp%.2f"},"jp_paths":$jpRows}""")
    }
    spark.stop()
  }
}
