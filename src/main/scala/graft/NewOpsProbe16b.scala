package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-16 SECOND batch (q280–q293) at 100k / 1M
  * rows. Claims under test:
  *
  *   - Graph.triangleCounts: degree-ordered wedge enumeration stays
  *     linear-ish on a bounded-degree graph (the 4-clique+chain
  *     shape); the orientation caps wedge fan-out at O(√m) even on
  *     skew.
  *   - Graph.kCoreInt: each peel is two semi joins + a degree count;
  *     cost = rounds × edge scans, rounds data-bounded (2 here).
  *   - Experiment.survivalKm: one (group, dur) agg + one window +
  *     a per-group bounded fold — linear in subjects.
  *   - Experiment.cuped / diffInDiff: one fold each — linear.
  *   - Drift.benfordCheck / chiSquareDrift: one (key, cell) agg +
  *     key-sized folds — linear.
  *   - Ops.groupOls / seasonalProfile: one map-side-combined agg —
  *     linear.
  *   - Funnel.pathMining: one ranked window + one path count — linear
  *     in events, per-user state bounded by n.
  *   - Curation.trendingTerms / distinctiveTerms: explode + two
  *     token-keyed aggs — linear in tokens.
  *   - EvalMetrics.mrrAtK: one (query) agg + 1-row fold — linear.
  *
  * Usage: sbt "runMain graft.NewOpsProbe16b" → one JSON line per scale.
  */
object NewOpsProbe16b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Curation, Drift, EvalMetrics, Experiment,
      Funnel, Graph, Ops}

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(100000, 1000000)) {
      val evs = spark.range(n.toLong).select(
        col("id").as("event_id"),
        pmod(col("id"), lit(n / 100L)).as("user_id"),
        element_at(array(lit("view"), lit("click"), lit("buy"),
          lit("view"), lit("err")),
          (pmod(col("id") * 7, lit(5L)) + 1).cast("int")).as("event_type"),
        (col("id") * 60000000000L / (n / 100L)).cast("long").as("ts"),
        pmod(col("id") * 31, lit(2000L)).as("v"))
        .localCheckpoint()
      // the q280 graph shape at n/10 nodes: 4-cliques + a chain
      val ids = spark.range(1L, n / 10L + 1).select(col("id").as("c"),
        expr("id div 4").as("g")).localCheckpoint()
      val clique = ids.select(col("g"), col("c").as("src"))
        .join(ids.select(col("g").as("g2"), col("c").as("dst")),
          col("g") === col("g2") && col("src") < col("dst"))
        .select(col("src"), col("dst"))
      val edges = clique.unionByName(
        ids.filter(col("c") < n / 10L)
          .select(col("c").as("src"), (col("c") + 1).as("dst")))
        .localCheckpoint()

      var triRows = 0L
      val tTri = time {
        triRows = Graph.triangleCounts(edges, "src", "dst").count()
      }
      var kcRows = 0L
      val tKc = time {
        kcRows = Graph.kCoreInt(
          edges.filter((col("src") + col("dst")) % 3 =!= 0),
          "src", "dst", k = 2, maxIters = 8).count()
      }
      var asRows = 0L
      val tAs = time {
        asRows = Graph.degreeAssortativity(edges, "src", "dst").count()
      }
      var kmRows = 0L
      val tKm = time {
        kmRows = Experiment.survivalKm(
          evs.groupBy(col("user_id")).agg(
            expr("(max(ts) - min(ts)) div 3600000000000L").as("dur"),
            max(when(col("event_type") === "buy", 1L).otherwise(0L))
              .as("ev")).withColumn("grp", pmod(col("user_id"), lit(2L))),
          "grp", "dur", "ev").count()
      }
      var cuRows = 0L
      val tCu = time {
        cuRows = Experiment.cuped(
          evs.groupBy(col("user_id")).agg(
            sum(when(col("event_type") === "view", col("v"))
              .otherwise(0L)).as("pre"),
            sum(when(col("event_type") === "click", col("v"))
              .otherwise(0L)).as("post")),
          "user_id", "pre", "post").count()
      }
      var bfRows = 0L
      val tBf = time {
        bfRows = Drift.benfordCheck(
          evs.select(col("event_type"), (col("v") * 37 + 1).as("val")),
          "event_type", "val").count()
      }
      var cdRows = 0L
      val tCd = time {
        cdRows = Drift.chiSquareDrift(
          evs.select(col("event_type"),
            pmod(col("user_id"), lit(16L)).as("b"),
            (col("event_id") % 2).as("p")),
          "event_type", "b", "p").count()
      }
      var olsRows = 0L
      val tOls = time {
        olsRows = Ops.groupOls(
          evs.select(col("event_type"),
            pmod(expr("ts div 3600000000000L"), lit(168L)).as("x"),
            col("v")),
          "event_type", "x", "v").count()
      }
      var seaRows = 0L
      val tSea = time {
        seaRows = Ops.seasonalProfile(evs, "event_type", "ts", "v",
          slotNs = 3600000000000L, periodSlots = 24).count()
      }
      var pmRows = 0L
      val tPm = time {
        pmRows = Funnel.pathMining(evs, "user_id", "event_type", "ts",
          "event_id", n = 5, k = 50).count()
      }
      var mrRows = 0L
      val tMr = time {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        mrRows = EvalMetrics.mrrAtK(
          evs.select(col("user_id"), col("ts"), col("event_id"),
            when(col("event_type") === "buy", 1L).otherwise(0L)
              .as("rel")).withColumn("rank", row_number().over(w)),
          "user_id", "rank", "rel", k = 10).count()
      }
      // token-heavy pair: synthetic 8-word docs from the event fields
      val docs = evs.select((col("event_id") % 2).as("p"),
        pmod(col("user_id"), lit(20L)).cast("string").as("grp"),
        concat_ws(" ", col("event_type"),
          pmod(col("v"), lit(500L)).cast("string"),
          pmod(col("v") * 13, lit(700L)).cast("string"),
          pmod(col("user_id"), lit(97L)).cast("string")).as("text"))
        .localCheckpoint()
      var ttRows = 0L
      val tTt = time {
        ttRows = Curation.trendingTerms(docs, "text", "p",
          k = 100, minC1 = 2L).count()
      }
      var dtRows = 0L
      val tDt = time {
        dtRows = Curation.distinctiveTerms(docs, "text", "grp",
          k = 20, minCg = 3L).count()
      }

      println(s"""{"probe":"newops16b","n":$n,""" +
        s""""triangles_sec":${f"$tTri%.2f"},"tri_nodes":$triRows,""" +
        s""""kcore_sec":${f"$tKc%.2f"},"kc_nodes":$kcRows,""" +
        s""""assort_sec":${f"$tAs%.2f"},"as_rows":$asRows,""" +
        s""""survival_sec":${f"$tKm%.2f"},"km_rows":$kmRows,""" +
        s""""cuped_sec":${f"$tCu%.2f"},"cu_rows":$cuRows,""" +
        s""""benford_sec":${f"$tBf%.2f"},"bf_rows":$bfRows,""" +
        s""""chidrift_sec":${f"$tCd%.2f"},"cd_rows":$cdRows,""" +
        s""""ols_sec":${f"$tOls%.2f"},"ols_rows":$olsRows,""" +
        s""""seasonal_sec":${f"$tSea%.2f"},"sea_rows":$seaRows,""" +
        s""""paths_sec":${f"$tPm%.2f"},"pm_rows":$pmRows,""" +
        s""""mrr_sec":${f"$tMr%.2f"},"mrr_rows":$mrRows,""" +
        s""""trending_sec":${f"$tTt%.2f"},"tt_rows":$ttRows,""" +
        s""""distinctive_sec":${f"$tDt%.2f"},"dt_rows":$dtRows}""")
    }
    spark.stop()
  }
}
