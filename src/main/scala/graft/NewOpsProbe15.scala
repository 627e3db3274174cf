package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-15 operators at 100k / 1M rows. Claims
  * under test:
  *
  *   - Funnel.funnel: k−1 chained (filtered scan → join → map-side
  *     min agg) rounds, one row per user between rounds — linear in
  *     events, FLAT in per-user history depth (a power user costs the
  *     same per event as a light one).
  *   - EventStream.hoppingAgg: each event lands in len/slide windows
  *     inside codegen — linear with a constant ×(len/slide) factor.
  *   - Graph.hitsInt / labelPropInt: per-round edge joins + long sums
  *     — linear in edges at fixed iterations.
  *   - EvalMetrics.rougeDedup: |cands|·|pool| broadcast fan-out with
  *     the pool FIXED — linear in candidates.
  *   - Anonymize.kAnonymize: one QI count + broadcast-back join —
  *     linear.
  *
  * Usage: sbt "runMain graft.NewOpsProbe15" → one JSON line per scale.
  */
object NewOpsProbe15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Anonymize, EvalMetrics, Funnel, Graph}
    import graft.streaming.EventStream

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(100000, 1000000)) {
      // n events over n/100 users, 5 types, monotone-ish timestamps
      val evs = spark.range(n.toLong).select(
        pmod(col("id"), lit(n / 100L)).as("user_id"),
        element_at(array(lit("view"), lit("click"), lit("buy"),
          lit("view"), lit("err")),
          (pmod(col("id") * 7, lit(5L)) + 1).cast("int")).as("event_type"),
        (col("id") * 1000L).as("ts"),
        (pmod(col("id"), lit(997L)) * 0.5).as("value"))
        .localCheckpoint()

      var fRows = 0L
      val tFunnel = time {
        fRows = Funnel.funnel(evs, "user_id", "event_type", "ts",
          Seq("view", "click", "buy")).count()
      }

      val evT = evs.select(timestamp_micros(expr("ts div 1000")).as("ts"),
        col("event_type"), col("value"))
      var hRows = 0L
      val tHop = time {
        hRows = EventStream.hoppingAgg(evT, "ts", "event_type", "value",
          "10 minutes", "5 minutes", "1 hour").count()
      }

      // ~n directed edges on n/10 nodes (power-ish fan via modulus)
      val edges = spark.range(n.toLong).select(
        pmod(col("id") * 31, lit(n / 10L)).as("src"),
        pmod(col("id") * 17 + 3, lit(n / 10L)).as("dst"))
        .localCheckpoint()
      var hitsRows = 0L
      val tHits = time {
        hitsRows = Graph.hitsInt(edges, "src", "dst", iters = 2).count()
      }
      val seeds = spark.range(n / 200L).select(
        (col("id") * 200L % (n / 10L)).as("node"),
        pmod(col("id"), lit(20L)).as("label"))
      var lpRows = 0L
      val tLp = time {
        lpRows = Graph.labelPropInt(edges, "src", "dst", seeds, "node",
          "label", iters = 3).count()
      }

      // candidates grow with n, pool fixed at 512
      val docs = spark.range(n / 50L).select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(0, 7), " +
          "j -> concat('w', pmod(id * 13 + j * 7, 64))), ' ')")
          .as("text"))
      val pool = spark.range(512L).select(col("id").as("sid"),
        expr("array_join(transform(sequence(0, 7), " +
          "j -> concat('w', pmod(id * 11 + j * 5, 64))), ' ')")
          .as("stext"))
      var rdRows = 0L
      val tRouge = time {
        rdRows = EvalMetrics.rougeDedup(docs, "doc_id", "text", pool,
          "sid", "stext").count()
      }

      val recs = spark.range(n.toLong).select(col("id"),
        pmod(col("id") * 7, lit(40L)).as("qa"),
        pmod(col("id") * 13, lit(25L)).as("qb"))
      var kaRows = 0L
      val tKa = time {
        kaRows = Anonymize.kAnonymize(recs, Seq("qa", "qb"), k = 100L)
          .count()
      }

      println(s"""{"probe":"newops15","n":$n,""" +
        s""""funnel_sec":${f"$tFunnel%.2f"},"funnel_users":$fRows,""" +
        s""""hop_sec":${f"$tHop%.2f"},"hop_windows":$hRows,""" +
        s""""hits_sec":${f"$tHits%.2f"},"hits_nodes":$hitsRows,""" +
        s""""labelprop_sec":${f"$tLp%.2f"},"labelprop_nodes":$lpRows,""" +
        s""""rouge_sec":${f"$tRouge%.2f"},"rouge_cands":$rdRows,""" +
        s""""kanon_sec":${f"$tKa%.2f"},"kanon_rows":$kaRows}""")
    }
    spark.stop()
  }
}
