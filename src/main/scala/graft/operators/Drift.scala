package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Drift / level-shift detection over keyed time series — the
  * data-quality monitor a pipeline runs over its own telemetry (per-
  * source document lengths, per-host fetch latencies, per-type event
  * values): a producer change shows up as a step in the level long
  * before it shows up as a schema break. Kept deliberately simple and
  * integer-exact — a two-window contrast, the CUSUM-adjacent scan
  * that is expressible as plain windows (no sequential recurrence, so
  * it distributes and oracles).
  */
object Drift {

  /** Two-window level-shift scan: per key, events ordered
    * `(ts, tiebreak)`; at each position the TRAILING `w`-row sum
    * (this row and the w−1 before it) is contrasted with the LEADING
    * `w`-row sum (the w after it). Only positions where BOTH windows
    * are FULL emit — partial windows at the edges would fabricate
    * shifts. Output per emitted position: `key, ts, tie, trail_sum,
    * lead_sum, shift` (= lead − trail, in value units ×w — divide by
    * w caller-side if a per-row mean shift reads better; kept as the
    * integer sum so the lattice stays exact). Callers threshold
    * `abs(shift)` against their tolerance.
    *
    * Values must be non-null and long-castable (refused loudly — a
    * silently skipped null row would shift every window; quantize
    * float metrics upstream, the centi/milli convention).
    *
    * Scale shape: ONE key-partitioned window pass (two ROWS frames
    * over the same (key; ts, tie) sort — one shuffle, one sort);
    * state per position is two running sums. Window length is
    * required ≤ 4096: a level detector needs dozens of rows, not
    * millions, and gigantic frames belong in an aggregation.
    */
  def levelShift(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String, w: Int): DataFrame = {
    require(w >= 2 && w <= 4096, s"w=$w must be in [2, 4096]")
    val v = coalesce(col(valCol).try_cast("long"),
      raise_error(concat(lit("levelShift value '"),
        coalesce(col(valCol).cast("string"), lit("NULL")),
        lit("' is null or not castable to long — a skipped row would " +
          "shift every window"))).cast("long"))
    val byKey = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("tie"))
    val trail = byKey.rowsBetween(-(w - 1), 0)
    val lead = byKey.rowsBetween(1, w)
    df.select(col(keyCol).as("key"), col(tsCol).cast("long").as("ts"),
        col(tieCol).cast("long").as("tie"), v.as("__v"))
      .withColumn("trail_sum", sum(col("__v")).over(trail))
      .withColumn("__trail_n", count(lit(1)).over(trail))
      .withColumn("lead_sum", sum(col("__v")).over(lead))
      .withColumn("__lead_n", count(lit(1)).over(lead))
      .filter(col("__trail_n") === w && col("__lead_n") === w)
      .select(col("key"), col("ts"), col("tie"), col("trail_sum"),
        col("lead_sum"),
        (col("lead_sum") - col("trail_sum")).as("shift"))
  }
}
