package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the engine's long time-series relation
  * (t/ts, key, value) — SURVEY §2.10. The same transforms run in batch and
  * streaming: pass a `readStream` DataFrame and these become incremental
  * with watermark-bounded state; pass a batch DataFrame and they are plain
  * aggregations (used by the oracle-checked batch queries).
  *
  * Scale posture: tumbling-window aggregation state is bounded by
  * (watermark horizon / slide) × #keys; the shuffle is keyed on
  * (window, key) exactly like the batch groupBy.
  */
object EventStream {

  /** Tumbling event-time aggregation (the streaming form of the hourly A1
    * group-bys). `tsCol` must be a TimestampType column.
    */
  def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("total"))

  /** Streaming dedup on a content key within the watermark horizon —
    * the streaming tier of the dedup family (exact dedup applied to an
    * unbounded corpus: state holds one entry per key inside the horizon).
    */
  def streamingDedup(docs: DataFrame, tsCol: String, hashCols: Seq[String],
      watermark: String): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(hashCols)

  final case class Point(key: String, ts: java.sql.Timestamp, value: Double)
  final case class FillState(lastGood: Double)
  final case class Filled(key: String, ts: java.sql.Timestamp, value: Double,
      filled: Boolean)

  /** Stateful gap fill — the streaming form of W1
    * (code/lib/correction_functions.py:315-318 reproduced as keyed state):
    * zero readings are replaced by the last good value seen for the key.
    * State per key is ONE double — bounded regardless of stream length.
    */
  def statefulGapFill(points: org.apache.spark.sql.Dataset[Point])
      : org.apache.spark.sql.Dataset[Filled] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import points.sparkSession.implicits._
    points.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[Point], state: GroupState[FillState]) => {
          var last = state.getOption.map(_.lastGood)
          val out = rows.toSeq.sortBy(_.ts.getTime).map { p =>
            if (p.value == 0.0 && last.isDefined) Filled(key, p.ts, last.get, filled = true)
            else {
              if (p.value != 0.0) last = Some(p.value)
              Filled(key, p.ts, p.value, filled = false)
            }
          }
          last.foreach(v => state.update(FillState(v)))
          out.iterator
        })
  }
}
