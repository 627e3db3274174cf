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
}
