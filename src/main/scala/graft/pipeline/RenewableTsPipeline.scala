package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `generate_intermittent_supply_timeseries`
  * (code/lib/generate_intermediate_files.py:120-201): ingest pre-computed
  * renewable capacity-factor time series whose identity is packed into
  * composite column names "site.tech.quantile" (parsed with split —
  * SURVEY §2.8 strings), pick the configured quantile per technology,
  * warn-and-drop sites without the requested mode, and normalize so each
  * (site, tech) series' FLH scaling is explicit.
  *
  * Long-form input contract: (series_key, t, value) — the wide file's
  * columns melted upstream at ingestion (R3).
  */
object RenewableTsPipeline {

  /** Parse "site.tech.qXX" composite keys into columns (the reference
    * splits on "." and "_", generate_intermediate_files.py:148-153).
    */
  def parseSeriesKey(ts: DataFrame, keyCol: String = "series_key"): DataFrame =
    ts.withColumn("__p", split(col(keyCol), "\\."))
      .withColumn("Site", element_at(col("__p"), 1))
      .withColumn("tech", element_at(col("__p"), 2))
      .withColumn("quantile", element_at(col("__p"), 3))
      .drop("__p")

  /** Keep the requested quantile per tech (param["ren_pot"]["quantiles"]);
    * a (site, tech) without it is dropped — the reference warns
    * (:161-175); here the dropped set is returned alongside.
    */
  def selectQuantile(parsed: DataFrame, wanted: Map[String, String]): (DataFrame, DataFrame) = {
    val spark = parsed.sparkSession
    import spark.implicits._
    val want = wanted.toSeq.toDF("tech", "quantile")
    val kept = parsed.join(broadcast(want), Seq("tech", "quantile"))
    val missing = parsed.select(col("Site"), col("tech")).distinct()
      .join(kept.select(col("Site"), col("tech")).distinct(),
        Seq("Site", "tech"), "left_anti")
    (kept, missing)
  }

  /** Scale each (site, tech) capacity-factor series to absolute MW with the
    * installed capacity table and emit the model TS (t, Site, tech, mw).
    * U2 "horizontal concat of per-tech blocks" is just this long relation.
    */
  def supplyTimeseries(kept: DataFrame, capacities: DataFrame): DataFrame =
    kept.join(broadcast(capacities), Seq("Site", "tech"))
      .withColumn("mw", col("value") * col("inst_cap"))
      .select(col("t"), col("Site"), col("tech"), col("mw"))
}
