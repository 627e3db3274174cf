package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured (JSON) column operators — event `props`, API
  * payloads, crawl metadata sidecars. The scale rule for all of them:
  * parse ONCE per row with codegen'd JSON primitives
  * (`get_json_object` / `json_object_keys` — no UDF, no per-row
  * Jackson object churn in Scala code), aggregate map-side, and never
  * ship the raw JSON strings through a shuffle.
  */
object SemiStructured {

  /** Key inventory per group: how many rows carry each top-level JSON
    * key — the first question against an unknown semi-structured
    * column (schema drift, producer skew). Rows whose payload is not
    * a JSON OBJECT (malformed, or a bare scalar) count under the
    * reserved key `__invalid__` so drift to garbage is VISIBLE, not
    * silently dropped. One explode of the (short) key arrays + one
    * map-side-combined count; the JSON strings themselves never
    * shuffle.
    */
  def jsonKeyReport(df: DataFrame, jsonCol: String,
      groupCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        explode(coalesce(json_object_keys(col(jsonCol)),
          array(lit("__invalid__")))).as("key"))
      .groupBy(col("grp"), col("key"))
      .agg(count(lit(1)).as("n"))

  /** Numeric field profile per group for one JSON path: rows present
    * (parseable as a long), rows missing (absent key, malformed
    * payload, or non-numeric value), sum / min / max / distinct count
    * of the present values. `get_json_object` + `try_cast` — ANSI-safe
    * on garbage, codegen'd, one aggregation pass.
    */
  def jsonNumericStats(df: DataFrame, jsonCol: String, path: String,
      groupCol: String): DataFrame = {
    require(path.startsWith("$."), s"path '$path' must start with $$.")
    val v = expr(
      s"try_cast(get_json_object(`$jsonCol`, '$path') AS BIGINT)")
    df.select(col(groupCol).as("grp"), v.as("__v"))
      .groupBy(col("grp"))
      .agg(
        sum(when(col("__v").isNotNull, 1L).otherwise(0L)).as("n_present"),
        sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_missing"),
        coalesce(sum(col("__v")), lit(0L)).as("sum_v"),
        min(col("__v")).as("min_v"),
        max(col("__v")).as("max_v"),
        countDistinct(col("__v")).as("n_distinct"))
  }
}
