package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Explicit schema registry for the named intermediate datasets — the
  * engine's inversion of the reference's implicit pandas schemas
  * (SURVEY §1.3; dataset list from code/config.py:666-781). Stages
  * validate their inputs at the boundary instead of discovering drift
  * three stages later.
  */
object Schemas {

  private def d(n: String) = StructField(n, DoubleType)
  private def s(n: String) = StructField(n, StringType)
  private def i(n: String) = StructField(n, IntegerType)
  private def l(n: String) = StructField(n, LongType)

  /** clean_GridKit output (grid_cleaned of config.py): one row per
    * (line, type) with endpoint coordinates and electrical attributes.
    */
  val gridCleaned: StructType = StructType(Seq(
    l("l_id"), s("tr_type"), d("V1_long"), d("V1_lat"), d("V2_long"), d("V2_lat"),
    d("voltage_kv"), d("length_km"), d("capacity_mva")))

  /** generate_transmission output (grid_completed). */
  val transmission: StructType = StructType(Seq(
    s("region_end"), s("region_start"), s("tr_type"), d("capacity_mva"),
    d("length_km"), l("n_lines"), d("centroid_km"), d("eff_per_1000km"),
    d("cost_per_mw_km"), d("efficiency"), d("inv_cost")))

  /** Long-format hourly load TS (load_ts): the canonical (key, t, value). */
  val loadTs: StructType = StructType(Seq(s("country"), i("t"), d("value")))

  /** Sector shares (sector_shares). */
  val sectorShares: StructType = StructType(Seq(s("country"), s("sector"), d("share")))

  /** Regionalized demand TS (demand_ts). */
  val demandTs: StructType = StructType(Seq(s("region"), i("t"), d("value")))

  /** Cleaned plant registry (process_cleaned). */
  val plants: StructType = StructType(Seq(
    s("Name"), s("Type"), s("Country"), d("inst_cap"), i("Year")))

  /** Capacity cohorts (process_compact). */
  val cohorts: StructType = StructType(Seq(
    s("Site"), s("Type"), i("Year"), d("inst_cap"), l("n_plants")))

  /** Pixel relation for rasters (one table per map). */
  val pixels: StructType = StructType(Seq(i("row"), i("col"), d("value")))

  /** Validate that `df` carries at least the registered columns with the
    * registered types (extra columns allowed — stages may carry context).
    */
  def requireSchema(df: DataFrame, schema: StructType, dataset: String): DataFrame = {
    val have = df.schema.map(f => f.name -> f.dataType).toMap
    val missing = schema.filter(f => !have.get(f.name).contains(f.dataType))
    require(missing.isEmpty,
      s"dataset '$dataset' schema mismatch; missing/mistyped: " +
        missing.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ") +
        s"; got: ${df.schema.simpleString}")
    df
  }
}
