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

  /** The full named-dataset catalog of the reference
    * (code/config.py:666-781, `output_paths`): every intermediate file the
    * pipeline reads/writes, keyed by its reference path name. Stage
    * variants of the grid/process cleaning share the family schema of
    * their final member (the intra-stage steps only add/fix columns).
    */
  val catalog: Map[String, StructType] = {
    val profile = StructType(Seq(i("t"), d("value")))
    val gridFamily = gridCleaned
    val processFamily = plants
    Map(
      "sites_sub" -> StructType(Seq(s("Site"), i("site_id"), i("slacknode"),
        d("lat"), d("long"), d("area_km2"), s("wkt"))),
      "stats_countries" -> StructType(Seq(s("country"), d("year_total"), d("peak"), d("trough"), d("mean"))),
      "sector_shares_clean" -> sectorShares,
      "load_ts_clean" -> loadTs,
      "df_sector" -> StructType(Seq(s("country"), s("sector"), i("t"), d("sector_value"))),
      "load_sector" -> StructType(Seq(s("country"), s("sector"), d("annual"))),
      "load_landuse" -> StructType(Seq(s("country"), s("lu"), i("t"), d("value"))),
      "intersection_subregions_countries" -> StructType(Seq(
        s("piece"), s("sub"), s("ctry"), s("piece_wkt"), d("piece_area"))),
      "stats_country_parts" -> StructType(Seq(s("piece"), d("zonal_sum"),
        d("zonal_max"), l("zonal_count"))),
      "load_regions" -> demandTs,
      "cleaned_profile_RES" -> profile,
      "cleaned_profile_IND" -> profile,
      "cleaned_profile_COM" -> profile,
      "cleaned_profile_AGR" -> profile,
      "cleaned_profile_STR" -> profile,
      "grid_expanded" -> gridFamily,
      "grid_filtered" -> gridFamily,
      "grid_corrected" -> gridFamily,
      "grid_filled" -> gridFamily,
      "grid_cleaned" -> gridCleaned,
      "grid_shp" -> StructType(gridCleaned.fields.toIndexedSeq :+ s("wkt")),
      "grid_completed" -> transmission,
      "IRENA_summary" -> StructType(Seq(s("country"), s("technology"),
        d("capacity_mw"), d("production_gwh"), d("flh"))),
      "locations_ren" -> StructType(Seq(s("country"), s("technology"),
        i("row"), i("col"), d("inst_cap"), i("rk"))),
      "potential_ren" -> StructType(Seq(s("Site"), s("tech"), d("inst_cap"))),
      "process_raw" -> processFamily,
      "process_filtered" -> processFamily,
      "process_joined" -> processFamily,
      "process_completed" -> processFamily,
      "process_cleaned" -> plants,
      "process_regions" -> cohorts,
      "storage_regions" -> cohorts,
      "commodities_regions" -> StructType(Seq(s("Site"), s("Commodity"), d("annual"))),
      "urbs_model" -> StructType(Seq(s("sheet"))),
      "evrys_model" -> StructType(Seq(s("sheet"))))
  }

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
