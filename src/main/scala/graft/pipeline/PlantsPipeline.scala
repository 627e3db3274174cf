package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ScalarFns
import graft.operators.Ops

/** Power-plant chain — the reference's entry point 3:
  * `clean_processes_and_storage_FRESNA` (code/lib/correction_functions.py:
  * 389-563), `clean_IRENA_summary` (:686-746) and
  * `distribute_renewable_capacities_IRENA` (:749-806) /
  * `create_shapefiles_of_ren_power_plants`
  * (code/lib/spatial_functions.py:347-477).
  */
object PlantsPipeline {

  /** Clean the FRESNA-style plant registry:
    *  - composite Type = "(Fueltype,Technology,Set)" then dict recode (J10,
    *    correction_functions.py:447-449)
    *  - drop rows with unmapped/null type or zero capacity (P4, :451)
    *  - null names → "unnamed", then per-name cumcount dedup suffix (A7,
    *    :472-476)
    *  - missing year → seeded pseudo-normal imputation around `meanYear`
    *    (:489; partition-stable randn, a declared difference from numpy's
    *    stream)
    */
  def cleanPlants(raw: DataFrame, typeMap: DataFrame, meanYear: Int,
      yearSd: Double = 5.0, seed: Long = 42L): DataFrame = {
    val typed = raw
      .withColumn("Type",
        concat(lit("("), col("Fueltype"), lit(","), col("Technology"),
          lit(","), col("Set"), lit(")")))
    val recoded = Ops.recode(typed, "Type", typeMap, "from_name", "to_name")
      .filter(col("Type").isNotNull && col("inst_cap") > 0)
    val named = recoded
      .withColumn("Name", coalesce(col("Name"), lit("unnamed")))
    val deduped = Ops.dedupSuffix(named, "Name", Seq(col("inst_cap").desc, col("Country").asc))
    deduped.withColumn("Year",
      when(col("Year").isNotNull, col("Year"))
        .otherwise(round(lit(meanYear) + randn(seed) * yearSd).cast("int")))
  }

  /** `clean_IRENA_summary` essentials: forward-fill the merged-cell country
    * column (W2), keep the target year and indicator, compute full-load
    * hours FLH = production/capacity (:717-731).
    * Input: (rowid, country?, technology, indicator, year, value).
    */
  def cleanIrena(raw: DataFrame, year: Int): DataFrame = {
    // global fill is intentional here: the IRENA summary is a small config
    // workbook (hundreds of rows), and merged-cell headers span the sheet
    val filled = Ops.forwardFillGlobal(raw, "rowid", Seq("country"))
    val yeared = filled.filter(col("year") === year)
    val wide = yeared.groupBy(col("country"), col("technology"))
      .pivot("indicator", Seq("capacity_mw", "production_gwh"))
      .agg(first(col("value")))
    wide.withColumn("flh",
      when(col("capacity_mw") > 0, col("production_gwh") * 1000.0 / col("capacity_mw"))
        .otherwise(lit(0.0)))
  }

  /** Unit counts per (country, technology): cap // unit + (cap % unit > 0)
    * (correction_functions.py:797-801).
    */
  def unitCounts(irena: DataFrame, unitSizes: DataFrame): DataFrame =
    irena.join(broadcast(unitSizes), Seq("technology"))
      .withColumn("units", ScalarFns.unitCount(col("capacity_mw"), col("unit_size_mw")))

  /** `create_shapefiles_of_ren_power_plants` core: pick the per-(country,
    * tech) top-`units` pixels by randomized potential
    * (spatial_functions.py:420-444):
    *   score = (1 - r) * minmax(potential) + r * rand(seed)
    * then W3 rank-based top-k with the per-group unit count joined in.
    * pixels: (country, row, col, potential); counts: (country, technology,
    * units, unit_size_mw).
    */
  def placeRenewables(pixels: DataFrame, counts: DataFrame,
      randomness: Double = 0.3, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col("country"))
    val mn = min(col("potential")).over(w)
    val mx = max(col("potential")).over(w)
    val scored = pixels
      .withColumn("norm_pot",
        when(mx === mn, lit(0.5)).otherwise((col("potential") - mn) / (mx - mn)))
      .withColumn("score",
        col("norm_pot") * (1 - randomness) + rand(seed) * randomness)
    val ranked = scored.join(broadcast(counts), Seq("country"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("country"), col("technology"))
          .orderBy(col("score").desc, col("row").asc, col("col").asc)))
      .filter(col("rk") <= col("units"))
    ranked.withColumn("inst_cap",
        least(col("unit_size_mw"), col("capacity_mw") - (col("rk") - 1) * col("unit_size_mw")))
      .select(col("country"), col("technology"), col("row"), col("col"),
        col("inst_cap"), col("rk"))
  }
}
