package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ops

/** Model-table generation — the reference's `generate_commodities` /
  * `generate_processes` / `generate_storage`
  * (code/lib/generate_intermediate_files.py:549-610, 613-743, 746-871).
  */
object ProcessPipeline {

  /** Existing-capacity cohorts: lifetime filter then (site, type, year)
    * aggregation.
    *  - P7: keep plants still alive at the model year:
    *    `Year + lifetime >= modelYear` (generate_intermediate_files.py:
    *    661-668, 796-804); lifetime comes from the broadcast assumptions.
    *  - A1 cohorts: sum inst_cap per (Site, Type, Year)
    *    (:678-683, 813-817). Conservation of total capacity within the
    *    surviving set is the reference's own printed invariant (:683).
    */
  def capacityCohorts(plants: DataFrame, assumptions: DataFrame,
      modelYear: Int, strict: Boolean = true): DataFrame = {
    // Coverage contract enforced, not just commented: the reference's
    // pandas lookup KeyErrors on a Type missing from assumptions; a silent
    // inner join would instead vanish that plant's capacity. The check is
    // one action over the tiny distinct-Type anti-join; pass strict=false
    // to skip it when the plants lineage is expensive and coverage is
    // already guaranteed upstream.
    if (strict) {
      val missing = plants.select(col("Type")).distinct()
        .join(broadcast(assumptions.select(col("Type"))), Seq("Type"), "left_anti")
        .limit(5).collect().map(_.getString(0))
      require(missing.isEmpty,
        s"assumptions table missing lifetime for plant Type(s): ${missing.mkString(", ")}")
    }
    plants
      .join(broadcast(assumptions.select(col("Type"), col("lifetime"))), Seq("Type"))
      .filter(col("Year") + col("lifetime") >= modelYear)
      .groupBy(col("Site"), col("Type"), col("Year"))
      .agg(sum(col("inst_cap")).as("inst_cap"), count(lit(1)).as("n_plants"))
  }

  /** R5 expansion candidates: every (site × expandable type) gets a
    * zero-capacity row with `cap_max` from assumptions
    * (generate_intermediate_files.py:694-710; offshore special-casing
    * expressed by the caller pre-filtering `sites`).
    */
  def expansionCandidates(sites: DataFrame, expandableTypes: DataFrame): DataFrame =
    sites.crossJoin(broadcast(expandableTypes))
      .withColumn("inst_cap", lit(0.0))
      .withColumn("Year", lit(null).cast("int"))

  /** Existing ⊕ expansion union (U1: align by name, null-fill). */
  def processTable(cohorts: DataFrame, expansion: DataFrame): DataFrame =
    cohorts.unionByName(expansion, allowMissingColumns = true)

  /** Commodity table: sites × commodities cross product (R5,
    * generate_intermediate_files.py:585-592) + per-(site, commodity)
    * annual demand left-joined where applicable (:594-598), missing → 0.
    */
  def generateCommodities(sites: DataFrame, commodities: DataFrame,
      annualDemand: DataFrame): DataFrame =
    sites.crossJoin(broadcast(commodities))
      .join(annualDemand, Seq("Site", "Commodity"), "left")
      .na.fill(0.0, Seq("annual"))

  /** Storage cohorts — same shape as processes with storage attributes
    * joined (J1, :815-833).
    */
  def storageTable(storagePlants: DataFrame, storageAssumptions: DataFrame,
      modelYear: Int): DataFrame =
    capacityCohorts(storagePlants, storageAssumptions, modelYear)
      .join(broadcast(storageAssumptions.drop("lifetime")), Seq("Type"), "left")
}
