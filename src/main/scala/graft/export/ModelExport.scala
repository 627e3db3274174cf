package graft.export

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Model-sheet export — the reference's `generate_urbs_model` /
  * `generate_evrys_model` (code/lib/generate_models.py): hard-coded
  * projection/rename lists per sheet (P1), wide pivots of the TS relation
  * at the very edge (R2/R4 — the ONLY place the engine goes wide), and a
  * sheet-per-dataset sink (S10 realized as one CSV directory per sheet;
  * XLSX packaging is a format detail outside the engine).
  */
object ModelExport {

  /** urbs "Commodity" sheet projection (generate_models.py:49-66 shape):
    * (Site, Commodity, Type, price, max, maxperhour).
    */
  def urbsCommodity(commodities: DataFrame): DataFrame =
    commodities.select(
      col("Site"), col("Commodity"),
      coalesce(col("com_type"), lit("Stock")).as("Type"),
      coalesce(col("price"), lit(0.0)).as("price"),
      coalesce(col("max"), lit(Double.PositiveInfinity)).as("max"),
      coalesce(col("maxperhour"), lit(Double.PositiveInfinity)).as("maxperhour"))

  /** urbs "Process" sheet (generate_models.py:45-86 shape). */
  def urbsProcess(processes: DataFrame): DataFrame =
    processes.select(
      col("Site"), col("Type").as("Process"),
      coalesce(col("inst_cap"), lit(0.0)).as("inst-cap"),
      coalesce(col("cap_max"), col("inst_cap"), lit(0.0)).as("cap-up"),
      coalesce(col("inv_cost"), lit(0.0)).as("inv-cost"),
      coalesce(col("fix_cost"), lit(0.0)).as("fix-cost"),
      coalesce(col("var_cost"), lit(0.0)).as("var-cost"))

  /** urbs "Transmission" sheet (generate_models.py:89-114 shape). */
  def urbsTransmission(transmission: DataFrame): DataFrame =
    transmission.select(
      col("region_start").as("Site In"), col("region_end").as("Site Out"),
      col("tr_type").as("Transmission"),
      lit("Elec").as("Commodity"),
      coalesce(col("efficiency"), lit(1.0)).as("eff"),
      coalesce(col("inv_cost"), lit(0.0)).as("inv-cost"),
      coalesce(col("capacity_mva"), lit(0.0)).as("inst-cap"),
      coalesce(col("capacity_mva"), lit(0.0)).as("cap-up"))

  /** Demand sheet: the single place the long TS relation goes wide —
    * one row per t, one column per site (generate_models.py:159-166).
    * Site list is passed explicitly so the column set is deterministic.
    */
  def demandWide(demandTs: DataFrame, sites: Seq[String]): DataFrame =
    demandTs.groupBy(col("t"))
      .pivot("region", sites)
      .agg(first(col("value")))
      .na.fill(0.0, sites)
      .orderBy(col("t"))

  /** evrys "Process" sheet (generate_models.py:241-277 shape): same data,
    * different projection/rename list than urbs.
    */
  def evrysProcess(processes: DataFrame): DataFrame =
    processes.select(
      col("Site").as("sit"), col("Type").as("pro"),
      coalesce(col("inst_cap"), lit(0.0)).as("instcap"),
      coalesce(col("cap_max"), col("inst_cap"), lit(0.0)).as("capup"),
      coalesce(col("Year"), lit(0)).as("year"))

  /** evrys demand TS (generate_models.py:360-368): the reference MELTS its
    * wide sheet back to long "(t, sit, value)" — which is this engine's
    * native layout, so the export is a projection, not a reshape.
    */
  def evrysDemand(demandTs: DataFrame): DataFrame =
    demandTs.select(col("t"), col("region").as("sit"), col("value"))

  /** S10: one sheet = one CSV directory under `dir/<sheet>` + S11 sidecar
    * (the distributed-sink form; arbitrarily large sheets).
    */
  def writeWorkbook(dir: String, sheets: Map[String, DataFrame],
      params: Map[String, String] = Map.empty): Unit = {
    sheets.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(s"$dir/$name")
      graft.sources.JsonSidecar.write(s"$dir/$name", params,
        inputPaths = Nil, caller = "ModelExport.writeWorkbook")
    }
  }

  /** S10: one real multi-sheet .xlsx + S11 sidecar — the reference's actual
    * output format (generate_models.py writes urbs/evrys workbooks via
    * xlsxwriter). Sheets are driver-collected: model workbooks are small
    * final artifacts; big relations use [[writeWorkbook]].
    */
  def writeWorkbookXlsx(spark: org.apache.spark.sql.SparkSession, path: String,
      sheets: Seq[(String, DataFrame)],
      params: Map[String, String] = Map.empty): Unit = {
    graft.sources.ExcelTable.write(spark, path, sheets)
    graft.sources.JsonSidecar.write(path, params,
      inputPaths = Nil, caller = "ModelExport.writeWorkbookXlsx")
  }
}
