package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ScalarFns

/** Sector load-profile cleaners — the reference's five `clean_*_load_profile`
  * stages (code/lib/correction_functions.py:16-259): 15-min→hourly
  * aggregation (A1), normalization to a unit year (A3), the streetlight
  * wrap-around fold (W5), and expansion of per-(daytype, season) daily
  * shapes to the full 8760-hour year via the date dimension.
  */
object ProfilesPipeline {

  /** 15-minute slots → hourly sums (correction_functions.py:133-136 etc.):
    * slot s (1-based) belongs to hour (s-1)/4 + 1. Pure keyed arithmetic —
    * the reference's positional `reshape(-1, 4)` is an anti-pattern on
    * unordered rows.
    */
  def quarterHourlyToHourly(df: DataFrame, slotCol: String, valueCol: String,
      keyCols: Seq[String] = Nil): DataFrame = {
    val keys = keyCols.map(col) :+ (((col(slotCol) - 1) / 4).cast("int") + 1).as("hour")
    df.groupBy(keys: _*).agg(sum(col(valueCol)).as(valueCol))
  }

  /** W5 wrap-around: the streetlight profile's last 15-min slot belongs to
    * the FIRST hour of the day (correction_functions.py:240-241) — fold it
    * around before the hourly aggregation.
    */
  def wrapLastSlot(df: DataFrame, slotCol: String, nSlots: Int): DataFrame =
    df.withColumn(slotCol, when(col(slotCol) === nSlots, 1).otherwise(col(slotCol)))

  /** A3: normalize so the profile sums to 1 over the whole year
    * (correction_functions.py:46-47,81-82,142-143,204-205,246-247).
    */
  def normalizeProfile(df: DataFrame, valueCol: String,
      keyCols: Seq[String] = Nil): DataFrame = {
    val w = if (keyCols.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(keyCols.map(col): _*)
    df.withColumn(valueCol, col(valueCol) / sum(col(valueCol)).over(w))
  }

  /** Expand a per-(daytype, season, hour-of-day) daily shape to the year:
    * build the date dimension for `year` (365 days, leap day dropped like
    * the reference, correction_functions.py:26-33), join on the recodes,
    * emit (t, value) with t = hour-of-year 1..8760.
    */
  def expandDailyToYear(daily: DataFrame, year: Int): DataFrame = {
    val spark = daily.sparkSession
    // day_index is pure calendar arithmetic (dayofyear, minus one after
    // the dropped Feb 29 in leap years) — no global row_number window
    val leap = java.time.Year.of(year).isLeap
    val dayIndex =
      if (leap) when(month(col("d")) >= 3, dayofyear(col("d")) - 1)
        .otherwise(dayofyear(col("d")))
      else dayofyear(col("d"))
    val dates = spark.sql(
      s"SELECT explode(sequence(DATE'$year-01-01', DATE'$year-12-31')) AS d")
      .filter(!(month(col("d")) === 2 && dayofmonth(col("d")) === 29))
      .withColumn("day_index", dayIndex)
      .withColumn("day_type", ScalarFns.dayType(col("d")))
      .withColumn("season", ScalarFns.season(col("d")))
    dates.join(daily, Seq("day_type", "season"))
      .withColumn("t", (col("day_index") - 1) * 24 + col("hour"))
      .select(col("t"), col("value"))
  }

  /** Full residential/commercial-style cleaner: 15-min slots per
    * (day_type, season) → hourly → year expansion → unit normalization.
    */
  def cleanProfile(raw15min: DataFrame, year: Int): DataFrame = {
    val hourly = quarterHourlyToHourly(raw15min, "slot", "value",
      Seq("day_type", "season"))
    val yearTs = expandDailyToYear(hourly.select(col("day_type"), col("season"),
      col("hour"), col("value")), year)
    normalizeProfile(yearTs, "value")
  }
}
