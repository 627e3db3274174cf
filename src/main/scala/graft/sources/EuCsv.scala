package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S1/S2/S6: the reference's European CSV dialect — `sep=";"`,
  * `decimal=","`, optional header offset, literal "inf"
  * (code/lib/correction_functions.py:20-22,125-127,347-349; sinks at e.g.
  * :50,320,382,659). Header offsets are handled by a plain row-skip on the
  * scan; decimal commas by a post-scan cast (kept OUT of the reader so the
  * scan itself stays a vanilla pushdown-capable CSV source).
  */
object EuCsv {

  def read(spark: SparkSession, path: String, schema: Option[StructType] = None,
      sep: String = ";", skipRows: Int = 0): DataFrame = {
    var r = spark.read.option("sep", sep).option("header", "true")
    r = schema.map(r.schema).getOrElse(r.option("inferSchema", "true"))
    if (skipRows > 0) {
      // Header offset (reference `skiprows`): drop the first skipRows
      // physical lines, fully distributed — no driver collect. The line
      // index comes from the text source's preserved order within a file;
      // reference inputs with header offsets are single files.
      val raw = spark.read.text(path)
        .withColumn("__rn", monotonically_increasing_id())
        .filter(col("__rn") >= skipRows)
        .select(col("value")).as[String](org.apache.spark.sql.Encoders.STRING)
      r.csv(raw)
    } else r.csv(path)
  }

  /** Parse EU-decimal string columns to double in place. */
  def parseEuDoubles(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, graft.functions.ScalarFns.euToDouble(col(c))))

  /** EU CSV sink: `;` separator, decimal comma on the given double columns. */
  def write(df: DataFrame, path: String, euCols: Seq[String] = Nil): Unit = {
    val out = euCols.foldLeft(df)((d, c) =>
      d.withColumn(c, graft.functions.ScalarFns.euFormat(col(c))))
    out.write.mode("overwrite").option("sep", ";").option("header", "true").csv(path)
  }
}
