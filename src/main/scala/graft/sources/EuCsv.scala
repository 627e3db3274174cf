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
      // Header offset (reference `skiprows`): header-offset inputs are
      // small single-file tables; `wholetext` guarantees true line order
      // regardless of split planning (monotonically_increasing_id is NOT a
      // line number once a file splits — split order is size-sorted).
      val files = spark.read.option("wholetext", "true").text(path)
        .as[String](org.apache.spark.sql.Encoders.STRING).collect()
      require(files.length == 1,
        s"skipRows reader requires a single file; '$path' matched ${files.length} " +
          "(header offsets are ill-defined across part files)")
      val lines = files(0).split("\r?\n", -1).drop(skipRows).filter(_.nonEmpty)
      r.csv(spark.createDataset(lines.toIndexedSeq)(org.apache.spark.sql.Encoders.STRING))
    } else r.csv(path)
  }

  /** Multi-row header scan (S2/S3 capability: the VDEW profiles carry a
    * 2-level header, ENTSO-E Excel a header offset + merged rows,
    * code/lib/correction_functions.py:125-127, 36-37). The `headerRows`
    * header lines are read on the driver (headers only — a few hundred
    * bytes) and flattened to `level1_level2_...` names; the body parses
    * distributed with that explicit schema, all columns string-typed (cast
    * downstream with [[parseEuDoubles]]).
    */
  def readMultiHeader(spark: SparkSession, path: String, headerRows: Int,
      sep: String = ";", skipRows: Int = 0): DataFrame = {
    // Header-offset inputs are small single-file config-style tables
    // (VDEW profiles, ENTSO-E sheets) — `wholetext` reads each through the
    // Hadoop FS layer (works on hdfs/s3a, unlike a driver java.nio read)
    // and guarantees true line order regardless of split planning. The
    // memory bound is the file size, documented and fine for this class of
    // input; large headerless data goes through the plain reader.
    val files = spark.read.option("wholetext", "true").text(path)
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()
    require(files.length == 1,
      s"multi-header reader requires a single file; '$path' matched ${files.length}")
    val lines = files(0).split("\r?\n", -1).drop(skipRows)
    val headerLines = lines.take(headerRows).toSeq
    val levels = headerLines.map(_.split(java.util.regex.Pattern.quote(sep), -1))
    val width = levels.map(_.length).max
    // forward-fill merged header cells within each level (W2 on the header)
    val filled = levels.map { row =>
      var last = ""
      (0 until width).map { i =>
        val v = if (i < row.length) row(i).trim else ""
        if (v.nonEmpty) last = v
        last
      }
    }
    val names = (0 until width).map { i =>
      val parts = filled.map(_(i)).filter(_.nonEmpty).distinct
      if (parts.isEmpty) s"_c$i" else parts.mkString("_")
    }
    // dedupe colliding flattened names positionally
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val uniq = names.map { n =>
      val k = seen.getOrElse(n, 0); seen(n) = k + 1
      if (k == 0) n else s"${n}_$k"
    }
    val schema = StructType(uniq.map(n => org.apache.spark.sql.types.StructField(n,
      org.apache.spark.sql.types.StringType)))
    val body = spark.createDataset(
      lines.drop(headerRows).filter(_.nonEmpty).toIndexedSeq)(
      org.apache.spark.sql.Encoders.STRING)
    spark.read.option("sep", sep).schema(schema).csv(body)
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
