package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Dolma-layout JSONL document corpus source/sink — the interchange
  * format LLM curation pipelines actually ship (Soldaini et al. 2024:
  * one JSON object per line with `id`, `text`, `source`, `added`, and a
  * nested `metadata` object; sharded into many files).
  *
  * Spark-first: the sink IS `DataFrameWriter.json` and the scan IS
  * `DataFrameReader.json` — the value added here is the CONTRACT:
  *
  *  - reads take an EXPLICIT schema (default [[dolmaSchema]]), never
  *    schema inference — inference is a full extra pass over the corpus
  *    before the real scan, unacceptable at 100 TB and nondeterministic
  *    under dirty shards;
  *  - JSON is Spark's columnar-pushdown-free format: the reader still
  *    prunes COLUMNS from the parse (only requested fields are
  *    extracted), but there is no predicate pushdown — filter-heavy
  *    work should land the corpus in parquet first (one pass) and query
  *    that;
  *  - compression: prefer many uncompressed-or-zstd shard files; a
  *    `.gz` shard is NOT splittable, so per-file parallelism is the
  *    shard count — Dolma's many-shard layout is what makes gzip
  *    tolerable;
  *  - absent JSON fields read as nulls under the explicit schema, and
  *    the writer omits null fields — a null-field round-trip is
  *    value-exact (q197 gates this together with escaping of newlines,
  *    tabs, quotes, backslashes and astral unicode in `text`).
  */
object JsonlDocs {

  /** The Dolma core fields; extend `metadata` per corpus. */
  val dolmaSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("text", StringType),
    StructField("source", StringType),
    StructField("added", StringType),
    StructField("metadata", StructType(Seq(
      StructField("n_chars", LongType),
      StructField("langs", ArrayType(StringType)))))))

  /** Write a document relation as JSONL shards (one object per line,
    * one file per partition — pre-`repartition` to the shard count you
    * want). `compression`: None (default), or "gzip"/"zstd" etc.
    */
  def write(docs: DataFrame, path: String,
      compression: Option[String] = None): Unit = {
    val w = docs.write.mode("overwrite")
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** Read a JSONL corpus under an explicit schema (no inference pass).
    * Unparseable lines fail the job by default (`mode=FAILFAST` keeps
    * corruption loud); pass `permissive = true` to null-fill bad lines
    * instead (Spark's PERMISSIVE mode).
    */
  def read(spark: SparkSession, path: String,
      schema: StructType = dolmaSchema,
      permissive: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (permissive) "PERMISSIVE" else "FAILFAST")
      .json(path)
}
