package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Persisted inverted text index — the serving layout for corpus search
  * (the text-side mirror of `Similarity.writeIvfIndex`):
  *
  *  - postings `(term, doc_id, tf, dl)` parquet-partitioned by
  *    `bucket = pmod(xxhash64(term), nBuckets)`, so a query touches only
  *    the partitions its terms hash to (PartitionFilters pruning);
  *  - corpus stats (N, avgdl) in a JSON sidecar read at probe time;
  *  - [[search]] scores BM25 over the pruned postings: df per term is
  *    exact (counted from the scanned postings), the per-doc sum is one
  *    small aggregation over |matching postings| rows.
  *
  * Build cost is one explode + one groupBy of the corpus — paid once;
  * every probe afterwards reads ~|queryTerms|/nBuckets of the index.
  * Results match [[Curation.bm25]] on the same corpus exactly (spec-
  * enforced), because both use the same tokenization and formula.
  */
object TextIndex {

  def write(docs: DataFrame, idCol: String, textCol: String, path: String,
      nBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        TextFns.tokens(lower(col(textCol))).as("__toks"))
      .withColumn("dl", size(col("__toks")))
      .persist() // read twice: postings write + stats agg
    // stats FIRST: an empty corpus must refuse before anything touches
    // disk — stats-after-postings left a half-built index (postings dir,
    // no sidecar) whose later probes failed with a confusing missing-
    // stats error instead of this one
    val (n, avgdl) = try {
      val statsRow = base.agg(count(lit(1)).cast("double"),
        avg(col("dl"))).head()
      val n0 = statsRow.getDouble(0)
      require(n0 > 0, "refusing to index an empty corpus (avgdl undefined; " +
        "every probe would score NaN)")
      val postings = base
        .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      // cluster on the bucket before the partitioned write: file count
      // bounded by nBuckets instead of tasks×buckets (the small-files
      // killer at corpus scale)
      postings.repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
      (n0, statsRow.getDouble(1))
    } finally base.unpersist() // even on the empty-corpus refusal
    val sidecar =
      s"""{"n":$n,"avgdl":$avgdl,"nBuckets":$nBuckets}"""
    val p = new org.apache.hadoop.fs.Path(path, "_text_index_stats.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(sidecar.getBytes("UTF-8")) finally os.close()
  }

  /** BM25 top-k over the index for a literal term set. Scans ONLY the
    * partitions the query terms hash to.
    */
  def search(spark: SparkSession, path: String, queryTerms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path, "_text_index_stats.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val raw = try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len); in.readFully(0, buf); new String(buf, "UTF-8")
    } finally in.close()
    def num(key: String): Double =
      ("\"" + key + "\":([-0-9.eE]+)").r.findFirstMatchIn(raw)
        .map(_.group(1).toDouble)
        .getOrElse(throw new IllegalStateException(s"$path: no '$key' in stats"))
    val n = num("n"); val avgdl = num("avgdl"); val nBuckets = num("nBuckets").toLong

    val buckets = queryTerms
      .map(t => math.floorMod(
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType, 42L), nBuckets))
      .distinct
    val hits = spark.read.parquet(path)
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(queryTerms: _*))
    val dfreq = hits.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("__df"))
    hits.join(broadcast(dfreq), "term")
      .withColumn("__idf", log((lit(n) - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0))
      .withColumn("__s", col("__idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy(col("doc_id"))
      .agg(sum(col("__s")).as("bm25"), count(lit(1)).as("n_terms"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }
}
