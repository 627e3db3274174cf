package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - bruteForceTopK: exact cosine top-k — the correctness baseline. Scan is
  *    embarrassingly parallel; the top-k is a `TakeOrderedAndProject`
  *    (per-partition heap + driver merge of k rows), NOT a full sort: at
  *    100 TB only k rows per partition ever move.
  *  - annLsh: random-hyperplane bucket prefilter, then exact rerank within
  *    the probed buckets — trades recall for a ~2^bits scan reduction.
  *  - ivf: k-means-lite inverted-file variant — centroids from a seeded
  *    sample, probe the nProbe nearest lists. Centroid assignment is a
  *    broadcast join; only the probed fraction is scanned.
  */
object Similarity {

  /** Exact top-k by cosine similarity against one query vector (as a literal
    * array column). Deterministic tie-break on id.
    */
  def bruteForceTopK(vecs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    vecs.select(col(idCol),
        VectorFns.cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** LSH-bucketed ANN: only vectors whose random-hyperplane bucket matches
    * the query's bucket (within `probes` extra single-bit-flip probes) are
    * scored. Bucket filter is a codegen'd integer comparison — pushed to the
    * scan; the exact rerank touches ~n/2^bits rows.
    */
  def annLsh(vecs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, nBits: Int = 8, probes: Int = 3): DataFrame = {
    val q = array(query.map(lit): _*)
    val withBucket = vecs.withColumn("__bucket", VectorFns.rpBucket(col(vecCol), nBits))
    // Driver-side: the query's bucket + single-bit-flip neighbor buckets.
    // (Computing one 8-bit key for one literal vector is O(bits*dim).)
    val qBucketRow = vecs.sparkSession.range(1)
      .select(VectorFns.rpBucket(q, nBits).as("b")).head()
    val qBucket = qBucketRow.getLong(0)
    val probeBuckets = qBucket +: (0 until math.min(probes, nBits)).map(b => qBucket ^ (1L << b))
    withBucket.filter(col("__bucket").isin(probeBuckets: _*))
      .select(col(idCol), VectorFns.cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-style ANN: assign every vector to its nearest of `nLists` centroids
    * (broadcast), then scan only the `nProbe` lists nearest the query.
    * Centroids here are a deterministic sample of the data itself (seeded) —
    * a real k-means refinement drops in without changing the query shape.
    * At scale the assignment is computed once and persisted as a partition
    * column, making the probe a partition-pruned scan.
    */
  def ivfTopK(vecs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = vecs.sparkSession
    val q = array(query.map(lit): _*)
    // Deterministic centroid choice: the nLists rows with smallest xxhash64(id).
    val centroids = vecs
      .select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cvec"),
        xxhash64(col(idCol)).as("__h"))
      .orderBy(col("__h")).limit(nLists).drop("__h")
    val cBc = broadcast(centroids)
    // assign: argmin centroid by L2 (window over the small cross product)
    val assigned = vecs.crossJoin(cBc)
      .withColumn("__d", VectorFns.l2Distance(col(vecCol), col("cvec")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("__d").asc, col("cid").asc)))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(vecCol), col("cid").as("list_id"))
    // probe lists nearest to the query (id-type-agnostic: raw values)
    val probeLists = centroids
      .withColumn("__d", VectorFns.l2Distance(q, col("cvec")))
      .orderBy(col("__d").asc, col("cid").asc).limit(nProbe)
      .select(col("cid")).collect().map(_.get(0))
    assigned.filter(col("list_id").isin(probeLists: _*))
      .select(col(idCol), VectorFns.cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** All-pairs cosine above a threshold, LSH-restricted (see Dedup.embeddingNearDup). */
  def similarPairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 8): DataFrame =
    Dedup.embeddingNearDup(vecs, idCol, vecCol, threshold, nBits)
}
