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

  /** IVF-style ANN: assign every vector to its nearest of `nLists` centroids,
    * then scan only the `nProbe` lists nearest the query. Centroids are a
    * deterministic sample of the data itself (smallest Knuth multiplicative
    * hash of id — SQL-reproducible, so the whole operator has a DuckDB
    * oracle); a real k-means refinement drops in without changing the shape.
    *
    * Scale shape: the assignment is a MAP-SIDE argmin over the broadcast
    * centroid array — zero shuffle, zero row expansion. (The previous
    * crossJoin + row_number() window expanded n×nLists rows AND shuffled
    * them just to take an argmin; at 100 TB that shuffle would have been
    * the whole job.) At scale the assignment is computed once and persisted
    * as a partition column, making the probe a partition-pruned scan.
    */
  def ivfTopK(vecs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val q = array(query.map(lit): _*)
    // Deterministic, SQL-reproducible centroid choice: smallest
    // ((id mod 2^31) * 2654435761) mod 2^32, ties on id. The inner mod
    // keeps the product < 2^62 for arbitrarily large ids (ANSI-safe).
    val idHash = pmod(pmod(col("cid"), lit(2147483648L)) * 2654435761L, lit(4294967296L))
    // numeric-id contract (the SQL-reproducible centroid hash needs it) —
    // enforced loudly instead of NPE-ing on a null cast; null embeddings
    // are dropped up front (they can be near nothing).
    val clean = vecs.filter(col(vecCol).isNotNull)
    val centroids: Array[(Long, Array[Double])] = clean
      .select(col(idCol).cast("long").as("cid"), col(vecCol).cast("array<double>").as("cvec"))
      .orderBy(idHash.asc, col("cid").asc).limit(nLists)
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"ivfTopK requires numeric (long-castable) ids; '$idCol' cast to null")
        (r.getLong(0), r.getSeq[Double](1).toArray)
      }
    def sqDist(a: Seq[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0; val n = math.min(a.length, b.length)
      while (i < n) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // one map-side pass: argmin by squared L2 (ties on smaller cid)
    val bc = vecs.sparkSession.sparkContext.broadcast(centroids)
    val assign = udf { (v: Seq[Double]) =>
      var best = Long.MaxValue; var bestD = Double.PositiveInfinity
      bc.value.foreach { case (cid, cv) =>
        val d = sqDist(v, cv)
        if (d < bestD || (d == bestD && cid < best)) { bestD = d; best = cid }
      }
      best
    }
    // probe lists nearest to the query — same argmin order, driver-side
    val probeLists: Seq[Long] = centroids
      .map { case (cid, cv) => (sqDist(query, cv), cid) }
      .sorted.take(nProbe).map(_._2).toSeq
    clean.withColumn("__list", assign(col(vecCol).cast("array<double>")))
      .filter(col("__list").isin(probeLists: _*))
      .select(col(idCol), VectorFns.cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** All-pairs cosine above a threshold, LSH-restricted (see Dedup.embeddingNearDup). */
  def similarPairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 8): DataFrame =
    Dedup.embeddingNearDup(vecs, idCol, vecCol, threshold, nBits)
}
