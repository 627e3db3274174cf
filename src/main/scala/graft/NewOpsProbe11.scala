package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-11 operator family at 10k / 100k / 1M rows.
  * Claims under test:
  *
  *   - EditDistance.edSelfJoin: signature counts are CONSTANTS in τ, so
  *     cost is candidate-pair-bound (clusters of 3 planted here →
  *     linear pair volume), never all-pairs.
  *   - Graph.pageRankInt / trustRankInt: iters × (edge-sized equi join +
  *     map-side-combined long sum) — linear in edges per iteration.
  *   - Dedup.simhashNearDupPairs: per-doc signature kernel + 4-block
  *     equi join — linear when near-dup density is bounded.
  *   - Graph.bipartiteProject: Σ C(hub-degree, 2) pair expansion —
  *     linear when hub degrees are bounded (degree ~5 planted).
  *   - Dedup.multisetMinhashSignatures: per-doc kernel, linear.
  *   - Curation.distinctiveTermsPerGroup: one corpus scan + vocab-sized
  *     joins — the vocabulary saturates, so growth is scan-bound.
  *
  * Usage: sbt "runMain graft.NewOpsProbe11" → one JSON line per scale.
  */
object NewOpsProbe11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Curation, Dedup, EditDistance, Graph}
    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(10000, 100000, 1000000)) {
      // ~60-token docs, constant 4k vocabulary, a source label per doc
      val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(0, 59), " +
          "j -> concat('w', pmod(id * 37 + j * j * 13 + j, 4096))), ' ')")
          .as("text"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
        .localCheckpoint()
      // short keys in planted clusters of 3 (suffix edits within tau=2).
      // Variation is SPREAD across the whole key (two pseudo-random
      // cores) — the realistic record-linkage shape. Keys dominated by a
      // boilerplate prefix/suffix degenerate by construction and need
      // the maxPairsPerBucket valve (see the edSelfJoin scaladoc).
      val keys = spark.range(n.toLong).select(col("id"),
        expr("concat('n', pmod(id div 3 * 7919 + 13, 9999991), ' m', " +
          "pmod(id div 3 * 104729 + 7, 9999991), " +
          "CASE pmod(id, 3) WHEN 0 THEN 'a' WHEN 1 THEN 'b' " +
          "ELSE 'cc' END)").as("key"))
        .localCheckpoint()
      // 2-out digraph on n nodes; bipartite with hub degree ~5
      val edges = spark.range(2L * n).select(
        pmod(col("id"), lit(n.toLong)).as("src"),
        pmod(col("id") * 37 + 11, lit(n.toLong)).as("dst"))
        .localCheckpoint()
      val bip = spark.range(n.toLong).select(
        pmod(col("id"), lit(n.toLong / 10)).as("l"),
        pmod(col("id") * 13, lit(n.toLong / 5)).as("r"))
        .localCheckpoint()

      val tEd = time {
        EditDistance.edSelfJoin(keys, "id", col("key"), tau = 2).count()
      }
      val tPr = time {
        Graph.pageRankInt(edges, "src", "dst", iters = 5).count()
      }
      val tSim = time {
        Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3).count()
      }
      val tBip = time {
        Graph.bipartiteProject(bip, "l", "r", minShared = 1L).count()
      }
      val tBag = time {
        Dedup.multisetMinhashSignatures(docs, "doc_id", "text", 2, 16)
          .select(explode(col("minhash"))).count()
      }
      val tDt = time {
        Curation.distinctiveTermsPerGroup(docs, "text", "source",
          minCount = 5L, liftNum = 11L, liftDen = 10L, topK = 5).count()
      }
      println(f"""{"probe":"newops11","n":$n,"edjoin_sec":$tEd%.2f,""" +
        f""""pagerank_sec":$tPr%.2f,"simhash_pairs_sec":$tSim%.2f,""" +
        f""""biproject_sec":$tBip%.2f,"bag_minhash_sec":$tBag%.2f,""" +
        f""""distinct_terms_sec":$tDt%.2f}""")
    }
    spark.stop()
  }
}
