package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph ranking over an edge relation — the host/domain
  * quality-ranking primitive of web-corpus curation (Common Crawl-style
  * pipelines rank hosts by link centrality before sampling).
  *
  * PageRank here is computed on an INTEGER lattice so the result is
  * bit-identical regardless of partitioning, scheduling, or engine:
  * ranks live in units of `1/scale`, every per-node contribution is a
  * floor division, and the only cross-partition reduction is a sum of
  * longs (exact and order-independent). That makes the operator
  * oracle-gateable — and deterministic on a 1000-executor cluster, which
  * float PageRank is not.
  */
object Graph {

  /** Fixed-point PageRank, damping `dampNum/dampDen` (default 17/20 =
    * 0.85), `iters` synchronous iterations from a uniform start of
    * `scale` per node:
    *
    *   r'(v) = floor((dampDen−dampNum)·scale / dampDen)
    *         + floor(dampNum · Σ_{u→v} floor(r(u)/outdeg(u)) / dampDen)
    *
    * Dangling nodes (no out-edges) simply do not contribute (their mass
    * is dropped — the standard "lost mass" variant); nodes with no
    * in-edges settle at the base term. Edges are used as given — pass a
    * `distinct()` relation for a simple graph, or keep multi-edges for
    * weighted-by-multiplicity ranking.
    *
    * Scale shape: each iteration is one node-sized join (ranks ⋈ outdeg,
    * both keyed by node) plus one edge-sized equi join and a map-side-
    * combined long-sum aggregation — no all-pairs, no driver state, plan
    * truncated per iteration via localCheckpoint so lineage stays flat.
    * Overflow bound (ANSI mode throws if crossed): requires
    * nodes · scale · dampNum < 2^63 — with the default scale=10^6 that
    * is ~5·10^11 nodes, far above any host graph.
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000L, dampNum: Long = 17L,
      dampDen: Long = 20L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters $iters out of range 1..50")
    require(scale > 0 && dampNum > 0 && dampDen > dampNum,
      s"need 0 < dampNum < dampDen and scale > 0")

    // materialized once: scanned every iteration
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()

    val baseInt = ((dampDen - dampNum) * scale) / dampDen
    var ranks = nodes.select(col("node"), lit(scale).as("rank"))
    var it = 0
    while (it < iters) {
      val perNode = ranks.join(outdeg, ranks("node") === outdeg("src"))
        .select(col("src"), expr("rank div outdeg").as("c"))
      val sums = e.join(perNode, Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("insum"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(baseInt) +
            expr(s"($dampNum * coalesce(insum, 0L)) div $dampDen"))
            .as("rank"))
        .localCheckpoint()
      it += 1
    }
    ranks
  }
}
