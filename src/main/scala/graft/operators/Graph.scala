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
    * The node set is DERIVED FROM THE EDGES: a node with no edges at
    * all does not appear in the output (it cannot receive or emit any
    * mass). To rank isolated nodes at the base term too, pass an
    * explicit node relation via the `(nodes, nodeCol)` overload /
    * [[pageRankIntWithNodes]].
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
      dampDen: Long = 20L): DataFrame =
    pageRankIntImpl(edges, srcCol, dstCol, None, iters, scale, dampNum,
      dampDen)

  /** [[pageRankInt]] with an EXPLICIT node relation: the edge-derived
    * form ranks only nodes that appear in some edge, so a node with no
    * edges at all (an isolated host) silently vanishes from the output.
    * This overload unions `nodes` into the node set — isolated nodes
    * settle at the base term floor((dampDen−dampNum)·scale/dampDen),
    * exactly like a node with no in-edges (spec-proven equal to the
    * edge-derived form on the shared nodes).
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, iters: Int, scale: Long,
      dampNum: Long, dampDen: Long): DataFrame =
    pageRankIntImpl(edges, srcCol, dstCol, Some((nodes, nodeCol)), iters,
      scale, dampNum, dampDen)

  /** Default-parameter form of the explicit-node overload (Scala allows
    * defaults on only one overload of a name).
    */
  def pageRankIntWithNodes(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, iters: Int,
      scale: Long = 1000000L, dampNum: Long = 17L,
      dampDen: Long = 20L): DataFrame =
    pageRankIntImpl(edges, srcCol, dstCol, Some((nodes, nodeCol)), iters,
      scale, dampNum, dampDen)

  private def pageRankIntImpl(edges: DataFrame, srcCol: String,
      dstCol: String, nodesOpt: Option[(DataFrame, String)], iters: Int,
      scale: Long, dampNum: Long, dampDen: Long): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters $iters out of range 1..50")
    require(scale > 0 && dampNum > 0 && dampDen > dampNum,
      s"need 0 < dampNum < dampDen and scale > 0")

    // materialized once: scanned every iteration
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint()
    val edgeNodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
    val nodes = nodesOpt
      .map { case (nd, nc) =>
        edgeNodes.union(nd.select(col(nc).cast("long").as("node")))
      }
      .getOrElse(edgeNodes)
      .distinct()
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

  /** TrustRank (Gyöngyi, Garcia-Molina, Pedersen, VLDB 2004) — the
    * personalized-PageRank variant web-corpus curation actually uses:
    * teleport mass flows ONLY to a curated seed set, so trust decays
    * with link distance from the seeds and spam islands score zero.
    * Same integer lattice as [[pageRankInt]] (bit-identical across
    * schedules and engines):
    *
    *   r₀(v)  = scale·[v ∈ seeds]
    *   r'(v)  = [v ∈ seeds]·floor((dampDen−dampNum)·scale/dampDen)
    *          + floor(dampNum · Σ_{u→v} floor(r(u)/outdeg(u)) / dampDen)
    *
    * `seeds` is one column of node ids (deduplicated here); seeds not
    * present in the edge relation still hold and emit their base trust.
    */
  def trustRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int,
      scale: Long = 1000000L, dampNum: Long = 17L,
      dampDen: Long = 20L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters $iters out of range 1..50")
    require(scale > 0 && dampNum > 0 && dampDen > dampNum,
      s"need 0 < dampNum < dampDen and scale > 0")

    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint()
    val sd = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(sd.select(col("node"))).distinct()
      .join(sd.withColumn("__seed", lit(1L)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(0L)).as("is_seed"))
      .localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()

    val baseInt = ((dampDen - dampNum) * scale) / dampDen
    var ranks = nodes.select(col("node"),
      (col("is_seed") * scale).as("rank"))
    var it = 0
    while (it < iters) {
      val perNode = ranks.join(outdeg, ranks("node") === outdeg("src"))
        .select(col("src"), expr("rank div outdeg").as("c"))
      val sums = e.join(perNode, Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("insum"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (col("is_seed") * baseInt +
            expr(s"($dampNum * coalesce(insum, 0L)) div $dampDen"))
            .as("rank"))
        .localCheckpoint()
      it += 1
    }
    ranks
  }

  /** Bipartite co-occurrence projection — the item-item / co-citation
    * graph constructor: pairs of LEFT nodes sharing ≥ `minShared`
    * distinct RIGHT neighbors, weighted by the shared count
    * (id1 < id2). The join never goes all-pairs: each right-side hub
    * contributes C(degree, 2) pairs, and `maxHubDegree` drops
    * super-hubs (a hub linking a million left nodes would emit 10¹²
    * pairs — capping hubs is the standard practice in co-occurrence
    * graph construction; a dropped hub's signal is near-zero anyway
    * since sharing a ubiquitous neighbor carries no information —
    * exactly the IDF argument). Only (right, left-id) pairs shuffle;
    * the pair weight aggregation is map-side combined.
    */
  def bipartiteProject(edges: DataFrame, leftCol: String, rightCol: String,
      minShared: Long = 2L, maxHubDegree: Int = 1000): DataFrame = {
    require(minShared >= 1 && maxHubDegree >= 2,
      "minShared >= 1 and maxHubDegree >= 2 required")
    val e = edges.select(col(leftCol).cast("long").as("l"),
      col(rightCol).cast("long").as("r")).distinct()
    // hub-degree guard first, then a codegen'd self-join on the hub key
    // (see Dedup.minhashCandidatePairs: the array-comprehension pair
    // expansion pays O(deg²) interpreted slice copies per hub), with
    // post-join parallelism pinned (size-gated, Dedup.pinIfLarge) so the
    // pair aggregation never single-threads behind a broadcast join on
    // narrow inputs
    val ok = e.groupBy("r").agg(count(lit(1)).as("__d"))
      .filter(col("__d") >= 2 && col("__d") <= maxHubDegree)
      .select(col("r"))
    val keyed = Dedup.pinIfLarge(e.join(ok, Seq("r"), "left_semi"),
      Seq(col("r")))
    keyed.alias("a")
      .join(keyed.alias("b"),
        col("a.r") === col("b.r") && col("a.l") < col("b.l"))
      .groupBy(col("a.l").as("id1"), col("b.l").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
