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

  /** HITS hubs & authorities (Kleinberg 1999) on the INTEGER lattice:
    * `iters` synchronous unnormalized rounds from `h₀ = 1`,
    *
    *   a'(v) = Σ_{u→v} h(u)      h'(v) = Σ_{v→w} a'(w)
    *
    * Unnormalized integer HITS has a combinatorial meaning — after
    * `k` rounds `h(v)` counts the alternating out/in paths of length
    * `2k` starting at `v` — and is EXACT: no float normalization, so
    * the result is bit-identical across partitionings and engines
    * (the reason L2-normalized HITS can't be oracle-gated). Rank
    * order equals normalized HITS at every round, which is all a
    * curator consumes. Nodes are derived from the edges; a node with
    * no out-edges keeps hub 0, no in-edges keeps authority 0.
    *
    * Scale shape: each round is two edge-sized equi joins + map-side-
    * combined long sums (the PageRank shape), lineage cut per round.
    * Values grow like (Σdeg²)^k — `iters` is capped at 4 and ANSI
    * overflow throws loudly rather than wrapping (at iters=2 the
    * bound is comfortable for any host graph with degrees ≤ ~10⁴).
    */
  def hitsInt(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 4, s"iters $iters out of range 1..4")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    var hubs = nodes.select(col("node"), lit(1L).as("hub"))
    var auths: DataFrame = null
    var it = 0
    while (it < iters) {
      val aSums = e.join(hubs, e("src") === hubs("node"))
        .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("auth"))
      auths = nodes.select(col("node")).join(aSums, Seq("node"), "left")
        .select(col("node"), coalesce(col("auth"), lit(0L)).as("auth"))
        .localCheckpoint()
      val hSums = e.join(auths.withColumnRenamed("node", "__an"),
          e("dst") === col("__an"))
        .groupBy(col("src").as("node")).agg(sum(col("auth")).as("hub"))
      hubs = nodes.select(col("node")).join(hSums, Seq("node"), "left")
        .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"))
        .localCheckpoint()
      it += 1
    }
    hubs.join(auths, Seq("node")).select(col("node"), col("hub"),
      col("auth"))
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002's hard
    * variant): seed nodes carry pinned labels; every other node adopts
    * the PLURALITY label among its labeled neighbors each synchronous
    * round, ties broken by the SMALLEST label id — integer votes and a
    * deterministic tie-break, so the result is bit-identical across
    * partitionings and engines (the reason this is oracle-gateable
    * where soft/float propagation is not). Edges are treated as
    * UNDIRECTED (symmetrized + deduplicated); a node never reachable
    * from a seed stays unlabeled and is absent from the output.
    *
    * Scale shape: per round one edge-sized equi join (edges ⋈ current
    * labels) + a map-side-combined (node, label) vote count + a
    * struct-max argmax — no windows, no driver state; lineage cut per
    * round. Seeds re-pin by a small outer join. `iters` rounds reach
    * everything within `iters` hops of a seed (label radius, the
    * quantity a curator actually bounds).
    */
  def labelPropInt(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedNodeCol: String, seedLabelCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters $iters out of range 1..10")
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val sd = seeds.select(col(seedNodeCol).cast("long").as("node"),
      col(seedLabelCol).cast("long").as("label")).distinct()
      .localCheckpoint()
    var labels = sd
    var it = 0
    while (it < iters) {
      val votes = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("votes"))
      val adopted = votes
        .groupBy(col("dst").as("node"))
        .agg(max(struct(col("votes"), (-col("label")).as("nl"))).as("__m"))
        .select(col("node"), (-col("__m.nl")).as("label"))
      // seeds stay pinned: a seed's row wins over any adopted label
      labels = sd.unionByName(
          adopted.join(sd.select(col("node")), Seq("node"), "left_anti"))
        .localCheckpoint()
      it += 1
    }
    labels
  }
}
