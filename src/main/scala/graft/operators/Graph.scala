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
    val baseInt = ((dampDen - dampNum) * scale) / dampDen
    // ONE-PASS STATE BUILD + OUTDEG IN THE STATE RELATION (round-19
    // optimization, measured): the old prologue ran THREE shuffling
    // jobs — node-set distinct, outdeg groupBy, and (per iteration!) a
    // ranks ⋈ outdeg join whose right side never changes. Tagging each
    // endpoint occurrence with an is-src marker and aggregating once
    // yields the node set AND its out-degree in a single exchange
    // (sum of markers == the old count-per-src; a node never seen as
    // src sums to 0, mapped to the old left join's null), and carrying
    // outdeg through the rank updates drops the per-iteration shape to
    // 1 join + 1 agg. Arithmetic is unchanged — the inner ranks⋈outdeg
    // was exactly the outdeg-not-null filter.
    val parts = e.select(col("src").as("node"), lit(1L).as("__o"))
      .unionByName(e.select(col("dst").as("node"), lit(0L).as("__o")))
    val withExtra = nodesOpt
      .map { case (nd, nc) =>
        parts.unionByName(
          nd.select(col(nc).cast("long").as("node"), lit(0L).as("__o")))
      }
      .getOrElse(parts)
    var state = withExtra.groupBy(col("node"))
      .agg(sum(col("__o")).as("__oc"))
      .select(col("node"), lit(scale).as("rank"),
        when(col("__oc") > 0, col("__oc")).as("outdeg"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val perNode = state.filter(col("outdeg").isNotNull)
        .select(col("node").as("src"), expr("rank div outdeg").as("c"))
      val sums = e.join(perNode, Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("insum"))
      state = state.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(baseInt) +
            expr(s"($dampNum * coalesce(insum, 0L)) div $dampDen"))
            .as("rank"), col("outdeg"))
        .localCheckpoint()
      it += 1
    }
    state.select(col("node"), col("rank"))
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
    val baseInt = ((dampDen - dampNum) * scale) / dampDen
    // one-pass state build + outdeg/is_seed in the state relation —
    // same round-19 restructure as [[pageRankIntImpl]]: endpoint
    // occurrences tagged (is-src, is-seed) and aggregated once replace
    // the node-set distinct + seed left join + outdeg groupBy + a
    // per-iteration ranks ⋈ outdeg join; max of the seed marker is the
    // old dedup'd-seed membership, sum of the src marker the old
    // count-per-src. Identical integer arithmetic.
    val parts = e.select(col("src").as("node"), lit(1L).as("__o"),
        lit(0L).as("__s"))
      .unionByName(e.select(col("dst").as("node"), lit(0L).as("__o"),
        lit(0L).as("__s")))
      .unionByName(seeds.select(col(seedCol).cast("long").as("node"),
        lit(0L).as("__o"), lit(1L).as("__s")))
    var state = parts.groupBy(col("node"))
      .agg(sum(col("__o")).as("__oc"), max(col("__s")).as("is_seed"))
      .select(col("node"), col("is_seed"),
        (col("is_seed") * scale).as("rank"),
        when(col("__oc") > 0, col("__oc")).as("outdeg"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val perNode = state.filter(col("outdeg").isNotNull)
        .select(col("node").as("src"), expr("rank div outdeg").as("c"))
      val sums = e.join(perNode, Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("insum"))
      state = state.join(sums, Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          (col("is_seed") * baseInt +
            expr(s"($dampNum * coalesce(insum, 0L)) div $dampDen"))
            .as("rank"), col("outdeg"))
        .localCheckpoint()
      it += 1
    }
    state.select(col("node"), col("rank"))
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
    // nodes has exactly ONE consumer (the final zero-fill below) — lazy,
    // no checkpoint: materializing it eagerly would add a full shuffle
    // job the single consumer pays anyway. (Round-20: the initial hub
    // state now seeds from DISTINCT SRCS instead of from nodes — the
    // first half-iteration joins on e.src, so dst-only nodes never
    // matched anyway — which keeps this relation truly single-consumer
    // and makes the seed shuffle strictly smaller.)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // SPARSE iteration state (round-19 optimization): the old loop
    // zero-filled hubs/auths against the full node set after EVERY
    // half-iteration — two nodes-sized left joins per iteration whose
    // zeros contribute nothing to the next sum (x·0 terms and absent
    // rows produce identical aggregates). Keep the relations sparse
    // (absent ⇒ 0) through the loop and zero-fill ONCE at the end;
    // integer sums are unchanged, and the per-round checkpoints
    // materialize strictly smaller relations.
    var hubs = e.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1L).as("hub"))
    var auths: DataFrame = null
    var it = 0
    while (it < iters) {
      auths = e.join(hubs, e("src") === hubs("node"))
        .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("auth"))
        .localCheckpoint()
      hubs = e.join(auths.withColumnRenamed("node", "__an"),
          e("dst") === col("__an"))
        .groupBy(col("src").as("node")).agg(sum(col("auth")).as("hub"))
        .localCheckpoint()
      it += 1
    }
    nodes.join(hubs, Seq("node"), "left").join(auths, Seq("node"), "left")
      .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
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
      // seeds stay pinned: a seed's row wins over any adopted label.
      // LAZY checkpoint (round-20): each round's labels has exactly ONE
      // consumer (the next round's vote join, or the caller), so the
      // eager materialization job per round bought nothing — the lazy
      // mark still truncates the Catalyst plan at every round and caches
      // the node-sized relation when the final action computes it, but
      // the whole iteration now runs as ONE job instead of iters+1.
      labels = sd.unionByName(
          adopted.join(sd.select(col("node")), Seq("node"), "left_anti"))
        .localCheckpoint(false)
      it += 1
    }
    labels
  }

  /** Per-node triangle counts + local clustering coefficient — the
    * community-density primitive (spam/link-farm detection ranks hosts
    * by how clique-like their neighborhoods are; a high-PageRank node
    * with zero triangles is a classic farm signature).
    *
    * Edges are read as UNDIRECTED: self-loops dropped, direction and
    * multiplicity collapsed to one canonical `(lo, hi)` edge. Output one
    * row per node that has ≥ 1 edge: `node, degree, triangles,
    * lcc_ppm` with `lcc_ppm = (2·10⁶·triangles) div (degree·(degree−1))`
    * — the local clustering coefficient on the exact ppm lattice
    * (0 when degree < 2). Null src/dst refuse loudly (a silently
    * dropped endpoint would undercount every triangle through it).
    *
    * Scale shape: the degree-ordered node-iterator (Schank–Wagner
    * 2005, "Finding, counting and listing all triangles in large
    * graphs"): each edge is oriented from its lower-(degree, id)
    * endpoint to the higher, so every wedge is enumerated exactly once
    * at its lowest-degree vertex — the orientation caps out-degree at
    * O(√m) on any graph, which is what keeps the wedge join from
    * exploding on skewed (celebrity-node) degree distributions. Three
    * edge-sized equi joins + one map-side-combined count; no all-pairs
    * stage anywhere. The result is orientation-invariant, so the
    * oracle may replay it with the simpler id-ordered triple join.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    def ep(c: String) = coalesce(col(c).cast("long"),
      raise_error(lit(s"triangleCounts: null $c endpoint — a dropped " +
        "endpoint would undercount every triangle through it"))
        .cast("long"))
    val und = edges
      .select(least(ep(srcCol), ep(dstCol)).as("a"),
        greatest(ep(srcCol), ep(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .localCheckpoint()
    // orient each edge from lower (degree, id) to higher
    val da = deg.select(col("node").as("a"), col("degree").as("__da"))
    val db = deg.select(col("node").as("b"), col("degree").as("__db"))
    val aKey = struct(col("__da").as("d"), col("a").as("n"))
    val bKey = struct(col("__db").as("d"), col("b").as("n"))
    val orient = und.join(da, "a").join(db, "b")
      .select(
        when(aKey < bKey, col("a")).otherwise(col("b")).as("s"),
        when(aKey < bKey, bKey).otherwise(aKey).as("t"))
      .localCheckpoint()
    // wedges at the low vertex: (s -> t1), (s -> t2) with t1 < t2 in
    // (degree, id) order; closed iff the oriented edge t1 -> t2 exists
    val e1 = orient.select(col("s"), col("t").as("t1"))
    val e2 = orient.select(col("s"), col("t").as("t2"))
    val wedges = e1.join(e2, "s").filter(col("t1") < col("t2"))
    val tris = wedges.join(
        orient.select(col("s").as("__cs"), col("t").as("__ct")),
        col("t1.n") === col("__cs") && col("t2") === col("__ct"))
      .select(col("s").as("u"), col("t1.n").as("v"),
        col("t2.n").as("w"))
    val perNode = tris.select(col("u").as("node"))
      .union(tris.select(col("v").as("node")))
      .union(tris.select(col("w").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("lcc_ppm",
        when(col("degree") < 2, lit(0L)).otherwise(
          expr("(2000000L * triangles) div (degree * (degree - 1L))")))
  }

  /** k-core decomposition gate (Seidman 1983): the maximal induced
    * subgraph in which every node keeps degree ≥ k — the standard
    * "dense kernel" cut before community analysis (and the spam-farm
    * peel: link farms live in shallow cores). Edges are read
    * UNDIRECTED as in [[triangleCounts]]; output one row per core
    * node with `core_deg`, its degree INSIDE the core subgraph.
    *
    * Synchronous peeling: drop every node under degree k, recompute
    * degrees on the induced subgraph, repeat to fixpoint. Each round
    * is two semi joins (edge relation vs survivors) + one map-side
    * degree count — node-key-partitioned, no all-pairs, lineage cut
    * per round. Convergence is DETECTED (survivor count unchanged —
    * monotone shrinkage makes equal counts equal sets) and bounded by
    * `maxIters` with a LOUD refusal past the bound: peeling depth is
    * small on real (dense-core) graphs but adversarial paths cascade
    * one hop per round, and a silently truncated peel would report a
    * too-large core. One count() action per round, the driver-looped
    * index-lifecycle discipline (≤ maxIters ≤ 64 jobs).
    */
  def kCoreInt(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxIters: Int = 16): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(maxIters >= 1 && maxIters <= 64,
      s"maxIters=$maxIters out of [1, 64]")
    def ep(c: String) = coalesce(col(c).cast("long"),
      raise_error(lit(s"kCoreInt: null $c endpoint")).cast("long"))
    val und = edges
      .select(least(ep(srcCol), ep(dstCol)).as("a"),
        greatest(ep(srcCol), ep(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    def degrees(surv: DataFrame): DataFrame = {
      val e = und
        .join(surv.select(col("node").as("__sa")),
          col("a") === col("__sa"), "left_semi")
        .join(surv.select(col("node").as("__sb")),
          col("b") === col("__sb"), "left_semi")
      e.select(col("a").as("node"))
        .union(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    }
    var surv = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node"))).distinct()
      .localCheckpoint()
    var n = surv.count()
    var it = 0
    var stable = false
    while (!stable && it < maxIters) {
      // lazy checkpoint: the convergence count is a full scan, so it
      // materializes the round's survivors and counts them in ONE job
      // (round-19; the eager form paid a separate job per round)
      val next = degrees(surv).filter(col("deg") >= k)
        .select(col("node")).localCheckpoint(false)
      val nNext = next.count()
      stable = nNext == n
      surv = next
      n = nNext
      it += 1
    }
    if (!stable)
      throw new IllegalStateException(s"kCoreInt: peeling did not " +
        s"converge within maxIters=$maxIters rounds ($n survivors " +
        "still shrinking) — raise maxIters; refusing to report a " +
        "truncated (too-large) core")
    degrees(surv).select(col("node"), col("deg").as("core_deg"))
  }

  /** Edge reciprocity of a DIRECTED graph — what fraction of links
    * are returned (near 0: broadcast/spam link shapes; near 1: social
    * follow-back graphs). Over the DISTINCT non-loop edge relation:
    * `m` edges, `m_recip` whose exact reverse exists, and
    * `ratio_ppm = 10⁶·m_recip div m` (null on an empty graph).
    * Self-loops are EXCLUDED — a loop is trivially its own reverse
    * and would inflate the ratio of exactly the spam hubs this metric
    * screens. One distinct + one self-semi-join + one fold; null
    * endpoints refuse.
    */
  def reciprocity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    def ep(c: String) = coalesce(col(c).cast("long"),
      raise_error(lit(s"reciprocity: null $c endpoint")).cast("long"))
    val e = edges.select(ep(srcCol).as("src"), ep(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint()
    val recip = e.join(
      e.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
    e.agg(count(lit(1)).as("m")).crossJoin(
        recip.agg(count(lit(1)).as("m_recip")))
      .withColumn("ratio_ppm",
        when(col("m") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000L * m_recip) div m")))
  }

  /** Degree assortativity (Newman 2002, "Assortative mixing in
    * networks") — does this graph wire hubs to hubs (r > 0, social
    * graphs) or hubs to leaves (r < 0, the web)? Over the canonical
    * undirected edge set, every edge contributes BOTH orientations
    * (deg_u, deg_v) — the standard symmetrization, which makes
    * Σx = Σy and Σx² = Σy², so Pearson's r needs NO square root:
    *
    *   r = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),   n = 2·m
    *
    * `n, m, num, den` are int64-exact (ANSI overflow the loud guard);
    * `r_ppm` floors the single IEEE division; null when den = 0
    * (regular graphs — r is 0/0 there). One degree aggregation + two
    * edge-sized joins + one fold; null endpoints refuse via the
    * shared canonicalization.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    def ep(c: String) = coalesce(col(c).cast("long"),
      raise_error(lit(s"degreeAssortativity: null $c endpoint"))
        .cast("long"))
    val und = edges
      .select(least(ep(srcCol), ep(dstCol)).as("a"),
        greatest(ep(srcCol), ep(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val pts = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(col("da").as("x"), col("db").as("y"))
    val both = pts.unionByName(
      pts.select(col("y").as("x"), col("x").as("y")))
    both.agg(count(lit(1)).as("n"), sum(col("x")).as("__sx"),
        sum(col("x") * col("y")).as("__sxy"),
        sum(col("x") * col("x")).as("__sxx"))
      .select(col("n"), (col("n") / 2).cast("long").as("m"),
        (col("n") * col("__sxy") - col("__sx") * col("__sx")).as("num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("den"))
      .withColumn("r_ppm",
        when(col("den") === 0, lit(null).cast("long"))
          .otherwise(floor(col("num").cast("double")
            / col("den").cast("double") * 1000000).cast("long")))
  }

  /** Common-neighbor link prediction (Liben-Nowell–Kleinberg 2003):
    * the top `k` NON-ADJACENT node pairs ranked by neighborhood
    * Jaccard,
    *
    *   jaccard_ppm = 10⁶·c div (deg(v) + deg(w) − c),   c = |N(v)∩N(w)|
    *
    * — the "who should be connected" primitive (recommendations,
    * missing-edge detection, near-duplicate entities in a reference
    * graph). Edges undirected/canonicalized as in [[triangleCounts]];
    * output `v < w`, with `common`, both degrees, and the exact-ppm
    * score; ties cut by (score, v, w).
    *
    * Scale shape: candidate pairs are enumerated as WEDGES at their
    * common neighbor (one self-join of the adjacency relation keyed
    * on the center — pairs at distance > 2 never materialize), then
    * one (v, w) count, one anti join against the edge set, one degree
    * join, one TakeOrdered. Wedge fan-out at a center is deg², so a
    * hub would quadratically explode the pair relation: degrees over
    * `maxDeg` REFUSE loudly (cap or sample hubs upstream — a silent
    * cap would invisibly delete exactly the best-connected
    * candidates). `minCommon` prunes the pair relation before the
    * anti join.
    */
  def jaccardLinkPred(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, minCommon: Long = 1L, maxDeg: Long = 4096L): DataFrame = {
    require(k >= 1 && k <= 65536, s"k=$k out of [1, 65536]")
    require(minCommon >= 1, s"minCommon=$minCommon must be >= 1")
    require(maxDeg >= 2, s"maxDeg=$maxDeg must be >= 2")
    def ep(c: String) = coalesce(col(c).cast("long"),
      raise_error(lit(s"jaccardLinkPred: null $c endpoint"))
        .cast("long"))
    val und = edges
      .select(least(ep(srcCol), ep(dstCol)).as("a"),
        greatest(ep(srcCol), ep(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      // the hub refusal is row-forced: an unused projection would be
      // pruned away by Catalyst
      .filter(when(col("deg") > maxDeg,
        raise_error(concat(lit("jaccardLinkPred: node "),
          col("node").cast("string"), lit(" has degree "),
          col("deg").cast("string"),
          lit(s" > maxDeg=$maxDeg — wedge fan-out is deg^2; cap or " +
            "sample hubs upstream"))).cast("boolean"))
        .otherwise(lit(true)))
      .localCheckpoint()
    val adj = und.select(col("a").as("u"), col("b").as("n"))
      .union(und.select(col("b").as("u"), col("a").as("n")))
    val pairs = adj.select(col("u"), col("n").as("v"))
      .join(adj.select(col("u"), col("n").as("w")), "u")
      .filter(col("v") < col("w"))
      .groupBy(col("v"), col("w"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    val nonEdges = pairs.join(und,
      pairs("v") === und("a") && pairs("w") === und("b"), "left_anti")
    nonEdges
      .join(deg.select(col("node").as("v"), col("deg").as("deg_v")), "v")
      .join(deg.select(col("node").as("w"), col("deg").as("deg_w")), "w")
      .withColumn("jaccard_ppm", expr(
        "(1000000L * common) div (deg_v + deg_w - common)"))
      .select(col("v"), col("w"), col("common"), col("deg_v"),
        col("deg_w"), col("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("v"), col("w"))
      .limit(k)
  }

  /** Bounded-hop BFS distances from a seed set — the crawl-depth /
    * blast-radius primitive ("how far is every host from the trusted
    * seeds" feeds TrustRank-style tiering; "what does this host reach
    * in 3 hops" is the takedown impact question). Edges are DIRECTED
    * as given (union the reversed relation for undirected reach);
    * output one row per node reachable within `maxHops`, with its
    * exact hop distance (seeds at 0). Nodes absent from the output
    * are unreachable WITHIN the bound — a node at maxHops+1 and a
    * disconnected one read the same, by design (raise maxHops if the
    * distinction matters); no fabricated sentinel distances.
    *
    * Frontier-synchronous expansion: hop h joins the edge relation
    * against ONLY the hop-(h−1) frontier, anti-joins the settled set,
    * and unions in — each round is one edge-sized equi join + one
    * node-keyed anti join, lineage cut per round; an empty frontier
    * stops early. `maxHops ≤ 32` bounds the driver loop (the
    * index-lifecycle discipline: one count() action per hop).
    */
  def bfsDistanceInt(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 32,
      s"maxHops=$maxHops out of [1, 32]")
    def ep(c: String) = coalesce(col(c).cast("long"),
      raise_error(lit(s"bfsDistanceInt: null $c endpoint")).cast("long"))
    val e = edges.select(ep(srcCol).as("src"), ep(dstCol).as("dst"))
      .distinct().localCheckpoint()
    var settled = seeds.select(
        coalesce(col(seedCol).cast("long"),
          raise_error(lit("bfsDistanceInt: null seed")).cast("long"))
          .as("node"))
      .distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    // Round-19 loop shape: ONE job per hop instead of three. The new
    // frontier is lazily checkpointed and materialized by a FULL count
    // (a partial emptiness probe must not truncate lineage around
    // unmaterialized partitions), which doubles as the loop condition;
    // `settled` is a plain union of the checkpointed frontiers (≤
    // maxHops RDD scans — no eager re-materialization of the growing
    // set per hop).
    var frontier = settled
    var frontierN = frontier.count()
    var h = 1
    while (h <= maxHops && frontierN > 0) {
      val next = e.join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(settled.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(h.toLong))
        .localCheckpoint(false)
      frontierN = next.count() // materializes the lazy checkpoint
      settled = settled.unionByName(next)
      frontier = next
      h += 1
    }
    settled
  }

  /** Newman modularity of a node→community assignment per community
    * — the score that grades what [[labelPropInt]] found (a
    * partition is only "communities" if Q says the within-edge mass
    * beats the degree-product expectation):
    *
    *   Q = Σ_c [ e_c/m − (deg_c / 2m)² ]
    *     = Σ_c (4m·e_c − deg_c²) / (4m²)
    *
    * emitted per community as the EXACT integers `e_in` (edges with
    * both ends in c), `deg_sum` (Σ degrees of c's nodes) and `m`
    * riding along, plus `contrib_ppm = (10⁶·(4m·e_c − deg_c²)) div
    * (4m²)` on DECIMAL(38) — one integral TRUNCATION toward zero per
    * community (contributions can be negative; ≤ 1 ppm each,
    * stated; Σ contrib_ppm ≈ 10⁶·Q, reconstruct exactly from the
    * integers if the ppm tail matters). Edges are canonical
    * undirected (self-loops dropped, duplicates collapsed — the
    * [[triangleCounts]] convention); every node must carry EXACTLY
    * one non-null label, refused loudly (an unlabeled node silently
    * shrinks its community's degree mass). One label join + two
    * community-keyed aggs.
    */
  def modularityPpm(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, nodeCol: String,
      labelCol: String): DataFrame = {
    def ep(c: String) = coalesce(col(c).cast("long"),
      raise_error(lit(s"modularityPpm: null $c endpoint"))
        .cast("long"))
    val und = edges
      .select(least(ep(srcCol), ep(dstCol)).as("a"),
        greatest(ep(srcCol), ep(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val lab = labels.select(
      coalesce(col(nodeCol).cast("long"),
        raise_error(lit("modularityPpm: null node in labels"))
          .cast("long")).as("__node"),
      coalesce(col(labelCol).cast("long"),
        raise_error(lit("modularityPpm: null label — an unlabeled " +
          "node silently shrinks its community's degree mass"))
          .cast("long")).as("__lab"))
    val labDup = lab.groupBy(col("__node"))
      .agg(count(lit(1)).as("__c"), max(col("__lab")).as("__lab"))
      .select(col("__node"), when(col("__c") > 1,
        raise_error(concat(lit("modularityPpm: node "),
          col("__node").cast("string"),
          lit(" labeled more than once"))).cast("long"))
        .otherwise(col("__lab")).as("__lab"))
    val la = labDup.select(col("__node").as("a"),
      col("__lab").as("__la"))
    val lb = labDup.select(col("__node").as("b"),
      col("__lab").as("__lb"))
    val joined = und
      .join(la, Seq("a"), "left").join(lb, Seq("b"), "left")
      .select(
        coalesce(col("__la"), raise_error(concat(
          lit("modularityPpm: node "), col("a").cast("string"),
          lit(" has no label"))).cast("long")).as("__la"),
        coalesce(col("__lb"), raise_error(concat(
          lit("modularityPpm: node "), col("b").cast("string"),
          lit(" has no label"))).cast("long")).as("__lb"))
      .localCheckpoint()
    val m = joined.count()
    val eIn = joined.filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("community"))
      .agg(count(lit(1)).as("e_in"))
    val degSum = joined
      .select(col("__la").as("community"))
      .union(joined.select(col("__lb").as("community")))
      .groupBy(col("community")).agg(count(lit(1)).as("deg_sum"))
    degSum.join(eIn, Seq("community"), "left")
      .select(col("community"), col("deg_sum"),
        coalesce(col("e_in"), lit(0L)).as("e_in"),
        lit(m).as("m"))
      .withColumn("contrib_ppm", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0))" +
          " * (CAST(4 AS DECIMAL(38,0)) * m * e_in" +
          " - CAST(deg_sum AS DECIMAL(38,0)) * deg_sum))" +
          " div (CAST(4 AS DECIMAL(38,0)) * m * m) AS BIGINT)"))
  }
}
