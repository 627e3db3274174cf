package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential reference of the exact integer recurrence. */
  private def rootCause(t: Throwable): Throwable =
    if (t.getCause == null) t else rootCause(t.getCause)

  private def ref(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000L, dn: Long = 17L, dd: Long = 20L)
      : Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = ((dd - dn) * scale) / dd
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (u, v) => in(v) += r(u) / outdeg(u) }
      r = nodes.map(n => n -> (base + (dn * in(n)) / dd)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    Graph.pageRankInt(df, "src", "dst", iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the sequential integer recurrence on a directed graph") {
    // 1→2, 1→3, 2→3, 3→1, 4→3 (4 is a source; nothing points at 4)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    for (iters <- Seq(1, 3, 7)) {
      assert(run(edges, iters) == ref(edges, iters), s"iters=$iters")
    }
  }

  test("dangling node drops its mass; isolated-in node keeps base term") {
    // 1→2; 2 has no out-edges (dangling), 1 has no in-edges
    val edges = Seq((1L, 2L))
    val got = run(edges, 2)
    assert(got == ref(edges, 2))
    // base term = floor(3*scale/20) = 150000 for the in-less node
    assert(got(1L) == 150000L)
  }

  test("explicit node relation: isolated nodes rank at the base term, " +
      "shared nodes match the edge-derived form exactly") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    val df = edges.toDF("src", "dst")
    // node 9 appears only in the node relation — no edges at all
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("node")
    val withNodes = Graph
      .pageRankIntWithNodes(df, "src", "dst", nodes, "node", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edgeOnly = run(edges, 3)
    // property: restricted to edge-covered nodes, identical
    assert(withNodes.view.filterKeys(_ != 9L).toMap == edgeOnly)
    // isolated node present, at the base term floor(3*scale/20)
    assert(withNodes(9L) == 150000L)
  }

  test("multi-edges weight contributions by multiplicity") {
    val multi = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val simple = multi.distinct
    assert(run(multi, 3) == ref(multi, 3))
    assert(run(multi, 3) != run(simple, 3))
  }

  test("bipartiteProject: pairs weighted by shared distinct neighbors, " +
      "hub cap drops super-hubs") {
    // customers 1..4, suppliers 10..13:
    // 1-{10,11,12}, 2-{10,11}, 3-{11,12}, 4-{13}; duplicate edge 2-10
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L),
      (2L, 10L), (2L, 11L), (3L, 11L), (3L, 12L), (4L, 13L))
      .toDF("l", "r")
    val got = Graph.bipartiteProject(edges, "l", "r", minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((1L, 2L) -> 2L, (1L, 3L) -> 2L, (2L, 3L) -> 1L))
    // minShared filter
    val strict = Graph.bipartiteProject(edges, "l", "r", minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 2L), (1L, 3L)))
    // hub cap: supplier 11 has degree 3 — capping at 2 removes its pairs
    val capped = Graph.bipartiteProject(edges, "l", "r", minShared = 1L,
      maxHubDegree = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L))
  }

  test("rank conservation bound: total never exceeds nodes*scale") {
    val edges = (1L to 20L).flatMap(i => Seq((i, i % 20 + 1), (i, (i * 7) % 20 + 1)))
    val got = run(edges, 5)
    assert(got.values.sum <= 20L * 1000000L)
    assert(got.values.forall(_ >= 150000L))
  }

  private def trustRef(edges: Seq[(Long, Long)], seedIds: Set[Long],
      iters: Int, scale: Long = 1000000L, dn: Long = 17L,
      dd: Long = 20L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2) ++ seedIds).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = ((dd - dn) * scale) / dd
    var r = nodes.map(v => v -> (if (seedIds(v)) scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (u, v) => in(v) += r(u) / outdeg(u) }
      r = nodes.map(v =>
        v -> ((if (seedIds(v)) base else 0L) + (dn * in(v)) / dd)).toMap
    }
    r
  }

  test("trustRank: matches the seeded reference; trust decays with " +
      "distance; unreachable islands score zero") {
    import spark.implicits._
    // chain 1→2→3→4 plus an island 8↔9; seed = {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (8L, 9L), (9L, 8L))
    val seeds = Seq(1L).toDF("id")
    val got = Graph.trustRankInt(edges.toDF("src", "dst"), "src", "dst",
      seeds, "id", iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == trustRef(edges, Set(1L), 4))
    assert(got(1L) > got(2L) && got(2L) > got(3L) && got(3L) > got(4L),
      s"trust must decay along the chain: $got")
    assert(got(8L) == 0L && got(9L) == 0L,
      "nodes unreachable from seeds must hold zero trust")
  }

  test("trustRank: isolated seed (no edges) still holds its base trust") {
    import spark.implicits._
    val got = Graph.trustRankInt(Seq((1L, 2L)).toDF("src", "dst"),
      "src", "dst", Seq(7L).toDF("id"), "id", iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(7L) == 150000L && got.contains(1L) && got.contains(2L))
  }

  /** Sequential reference of the integer HITS recurrence. */
  private def hitsRef(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var h = nodes.map(_ -> 1L).toMap
    var a = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      a = nodes.map(v => v -> edges.filter(_._2 == v).map(e => h(e._1)).sum).toMap
      h = nodes.map(v => v -> edges.filter(_._1 == v).map(e => a(e._2)).sum).toMap
    }
    nodes.map(n => n -> ((h(n), a(n)))).toMap
  }

  test("hitsInt equals the sequential integer recurrence; pure hubs " +
      "and pure authorities get the right zeros") {
    // 4 is a pure hub (no in-edges), 3 a pure authority (no out-edges)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L), (4L, 3L))
    val got = Graph.hitsInt(edges.toDF("src", "dst"), "src", "dst",
        iters = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = hitsRef(edges, 2)
    assert(got == want, s"got $got want $want")
    assert(got(3L)._1 == 0L, "pure authority must have hub 0")
    assert(got(4L)._2 == 0L, "pure hub must have authority 0")
    // duplicate edges collapse (simple-graph semantics)
    val dup = Graph.hitsInt((edges ++ edges).toDF("src", "dst"),
        "src", "dst", iters = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dup == want)
    intercept[IllegalArgumentException] {
      Graph.hitsInt(edges.toDF("src", "dst"), "src", "dst", iters = 9)
    }
  }

  test("labelPropInt: plurality vote with min-label ties, pinned " +
      "seeds, label radius = iters, unreachable nodes absent") {
    // two seed islands: node 1 (label 10), node 6 (label 20); a chain
    // 1-2-3-4 and a triangle 4-5-6; node 9 isolated (edge 9-9 absent)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (4L, 6L), (7L, 8L))
    val seeds = Seq((1L, 10L), (6L, 20L))
    def run(iters: Int) = Graph.labelPropInt(edges.toDF("src", "dst"),
        "src", "dst", seeds.toDF("n", "l"), "n", "l", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r1 = run(1)
    // radius 1: only direct neighbors of seeds get labels
    assert(r1 == Map(1L -> 10L, 6L -> 20L, 2L -> 10L, 5L -> 20L,
      4L -> 20L), s"got $r1")
    val r3 = run(3)
    // seeds stay pinned; 3 hears 10 (via 2) and 20 (via 4) -> one vote
    // each -> MIN label wins; 7/8 unreachable from any seed -> absent
    assert(r3(1L) == 10L && r3(6L) == 20L)
    assert(r3(3L) == 10L, s"tie must break to the smaller label: $r3")
    assert(!r3.contains(7L) && !r3.contains(8L))
  }

  test("triangleCounts: undirected canonicalization (dupes, reverses, " +
      "self-loops), per-node counts, lcc ppm, null refusal") {
    // two triangles {1,2,3} and {4,5,6} joined by the bridge 3-4;
    // reversed/duplicate edges and a self-loop must collapse away
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L), (5L, 5L), (6L, 5L))
    val got = Graph.triangleCounts(edges.toDF("src", "dst"),
        "src", "dst").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1000000L)), 2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L)), 4L -> ((3L, 1L, 333333L)),
      5L -> ((2L, 1L, 1000000L)), 6L -> ((2L, 1L, 1000000L))),
      s"got $got")
    // a 4-clique: every node degree 3, in 3 of the 4 triangles
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b))
    val g4 = Graph.triangleCounts(k4.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(g4 == (1L to 4L).map(n => n -> ((3L, 3L, 1000000L))).toMap)
    val e = intercept[Exception] {
      Graph.triangleCounts(Seq((Some(1L), Some(2L)),
        (Some(2L), Option.empty[Long])).toDF("src", "dst"),
        "src", "dst").collect()
    }
    assert(rootCause(e).getMessage.contains("null dst endpoint"),
      rootCause(e).getMessage)
  }

  test("kCoreInt: cascading peel to the 2-core, empty 3-core, loud " +
      "non-convergence refusal") {
    // triangle 1-2-3 with a tail 3-4-5: the 2-core peels 5 then 4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val core2 = Graph.kCoreInt(edges.toDF("src", "dst"), "src", "dst",
        k = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $core2")
    // k = 3: the triangle's degrees are 2 -> empty core
    assert(Graph.kCoreInt(edges.toDF("src", "dst"), "src", "dst",
      k = 3).collect().isEmpty)
    // the tail cascade needs 3 rounds (peel 5, peel 4, confirm)
    intercept[IllegalStateException] {
      Graph.kCoreInt(edges.toDF("src", "dst"), "src", "dst",
        k = 2, maxIters = 2).collect()
    }
    intercept[IllegalArgumentException] {
      Graph.kCoreInt(edges.toDF("src", "dst"), "src", "dst", k = 0)
    }
  }

  test("degreeAssortativity: star is exactly -1, regular graph is " +
      "null (0/0), exact integer sums") {
    val star = Graph.degreeAssortativity(
      Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst"),
      "src", "dst").collect()(0)
    // n=6 points, sx=12, sxy=18, sxx=30 -> num=-36, den=36, r=-1
    assert((star.getLong(0), star.getLong(1), star.getLong(2),
      star.getLong(3), star.getLong(4)) ==
      ((6L, 3L, -36L, 36L, -1000000L)), s"got $star")
    val tri = Graph.degreeAssortativity(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"),
      "src", "dst").collect()(0)
    assert(tri.getLong(3) == 0L && tri.isNullAt(4), s"got $tri")
  }

  test("jaccardLinkPred: wedge candidates only, adjacent pairs " +
      "excluded, exact ppm, tie order, minCommon and hub refusal") {
    // triangle 1-2-3 with pendant 3-4: candidates are (1,4) and
    // (2,4), each sharing {3}; deg(1)=2, deg(4)=1:
    // 1e6*1 div (2+1-1) = 500000
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.jaccardLinkPred(tri, "src", "dst", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    assert(got == Map((1L, 4L) -> ((1L, 500000L)),
      (2L, 4L) -> ((1L, 500000L))), s"got $got")
    // equal scores cut on (v, w)
    val top = Graph.jaccardLinkPred(tri, "src", "dst", k = 1)
      .collect()(0)
    assert(top.getLong(0) == 1L && top.getLong(1) == 4L)
    // the square's diagonals share TWO neighbors: jaccard = 1
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .toDF("src", "dst")
    val diag = Graph.jaccardLinkPred(sq, "src", "dst", k = 10,
      minCommon = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(diag == Map((1L, 3L) -> 1000000L, (2L, 4L) -> 1000000L))
    // minCommon = 2 empties the triangle+pendant candidates
    assert(Graph.jaccardLinkPred(tri, "src", "dst", k = 10,
      minCommon = 2L).collect().isEmpty)
    val hub = intercept[Exception] {
      Graph.jaccardLinkPred(Seq((1L, 2L), (1L, 3L), (1L, 4L))
        .toDF("src", "dst"), "src", "dst", k = 5, maxDeg = 2L)
        .collect()
    }
    assert(rootCause(hub).getMessage.contains("> maxDeg"),
      rootCause(hub).getMessage)
  }

  test("bfsDistanceInt: exact hop distances, directed edges, hop " +
      "bound cuts, unreachable absent, multi-seed min, null refusal") {
    // chain 1->2->3->4, branch 1->5, back-edge 9->1 (9 unreachable)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (9L, 1L))
    val seeds1 = Seq(Tuple1(1L)).toDF("s")
    def run(hops: Int, seeds: Seq[Long]) =
      Graph.bfsDistanceInt(edges.toDF("src", "dst"), "src", "dst",
        seeds.map(Tuple1(_)).toDF("s"), "s", maxHops = hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d3 = run(3, Seq(1L))
    assert(d3 == Map(1L -> 0L, 2L -> 1L, 5L -> 1L, 3L -> 2L, 4L -> 3L),
      s"got $d3")
    val d2 = run(2, Seq(1L))
    assert(!d2.contains(4L) && d2(3L) == 2L)
    // a second seed at 3 pulls 4 closer; 1's distances keep their min
    val dm = run(3, Seq(1L, 3L))
    assert(dm(3L) == 0L && dm(4L) == 1L && dm(2L) == 1L)
    val e = intercept[Exception] {
      Graph.bfsDistanceInt(edges.toDF("src", "dst"), "src", "dst",
        Seq(Tuple1(Option.empty[Long])).toDF("s"), "s", 2).collect()
    }
    assert(rootCause(e).getMessage.contains("null seed"))
    intercept[IllegalArgumentException] {
      Graph.bfsDistanceInt(edges.toDF("src", "dst"), "src", "dst",
        seeds1, "s", maxHops = 0)
    }
  }

  test("reciprocity: returned-link ratio on the exact ppm lattice, " +
      "loops and duplicates excluded, empty graph null") {
    // (1,2)+(2,1) reciprocate; (2,3) does not; the loop and the dup
    // must not count
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 3L), (2L, 3L))
      .toDF("src", "dst")
    val r = Graph.reciprocity(e, "src", "dst").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((3L, 2L, 666666L)), s"got $r")
    val empty = Graph.reciprocity(Seq((7L, 7L)).toDF("src", "dst"),
      "src", "dst").collect()(0)
    assert(empty.getLong(0) == 0L && empty.isNullAt(2))
    val nul = intercept[Exception] {
      Graph.reciprocity(Seq((Some(1L), Option.empty[Long]))
        .toDF("src", "dst"), "src", "dst").collect()
    }
    assert(rootCause(nul).getMessage.contains("null dst endpoint"))
  }

  test("modularityPpm: two bridged triangles read 178571 each " +
      "(Q = 0.357); unlabeled and double-labeled nodes refuse") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("s", "d")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 2L), (5L, 2L), (6L, 2L)).toDF("node", "lab")
    val got = graft.operators.Graph.modularityPpm(edges, "s", "d",
      labels, "node", "lab").collect()
      .map(r => r.getAs[Long]("community") ->
        ((r.getAs[Long]("e_in"), r.getAs[Long]("deg_sum"),
          r.getAs[Long]("m"), r.getAs[Long]("contrib_ppm")))).toMap
    // per community: (1e6*(4*7*3 - 49)) div (4*49) = 178571
    assert(got(1L) == ((3L, 7L, 7L, 178571L)), s"got $got")
    assert(got(2L) == ((3L, 7L, 7L, 178571L)))
    val miss = intercept[Exception] {
      graft.operators.Graph.modularityPpm(edges, "s", "d",
        labels.filter(col("node") =!= 6L), "node", "lab").collect()
    }
    assert(rootCause(miss).getMessage.contains("has no label"))
    val dup = intercept[Exception] {
      graft.operators.Graph.modularityPpm(edges, "s", "d",
        labels.union(Seq((1L, 2L)).toDF("node", "lab")),
        "node", "lab").collect()
    }
    assert(rootCause(dup).getMessage.contains("labeled more than once"))
  }
}
