package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential reference of the exact integer recurrence. */
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

  test("multi-edges weight contributions by multiplicity") {
    val multi = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val simple = multi.distinct
    assert(run(multi, 3) == ref(multi, 3))
    assert(run(multi, 3) != run(simple, 3))
  }

  test("rank conservation bound: total never exceeds nodes*scale") {
    val edges = (1L to 20L).flatMap(i => Seq((i, i % 20 + 1), (i, (i * 7) % 20 + 1)))
    val got = run(edges, 5)
    assert(got.values.sum <= 20L * 1000000L)
    assert(got.values.forall(_ >= 150000L))
  }
}
