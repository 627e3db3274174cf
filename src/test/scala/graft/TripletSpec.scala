package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class TripletSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two tight clusters on orthogonal axes + a lone outlier label:
  // positives must come from the same cluster, hard negatives from the
  // nearest OTHER cluster member
  private def vecs = Seq(
    (1L, Array(1.0, 0.0, 0.0), 0), (2L, Array(0.98, 0.02, 0.0), 0),
    (3L, Array(0.96, 0.04, 0.0), 0),
    (10L, Array(0.0, 1.0, 0.0), 1), (11L, Array(0.02, 0.98, 0.0), 1),
    (20L, Array(0.0, 0.0, 1.0), 2)) // singleton label: no positive
    .toDF("vec_id", "embedding", "label")

  test("positives are same-label nearest, negatives are cross-label " +
      "nearest, singleton labels drop, margins positive for tight clusters") {
    val r = Similarity.tripletMining(vecs, "vec_id", "embedding", "label",
      k = 5, nLists = 1, nProbe = 1).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(5)))).toMap
    // anchor 1: positive = 2 (cos .98/|..| highest same-label), negative
    // from cluster 1 or the outlier — whichever cosine is higher
    assert(r.contains(1L) && r(1L)._1 == 2L)
    assert(Set(10L, 11L, 20L).contains(r(1L)._2))
    // the singleton label 2 has no same-label neighbor -> no triplet
    assert(!r.contains(20L))
    // tight clusters: every emitted margin is positive
    r.values.foreach { case (_, _, m) => assert(m > 0.0) }
    // cluster-1 anchors pair within cluster 1
    assert(r(10L)._1 == 11L && r(11L)._1 == 10L)
  }

  test("bitextMine: planted translation pairs get the top margin, hubs " +
      "rank below; only side-A anchors emit; margins exceed 1e6 for " +
      "true pairs") {
    // side A anchors 1..3 each have ONE near-identical side-B partner
    // (100+i); B also holds a 'hub' (999) moderately close to all of A
    val a = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0), 0),
      (2L, Array(0.0, 1.0, 0.0, 0.0), 0),
      (3L, Array(0.0, 0.0, 1.0, 0.0), 0))
    val b = Seq(
      (101L, Array(0.99, 0.01, 0.0, 0.0), 1),
      (102L, Array(0.01, 0.99, 0.0, 0.0), 1),
      (103L, Array(0.0, 0.01, 0.99, 0.0), 1),
      (999L, Array(0.5, 0.5, 0.5, 0.02), 1)) // the hub
    val vecs = (a ++ b).toDF("vec_id", "embedding", "side")
    val r = Similarity.bitextMine(vecs, "vec_id", "embedding", "side",
      k = 3, nLists = 1, nProbe = 1).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val byA = r.map(x => x._1 -> x).toMap
    // only A-side ids emit rows
    assert(r.map(_._1).toSet == Set(1L, 2L, 3L))
    // each anchor picks its planted partner, not the hub
    assert(byA(1L)._2 == 101L && byA(2L)._2 == 102L && byA(3L)._2 == 103L)
    // true pairs beat the neighborhood average: margin > 1e6
    r.foreach { case (aid, _, _, m) =>
      assert(m > 1000000L, s"anchor $aid margin $m") }
    // cos10k of a near-identical pair is near 10000
    assert(byA(1L)._3 > 9900L)
  }
}
