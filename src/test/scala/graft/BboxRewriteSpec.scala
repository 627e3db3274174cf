package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.geo.GeoFns
import graft.operators.SpatialOps
import graft.plans.BboxJoinRewrite

/** SURVEY §4b optimizer rule: a NAIVE st_contains join (no hand-applied
  * bbox discipline) must be rewritten to the bbox-prefiltered form and
  * stay result-identical to the engine's own pointInPolygonJoin.
  */
class BboxRewriteSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    BboxJoinRewrite.install(s)
    s
  }
  import spark.implicits._

  private def fixtures() = {
    val polys = Seq(
      ("r0", "POLYGON ((0 0, 20 0, 20 100, 0 100, 0 0))"),
      ("r1", "POLYGON ((20 0, 40 0, 40 100, 20 100, 20 0))"),
      ("r2", "POLYGON ((40 0, 60 0, 60 100, 40 100, 40 0))")).toDF("region", "wkt")
    val pts = spark.range(500).select(col("id"),
      (col("id") % 90).cast("double").as("x"),
      ((col("id") * 7) % 100).cast("double").as("y"))
    (pts, polys)
  }

  test("naive st_contains join is rewritten: bbox conjuncts + per-row bbox project") {
    val (pts, polys) = fixtures()
    val naive = pts.join(polys,
      GeoFns.stContainsXY(col("wkt"), col("x"), col("y")))
    val optimized = naive.queryExecution.optimizedPlan.toString
    assert(optimized.contains("__bb_xmin") && optimized.contains("__bb_ymax"),
      s"bbox prefilter columns missing from optimized plan:\n$optimized")
    // the rewrite must not leak marker columns into the result
    assert(!naive.columns.exists(_.startsWith("__bb_")))
    // marker appears exactly once per bound — idempotent under the
    // optimizer's fixed-point batches
    assert(optimized.sliding("__bb_xmin".length).count(_ == "__bb_xmin") <= 4,
      s"rule fired repeatedly:\n$optimized")
  }

  test("rewritten join is result-identical to pointInPolygonJoin") {
    val (pts, polys) = fixtures()
    val naive = pts.join(polys,
        GeoFns.stContainsXY(col("wkt"), col("x"), col("y")))
      .select(col("id"), col("region"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val engine = SpatialOps.pointInPolygonJoin(pts, "x", "y", polys, "wkt")
      .select(col("id"), col("region"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(naive == engine && naive.nonEmpty)
  }

  test("left-outer keeps unmatched points; polygon side may be either input") {
    val (pts, polys) = fixtures()
    // points at x in [60, 90) fall outside every polygon
    val lo = pts.join(polys,
      GeoFns.stContainsXY(col("wkt"), col("x"), col("y")), "left")
    assert(lo.queryExecution.optimizedPlan.toString.contains("__bb_xmin"))
    assert(lo.count() == 500 + lo.filter(col("region").isNotNull).count()
      - lo.filter(col("region").isNotNull).select("id").distinct().count())
    assert(lo.filter(col("region").isNull).count() ==
      pts.filter(col("x") >= 60).count())
    // polygon side as the LEFT input also rewrites
    val swapped = polys.join(pts,
      GeoFns.stContainsXY(col("wkt"), col("x"), col("y")))
    assert(swapped.queryExecution.optimizedPlan.toString.contains("__bb_xmin"))
    assert(swapped.count() == pts.filter(col("x") < 60).count())
  }

  test("NOT/OR-wrapped st_contains passes through — bbox not implied") {
    val (pts, polys) = fixtures()
    // anti-containment: a point outside the bbox SATISFIES the condition;
    // injecting the prefilter would silently drop it
    val anti = pts.join(polys,
      !GeoFns.stContainsXY(col("wkt"), col("x"), col("y")))
    assert(!anti.queryExecution.optimizedPlan.toString.contains("__bb_"))
    // every (point far right of all polygons, polygon) pair must survive
    val farRight = pts.filter(col("x") >= 60).count()
    assert(anti.filter(col("x") >= 60).count() == farRight * 3)
  }

  test("hand-optimized pointInPolygonJoin is not double-rewritten") {
    val (pts, polys) = fixtures()
    val p = SpatialOps.pointInPolygonJoin(pts, "x", "y", polys, "wkt")
    assert(!p.queryExecution.optimizedPlan.toString.contains("__bb_"),
      "the rule must not stack a second bbox prefilter on SpatialOps joins")
  }

  test("non-spatial joins pass through untouched") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "va")
    val b = Seq((1, "p"), (3, "q")).toDF("j", "vb")
    val plain = a.join(b, col("k") === col("j"))
    assert(!plain.queryExecution.optimizedPlan.toString.contains("__bb_"))
    assert(plain.count() == 1)
  }
}
