package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.lit
import graft.expr.ColumnBridge
import graft.geo.GeoFns

/** SURVEY §4b: the bbox-prefilter join rewrite Catalyst cannot infer.
  *
  * A user who writes the naive spatial join —
  * `points.join(polys, GeoFns.stContainsXY(col("wkt"), col("x"), col("y")))`
  * — pays the exact ray-cast for EVERY (point, polygon) pair. The
  * engine's own operators (`SpatialOps.pointInPolygonJoin`) hand-apply
  * the fix: precompute the polygon's bbox once per row and guard the
  * exact predicate with four cheap range compares. This rule teaches the
  * OPTIMIZER that trick, so naive DataFrame code and SQL sessions get
  * the same plan:
  *
  *   Join(pts, polys, st_contains(wkt, x, y))
  *     ⇒ Project(orig output,
  *         Join(pts, Project(polys + __bb_{xmin,ymin,xmax,ymax}),
  *              x >= __bb_xmin && x < __bb_xmax &&
  *              y >= __bb_ymin && y < __bb_ymax && st_contains(wkt, x, y)))
  *
  * The range conjuncts sit BEFORE the UDF in the And-chain, so the
  * BroadcastNestedLoopJoin's predicate short-circuits to four double
  * compares for every pair outside the bbox (the overwhelming majority);
  * bbox values are computed once per polygon ROW (the inner Project),
  * not once per pair. Bounds use the same half-open convention as
  * `GeoFns.containsPredicate`, and the kernel's ray cast matches it, so
  * the rewrite is result-identical (spec-proven).
  *
  * Fires on Inner and LeftOuter joins whose condition contains the
  * engine's `stContainsXY` UDF with the polygon argument wholly from one
  * join side; idempotent via the `__bb_` marker columns. Registered by
  * [[graft.expr.GraftSessionExtensions]] or per-session via [[install]].
  */
object BboxJoinRewrite extends Rule[LogicalPlan] {

  /** The closure identity of GeoFns.stContainsXY — how the rule
    * recognizes "this predicate is OUR point-in-polygon". A Column only
    * carries the unresolved UDF node; the resolved ScalaUDF (and its
    * stable closure reference) comes from analyzing a 1-row probe on the
    * active session, once, at first rule application.
    */
  private lazy val containsFn: AnyRef =
    firstUdf(GeoFns.stContainsXY(lit(""), lit(0.0), lit(0.0))).function

  // template ScalaUDFs for the bbox kernels; children are replaced with
  // the actual polygon expression at rewrite time
  private lazy val xminT = firstUdf(GeoFns.stXmin(lit("")))
  private lazy val yminT = firstUdf(GeoFns.stYmin(lit("")))
  private lazy val xmaxT = firstUdf(GeoFns.stXmax(lit("")))
  private lazy val ymaxT = firstUdf(GeoFns.stYmax(lit("")))

  private def firstUdf(c: Column): ScalaUDF =
    SparkSession.active.range(1).select(c)
      .queryExecution.analyzed.expressions
      .flatMap(_.collect { case u: ScalaUDF => u }).head

  /** Use on an existing session (tests, notebooks) instead of the
    * `spark.sql.extensions` conf.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  /** Split an And-tree into its conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt @ (Inner | LeftOuter), Some(cond), hint)
        if !marked(j) =>
      // the UDF must be a TOP-LEVEL CONJUNCT: under Not/Or the bbox
      // prefilter is not implied by the condition (anti-containment or a
      // disjunction of polygons would silently lose rows), so such
      // conditions pass through untouched. The analyzer null-guards UDFs
      // as `if (anyNull) false else udf(...)` — that wrapper is
      // conjunct-equivalent to the bare UDF (false on null) and matches.
      def asContains(e: Expression): Option[ScalaUDF] = e match {
        case u: ScalaUDF if (u.function eq containsFn) && u.children.size == 3 =>
          Some(u)
        case If(_, Literal(false, org.apache.spark.sql.types.BooleanType), u: ScalaUDF)
            if (u.function eq containsFn) && u.children.size == 3 => Some(u)
        case _ => None
      }
      val hit = conjuncts(cond).flatMap(asContains(_)).headOption
      hit match {
        case Some(u) =>
          val Seq(poly, px, py) = u.children
          val polyOnRight = poly.references.subsetOf(right.outputSet)
          val polyOnLeft = !polyOnRight && poly.references.subsetOf(left.outputSet)
          if (!polyOnRight && !polyOnLeft) j
          else {
            val side = if (polyOnRight) right else left
            val aliases = Seq(
              Alias(xminT.copy(children = Seq(poly)), "__bb_xmin")(),
              Alias(yminT.copy(children = Seq(poly)), "__bb_ymin")(),
              Alias(xmaxT.copy(children = Seq(poly)), "__bb_xmax")(),
              Alias(ymaxT.copy(children = Seq(poly)), "__bb_ymax")())
            val proj = Project(side.output ++ aliases, side)
            val Seq(bxmin, bymin, bxmax, bymax) = aliases.map(_.toAttribute)
            // same half-open bounds as GeoFns.containsPredicate
            val bboxCond = And(
              And(GreaterThanOrEqual(px, bxmin), LessThan(px, bxmax)),
              And(GreaterThanOrEqual(py, bymin), LessThan(py, bymax)))
            val newJoin =
              if (polyOnRight) Join(left, proj, jt, Some(And(bboxCond, cond)), hint)
              else Join(proj, right, jt, Some(And(bboxCond, cond)), hint)
            Project(j.output, newJoin)
          }
        case None => j
      }
  }

  /** Already rewritten — by this rule (`__bb_` markers) OR by hand
    * (`SpatialOps.withBbox`'s `__xmin`… columns): re-firing there would
    * add four redundant bbox-UDF evaluations per polygon row and
    * duplicate range compares on the engine's own hot spatial paths.
    */
  private def marked(j: Join): Boolean =
    (j.left.output ++ j.right.output).exists(a =>
      a.name.startsWith("__bb_") || a.name == "__xmin")
}
