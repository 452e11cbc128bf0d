package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.expr.{StArea, StBoxArea, StDWithin, StDistance, StEnvBoxArea, StEnvelope, StMakeBox, StPoint, StX, StY}

/** Algebraic simplification of geometry expression trees — the Catalyst
  * rule that keeps CONSTRUCTED-point hot paths out of WKB entirely.
  *
  * `st_distance(st_point(ax, ay), st_point(bx, by))` evaluates, per row,
  * two WKB writes, two WKB parses and a JTS DistanceOp — for what is
  * algebraically `sqrt((ax−bx)² + (ay−by)²)`. On a 100 TB point table
  * (the dominant shape in telemetry/event data) that is the difference
  * between a pure-arithmetic whole-stage-codegen loop and per-row
  * allocation churn. The rewrites are bit-exact, not approximate:
  *
  *  - JTS point distance IS `Math.hypot(dx, dy)` in doubles
  *    (Coordinate.distance) — NOT `sqrt(dx²+dy²)`, which underflows for
  *    subnormal deltas (measured: dx=1e-300 → sqrt form 0.0, JTS 1e-300);
  *    the rewrite emits Catalyst's `Hypot`, which codegens to the same
  *    `Math.hypot` call;
  *  - `isWithinDistance` on two points reduces to that distance compared
  *    to d, so `StDWithin` becomes `hypot(…) <= d` — the comparison is
  *    kept on the distance itself (rewriting to `sumsq <= d*d` would
  *    round differently at boundaries);
  *  - `st_x(st_point(x, y))` is `x`, guarded so the null semantics of the
  *    fused form (NULL iff x or y is NULL) are preserved.
  *
  * Null propagation: every rewrite produces an expression that is NULL on
  * exactly the inputs the original was NULL on (arithmetic propagates any
  * NULL operand; the coordinate projections add an explicit guard on the
  * dropped coordinate). Fires only when BOTH operands are literal StPoint
  * constructions in the same expression tree — a WKB column read from
  * storage is never touched. */
object GeomSimplify extends Rule[LogicalPlan] {

  /** Append to a live session (same idiom as [[BboxFastPath.install]]);
    * cluster deployments get both rules via `graft.plans.GraftExtensions`. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def dist(ax: Expression, ay: Expression,
                   bx: Expression, by: Expression): Expression =
    Hypot(Subtract(ax, bx), Subtract(ay, by))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // st_x(st_point(x, y)) = x, NULL also when y is NULL (the point would
    // have been NULL); if x itself is NULL the value branch is NULL anyway
    case StX(StPoint(x, y)) => If(IsNull(y), Literal(null, DoubleType), x)
    case StY(StPoint(x, y)) => If(IsNull(x), Literal(null, DoubleType), y)
    case StDistance(StPoint(ax, ay), StPoint(bx, by)) =>
      dist(ax, ay, bx, by)
    case StDWithin(StPoint(ax, ay), StPoint(bx, by), d) =>
      LessThanOrEqual(dist(ax, ay, bx, by), d)
    // Constructed-BOX areas fuse to arithmetic kernels (no WKB, no JTS objects
    // on the finite path — see GeomKernel.boxArea for the bit-exactness proof).
    // st_envelope(st_makebox(…)) alone is deliberately NOT rewritten to the box:
    // JTS Envelope.expandToInclude drops NaN coordinates, so for NaN corners the
    // envelope is a DIFFERENT geometry than the box — only the full
    // area∘envelope∘makebox composition has a safe fused kernel.
    case StArea(StEnvelope(StMakeBox(x0, y0, x1, y1))) => StEnvBoxArea(x0, y0, x1, y1)
    case StArea(StMakeBox(x0, y0, x1, y1)) => StBoxArea(x0, y0, x1, y1)
  }
}
