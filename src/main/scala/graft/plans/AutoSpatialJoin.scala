package graft.plans

import graft.functions.GeoFunctions
import graft.functions.expr.{StContains, StDWithin, StDistance, StIntersects, StWithin}
import graft.join.SpatialJoin
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge.{column => exprCol, ofRows}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType}

/** Auto-plan spatial joins spelled as plain predicate joins.
  *
  * `a.join(b, st_intersects(a("g"), b("g")))` — or the SQL
  * `A JOIN B ON st_intersects(A.g, B.g)` — over STORED geometry columns has
  * no equi-join key, so Spark plans a BroadcastNestedLoopJoin that evaluates
  * the predicate (two WKB parses + a JTS call) on every one of the n×m
  * pairs. That is the worst accidental plan in the engine's SQL surface: at
  * 100 TB it is quadratic work no cluster survives. The reference sidesteps
  * it because its only join API *is* the indexed one (`tools/sjoin.py:212`
  * always probes an STRtree); this rule gives the predicate spelling the
  * same economics.
  *
  * The rewrite reuses the PBSM grid machinery of [[SpatialJoin]]: size a
  * grid from (sampled) bbox stats, cover each side's bbox with grid cells,
  * hash-join on the cell id, pre-filter by bbox overlap, keep each pair only
  * in the cell containing the top-left corner of the bbox intersection
  * (exact dedup without a global distinct — every surviving pair appears in
  * exactly one cell), and then refine with the ORIGINAL join condition.
  * Because the full original condition — the spatial conjunct and any other
  * conjuncts — is re-evaluated on the surviving candidates, results are
  * bit-identical to the nested-loop plan by construction: the grid stage is
  * a necessary-condition pre-filter, never a replacement. The cell equality
  * gives Catalyst a real join key, so the pair generation plans as a
  * hash/sort-merge join (AQE broadcasts the exploded side when it is small,
  * recovering the broadcast-sjoin shape for free).
  *
  * Fires on Inner/Cross joins whose condition contains a conjunct of shape
  * `st_intersects/st_contains/st_within(l, r)`, `st_dwithin(l, r, d)` or
  * `st_distance(l, r) <=/< d` (either orientation) with `d` a foldable
  * double and `l`/`r` deterministic binary expressions each referencing
  * exactly one side. Constructed-geometry conditions never reach this rule:
  * [[GeomSimplify]] runs earlier in the batch and fuses them to pure
  * arithmetic (where a nested loop is cheap per pair); this rule is the
  * complementary path for geometries that exist only as stored WKB.
  *
  * Row-level semantics of the candidate stage, checked against the refine:
  * a NULL geometry has NULL bounds and is dropped — the predicate would be
  * NULL (not true) on every such pair; an EMPTY geometry has an inverted
  * JTS "null envelope" and covers no cells ([[SpatialJoin.GridSpec]]
  * `cellsFor`) — every supported predicate is false on it. `dwithin` with a
  * negative d expands by 0 (candidates superset; refine yields false).
  *
  * Costs: sizing the grid runs two small (2%-sampled) stats jobs at
  * optimization time — the same jobs an explicit `sjoin` runs eagerly, just
  * moved inside planning, so even `.explain()` triggers them. The refine
  * re-evaluates the raw predicate per candidate pair without the prepared-
  * geometry cache of `SpatialJoin.sjoin`, which stays the preferred API for
  * hot paths; this rule is the guard rail that turns an accidental O(n·m)
  * plan into the bounded-duplication grid plan.
  */
object AutoSpatialJoin extends Rule[LogicalPlan] {

  /** Reserved prefix for the rewrite's working columns. Doubles as the
    * re-fire guard: a join whose output already carries these names is this
    * rule's own emission (re-assembled into the join condition by a later
    * PushPredicateThroughJoin pass when the rule runs inside the main
    * operator-optimization fixpoint) and must not be rewritten again. */
  private[graft] val P = "__graft_asj"

  /** Append to a live session, after [[GeomSimplify]] (constructed-geometry
    * join conditions must fuse to arithmetic before this rule looks for the
    * stored-geometry shape); cluster deployments get the same order from
    * `graft.plans.GraftExtensions`. */
  def install(spark: SparkSession): Unit = {
    GeomSimplify.install(spark)
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  private def foldedDouble(e: Expression): Option[Double] =
    if (e.foldable && e.dataType == DoubleType)
      Option(e.eval(null)).collect { case d: Double if !d.isNaN => d }
    else None

  /** A rewritable spatial conjunct: (left-side geometry, right-side
    * geometry, candidate bbox expansion). Operands may be arbitrary
    * deterministic binary expressions (a stored column, or a construction
    * GeomSimplify could not fuse because the other side is stored); each
    * must reference exactly one join side. The predicates are symmetric for
    * CANDIDATE purposes (bbox overlap / bbox distance), so orientation only
    * decides which side the operand binds to — the refine replays the exact
    * original condition either way. */
  private def matchSt(e: Expression, left: LogicalPlan,
                      right: LogicalPlan): Option[(Expression, Expression, Double)] = {
    def sides(a: Expression, b: Expression,
              expand: Double): Option[(Expression, Expression, Double)] =
      if (a.references.isEmpty || b.references.isEmpty ||
          a.dataType != BinaryType || b.dataType != BinaryType) None
      else if (a.references.subsetOf(left.outputSet) &&
               b.references.subsetOf(right.outputSet)) Some((a, b, expand))
      else if (a.references.subsetOf(right.outputSet) &&
               b.references.subsetOf(left.outputSet)) Some((b, a, expand))
      else None
    e match {
      case StIntersects(a, b) => sides(a, b, 0.0)
      case StContains(a, b)   => sides(a, b, 0.0)
      case StWithin(a, b)     => sides(a, b, 0.0)
      case StDWithin(a, b, d) =>
        foldedDouble(d).flatMap(dv => sides(a, b, math.max(dv, 0.0)))
      case LessThanOrEqual(StDistance(a, b), d) =>
        foldedDouble(d).flatMap(dv => sides(a, b, math.max(dv, 0.0)))
      case LessThan(StDistance(a, b), d) =>
        foldedDouble(d).flatMap(dv => sides(a, b, math.max(dv, 0.0)))
      case GreaterThanOrEqual(d, StDistance(a, b)) =>
        foldedDouble(d).flatMap(dv => sides(a, b, math.max(dv, 0.0)))
      case GreaterThan(d, StDistance(a, b)) =>
        foldedDouble(d).flatMap(dv => sides(a, b, math.max(dv, 0.0)))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), _)
        if !j.isStreaming && cond.deterministic &&
          // subqueries were already planned in place — don't replicate them
          !cond.exists(_.isInstanceOf[PlanExpression[_]]) &&
          // the analyzer guarantees disjoint sides; re-fire guard below
          left.outputSet.intersect(right.outputSet).isEmpty &&
          !j.output.exists(_.name.startsWith(P)) =>
      splitConjuncts(cond).iterator.flatMap(matchSt(_, left, right).iterator)
        .nextOption() match {
        case None => j
        case Some((lg, rg, expand)) =>
          // any failure (unresolvable shape, stats job error) keeps the
          // original join — the rewrite is an optimization, never a gate
          try rewrite(j, lg, rg, expand)
          catch { case scala.util.control.NonFatal(_) => j }
      }
  }

  private def rewrite(j: Join, lGeomE: Expression, rGeomE: Expression,
                      expand: Double): LogicalPlan = {
    val spark = SparkSession.active
    val ldf = ofRows(spark, j.left)
    val rdf = ofRows(spark, j.right)
    val g = SpatialJoin.computeGrid(ldf, exprCol(lGeomE), rdf, exprCol(rGeomE), expand)
    val cellsU = udf((x0: Double, y0: Double, x1: Double, y1: Double) =>
      g.cellsFor(x0, y0, x1, y1))
    val cellOfU = udf((x: Double, y: Double) => g.cellOf(x, y))
    def c(n: String): Column = col(s"${P}_$n")

    val lb = ldf
      .withColumn(s"${P}_b", GeoFunctions.st_bounds(exprCol(lGeomE)))
      .filter(c("b").isNotNull)
      .withColumn(s"${P}_lx0", c("b")("xmin") - lit(expand))
      .withColumn(s"${P}_ly0", c("b")("ymin") - lit(expand))
      .withColumn(s"${P}_lx1", c("b")("xmax") + lit(expand))
      .withColumn(s"${P}_ly1", c("b")("ymax") + lit(expand))
      .withColumn(s"${P}_lcell",
        explode(cellsU(c("lx0"), c("ly0"), c("lx1"), c("ly1"))))
      .drop(s"${P}_b")
    val rb = rdf
      .withColumn(s"${P}_b", GeoFunctions.st_bounds(exprCol(rGeomE)))
      .filter(c("b").isNotNull)
      .withColumn(s"${P}_rx0", c("b")("xmin"))
      .withColumn(s"${P}_ry0", c("b")("ymin"))
      .withColumn(s"${P}_rx1", c("b")("xmax"))
      .withColumn(s"${P}_ry1", c("b")("ymax"))
      .withColumn(s"${P}_rcell",
        explode(cellsU(c("rx0"), c("ry0"), c("rx1"), c("ry1"))))
      .drop(s"${P}_b")

    // one filter, cheap-to-expensive: bbox interval overlap, reference-cell
    // dedup, then the exact original condition (And short-circuits left to
    // right in both eval and codegen)
    val pairs = lb.join(rb, c("lcell") === c("rcell"))
      .filter(
        c("lx0") <= c("rx1") && c("rx0") <= c("lx1") &&
          c("ly0") <= c("ry1") && c("ry0") <= c("ly1") &&
          c("lcell") === cellOfU(greatest(c("lx0"), c("rx0")),
            greatest(c("ly0"), c("ry0"))) &&
          exprCol(j.condition.get))
    // restore the Join's exact output attributes (same exprIds — the
    // machinery above only ever ADDS working columns)
    pairs.select(j.output.map(a => exprCol(a)): _*).queryExecution.analyzed
  }
}
