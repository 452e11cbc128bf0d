package graft.functions.expr

import graft.geom.{GeomOps, Wkb}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Static JVM kernel entry points referenced from generated code (SURVEY §4:
  * "promote hot functions to Catalyst `Expression` with `doGenCode` to avoid
  * UDF boxing"). Generated java calls these directly — no Option boxing, no
  * Scala-function dispatch, stays inside whole-stage codegen. */
object GeomKernel {
  def point(x: Double, y: Double): Array[Byte] = Wkb.write(GeomOps.point(x, y))
  def x(b: Array[Byte]): Double = GeomOps.pointX(Wkb.read(b))
  def y(b: Array[Byte]): Double = GeomOps.pointY(Wkb.read(b))
  def area(b: Array[Byte]): Double = Wkb.read(b).getArea
  def length(b: Array[Byte]): Double = Wkb.read(b).getLength
  def distance(a: Array[Byte], b: Array[Byte]): Double = Wkb.read(a).distance(Wkb.read(b))
  def intersects(a: Array[Byte], b: Array[Byte]): Boolean = Wkb.read(a).intersects(Wkb.read(b))
  def contains(a: Array[Byte], b: Array[Byte]): Boolean = Wkb.read(a).contains(Wkb.read(b))
  def within(a: Array[Byte], b: Array[Byte]): Boolean = Wkb.read(a).within(Wkb.read(b))
  def dwithin(a: Array[Byte], b: Array[Byte], d: Double): Boolean =
    Wkb.read(a).isWithinDistance(Wkb.read(b), d)
  def makeBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Array[Byte] =
    Wkb.write(GeomOps.makeBox(xmin, ymin, xmax, ymax))
  def envelope(b: Array[Byte]): Array[Byte] = Wkb.write(GeomOps.envelope(Wkb.read(b)))

  /** `st_area(st_makebox(…))` fused to arithmetic, bit-exact vs the JTS path.
    *
    * Finite fast path: JTS `Envelope(x1,x2,y1,y2)` normalizes with a single
    * `<` branch per axis; `GeometryFactory.toGeometry` emits a Point/LineString
    * (area 0.0) when an axis is degenerate, else the rectangle ring
    * (minx,miny),(minx,maxy),(maxx,maxy),(maxx,miny),(minx,miny) whose
    * `Area.ofRing` sum is exactly `0 + 0·(miny−maxy) + t + t` with
    * `t = (maxx−minx)·(maxy−miny)`; `(t+t)/2 = t` is exact in doubles, so the
    * whole area rounds once — identical bits to the single product. Any
    * NaN/±Inf coordinate falls back to the real JTS construction (still no
    * WKB round-trip), because the ring arithmetic then yields NaNs the
    * product form would miss. */
  def boxArea(xa: Double, ya: Double, xb: Double, yb: Double): Double =
    if (java.lang.Double.isFinite(xa + ya + xb + yb)) {
      val minx = if (xa < xb) xa else xb; val maxx = if (xa < xb) xb else xa
      val miny = if (ya < yb) ya else yb; val maxy = if (ya < yb) yb else ya
      if (minx == maxx || miny == maxy) 0.0
      else (maxx - minx) * (maxy - miny)
    } else GeomOps.makeBox(xa, ya, xb, yb).getArea

  /** `st_area(st_envelope(st_makebox(…)))`. For finite coordinates the
    * envelope of a box IS the box, so this equals [[boxArea]]; NaN inputs
    * diverge (JTS `Envelope.expandToInclude` silently DROPS NaN coordinates,
    * so the envelope of a NaN-cornered box can be a finite degenerate with
    * area 0.0 where the box's own ring sums to NaN) — hence the fallback
    * runs the genuine envelope∘makeBox composition. */
  def envBoxArea(xa: Double, ya: Double, xb: Double, yb: Double): Double =
    if (java.lang.Double.isFinite(xa + ya + xb + yb)) boxArea(xa, ya, xb, yb)
    else GeomOps.envelope(GeomOps.makeBox(xa, ya, xb, yb)).getArea
}

abstract class GeomBinaryPredicate extends BinaryExpression {
  def kernelName: String
  override def dataType: DataType = BooleanType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.expr.GeomKernel.$kernelName($a, $b)")
}

case class StIntersects(left: Expression, right: Expression) extends GeomBinaryPredicate {
  def kernelName = "intersects"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomKernel.intersects(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class StContains(left: Expression, right: Expression) extends GeomBinaryPredicate {
  def kernelName = "contains"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomKernel.contains(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class StWithin(left: Expression, right: Expression) extends GeomBinaryPredicate {
  def kernelName = "within"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomKernel.within(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class StDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomKernel.distance(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.expr.GeomKernel.distance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class StDWithin(first: Expression, second: Expression, third: Expression) extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(a: Any, b: Any, d: Any): Any =
    GeomKernel.dwithin(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, d) => s"graft.functions.expr.GeomKernel.dwithin($a, $b, $d)")
  override def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c)
}

case class StPoint(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(x: Any, y: Any): Any =
    GeomKernel.point(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.expr.GeomKernel.point($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

abstract class GeomUnaryDouble extends UnaryExpression {
  def kernelName: String
  override def dataType: DataType = DoubleType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.GeomKernel.$kernelName($c)")
}

case class StX(child: Expression) extends GeomUnaryDouble {
  def kernelName = "x"
  override protected def nullSafeEval(b: Any): Any = GeomKernel.x(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StY(child: Expression) extends GeomUnaryDouble {
  def kernelName = "y"
  override protected def nullSafeEval(b: Any): Any = GeomKernel.y(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StArea(child: Expression) extends GeomUnaryDouble {
  def kernelName = "area"
  override protected def nullSafeEval(b: Any): Any = GeomKernel.area(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StLength(child: Expression) extends GeomUnaryDouble {
  def kernelName = "length"
  override protected def nullSafeEval(b: Any): Any = GeomKernel.length(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StEnvelope(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(b: Any): Any = GeomKernel.envelope(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.GeomKernel.envelope($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Quaternary (x0, y0, x1, y1) → double kernels share null handling: any
  * NULL input nulls the result, exactly the semantics of the fused
  * makebox→envelope→area chain they replace (a NULL coordinate nulls the
  * constructed box, which nulls everything downstream). */
abstract class GeomQuaternary extends QuaternaryExpression {
  def kernelName: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c, d) => s"graft.functions.expr.GeomKernel.$kernelName($a, $b, $c, $d)")
}

case class StMakeBox(first: Expression, second: Expression,
                     third: Expression, fourth: Expression) extends GeomQuaternary {
  def kernelName = "makeBox"
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeomKernel.makeBox(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression) = copy(a, b, c, d)
}

case class StBoxArea(first: Expression, second: Expression,
                     third: Expression, fourth: Expression) extends GeomQuaternary {
  def kernelName = "boxArea"
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeomKernel.boxArea(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression) = copy(a, b, c, d)
}

case class StEnvBoxArea(first: Expression, second: Expression,
                        third: Expression, fourth: Expression) extends GeomQuaternary {
  def kernelName = "envBoxArea"
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeomKernel.envBoxArea(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression) = copy(a, b, c, d)
}
