package graft.functions.expr

import graft.geom.{GeomOps, Wkb}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
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
