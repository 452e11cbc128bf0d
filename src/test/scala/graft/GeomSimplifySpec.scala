package graft

import graft.functions.GeoFunctions._
import graft.functions.expr.GeomKernel
import graft.plans.GeomSimplify
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The constructed-point algebraic simplification rule: results bit-exact
  * vs the WKB kernel path, null semantics preserved, and the fused plan
  * carries pure arithmetic (no geometry kernel calls). */
class GeomSimplifySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def installed(): Unit = GeomSimplify.install(spark)

  test("st_distance(st_point, st_point) fuses to sqrt arithmetic, bit-exact vs the kernel") {
    installed()
    val df = Seq((0.0, 0.0, 3.0, 4.0), (1.5, -2.25, -7.125, 0.875),
        (1e-300, 0.0, 2e-300, 0.0), (12.3, 45.6, 12.3, 45.6))
      .toDF("ax", "ay", "bx", "by").repartition(2) // block LocalRelation constant-folding
    val q = df.select(st_distance(st_point(col("ax"), col("ay")),
      st_point(col("bx"), col("by"))).as("d"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("HYPOT"), s"distance must fuse to arithmetic:\n$plan")
    assert(!plan.toLowerCase.contains("stdistance") && !plan.toLowerCase.contains("stpoint"),
      s"no WKB construction may survive the rewrite:\n$plan")
    val got = q.as[Double].collect()
    val exp = df.as[(Double, Double, Double, Double)].collect().map { case (ax, ay, bx, by) =>
      GeomKernel.distance(GeomKernel.point(ax, ay), GeomKernel.point(bx, by))
    }
    assert(got.toSeq == exp.toSeq, "fused arithmetic must be bit-exact vs the JTS kernel")
  }

  test("st_x/st_y of a constructed point project the coordinate with point-null semantics") {
    installed()
    val df = Seq((Some(1.5), Some(2.5)), (None, Some(9.0)), (Some(7.0), None))
      .toDF("x", "y").repartition(2)
    val q = df.select(st_x(st_point(col("x"), col("y"))).as("px"),
      st_y(st_point(col("x"), col("y"))).as("py"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("stpoint"), s"projection must not build WKB:\n$plan")
    // repartition scrambles order — compare as a multiset
    val rows = q.as[(Option[Double], Option[Double])].collect().toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    // a NULL in EITHER coordinate nulls the whole point, hence both outputs
    assert(rows == Map((Some(1.5), Some(2.5)) -> 1, (None, None) -> 2))
  }

  test("st_dwithin on constructed points keeps the sqrt (boundary-exact) and fuses") {
    installed()
    val df = Seq((0.0, 0.0, 3.0, 4.0)).toDF("ax", "ay", "bx", "by").repartition(2)
    def dw(d: Double) = df.select(st_dwithin(st_point(col("ax"), col("ay")),
      st_point(col("bx"), col("by")), lit(d)).as("w"))
    assert(dw(5.0).as[Boolean].head(), "distance exactly d must pass (<=)")
    assert(!dw(4.999999999999999).as[Boolean].head())
    val plan = dw(5.0).queryExecution.executedPlan.toString
    assert(plan.contains("HYPOT") && !plan.toLowerCase.contains("stdwithin"), plan)
  }

  test("WKB columns from storage are never rewritten (rule fires on constructions only)") {
    installed()
    val df = Seq((0.0, 0.0, 3.0, 4.0)).toDF("ax", "ay", "bx", "by")
      .select(st_point(col("ax"), col("ay")).as("ga"),
        st_point(col("bx"), col("by")).as("gb"))
      .localCheckpoint() // materialize: downstream sees plain binary columns
    val q = df.select(st_distance(col("ga"), col("gb")).as("d"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("stdistance"),
      s"stored geometry must keep the kernel path:\n$plan")
    assert(q.as[Double].head() == 5.0)
  }
}
