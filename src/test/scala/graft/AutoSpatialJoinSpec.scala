package graft

import graft.functions.GeoFunctions
import graft.functions.GeoFunctions._
import graft.geom.{GeomOps, Wkb}
import graft.join.SpatialJoin
import graft.plans.AutoSpatialJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Geometry
import org.scalatest.funsuite.AnyFunSuite

/** The AutoSpatialJoin rewrite: a plain predicate join over STORED geometry
  * columns plans as the grid candidate join (no nested loop), and because
  * the refine replays the exact original condition, results are identical
  * to both the nested-loop semantics (brute-force JTS ground truth) and the
  * explicit `SpatialJoin.sjoin` API. */
class AutoSpatialJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def installed(): Unit = AutoSpatialJoin.install(spark)

  private def ptsDf(n: Int, seed: Int): (DataFrame, Seq[(Int, Geometry)]) = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until n).map(i => (i, GeomOps.point(rng.nextDouble() * 100, rng.nextDouble() * 100)))
    (rows.map { case (i, g) => (i, Wkb.write(g)) }.toDF("pid", "ga"), rows)
  }
  private def boxDf(n: Int, seed: Int): (DataFrame, Seq[(Int, Geometry)]) = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val x = rng.nextDouble() * 90; val y = rng.nextDouble() * 90
      (i, GeomOps.makeBox(x, y, x + 10, y + 10))
    }
    (rows.map { case (i, g) => (i, Wkb.write(g)) }.toDF("bid", "gb"), rows)
  }

  private def assertGridPlan(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"predicate join must not plan as a nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
    assert(plan.contains(s"${AutoSpatialJoin.P}_lcell"),
      s"grid rewrite must fire (cell columns present):\n$plan")
    plan
  }

  test("st_intersects predicate join: grid plan, results equal brute force and sjoin") {
    installed()
    val (pts, ptRows) = ptsDf(400, 7)
    val (boxes, boxRows) = boxDf(25, 8)
    val q = pts.join(boxes, st_intersects(col("ga"), col("gb"))).select("pid", "bid")
    assertGridPlan(q)
    val got = q.as[(Int, Int)].collect().sorted.toSeq
    val brute = for {
      (i, p) <- ptRows; (j, b) <- boxRows if p.intersects(b)
    } yield (i, j)
    assert(got.nonEmpty && got == brute.sorted)
    val viaSjoin = SpatialJoin.sjoin(
        pts.withColumnRenamed("ga", "geometry"),
        boxes.withColumnRenamed("gb", "geometry"), "intersects", "inner")
      .select("pid", "bid").as[(Int, Int)].collect().sorted.toSeq
    assert(got == viaSjoin)
    // stable across re-execution (the rewrite is deterministic)
    assert(q.as[(Int, Int)].collect().sorted.toSeq == got)
  }

  test("st_dwithin and st_distance<=d forms rewrite with bbox expansion") {
    installed()
    val (a, aRows) = ptsDf(200, 11)
    val b0 = ptsDf(200, 12)
    val (b, bRows) = (b0._1.withColumnRenamed("ga", "gb").withColumnRenamed("pid", "bid"), b0._2)
    val brute = (for {
      (i, p) <- aRows; (j, q) <- bRows if p.isWithinDistance(q, 3.0)
    } yield (i, j)).sorted
    val qd = a.join(b, st_dwithin(col("ga"), col("gb"), lit(3.0))).select("pid", "bid")
    assertGridPlan(qd)
    assert(qd.as[(Int, Int)].collect().sorted.toSeq == brute && brute.nonEmpty)
    val qc = a.join(b, st_distance(col("ga"), col("gb")) <= lit(3.0)).select("pid", "bid")
    assertGridPlan(qc)
    assert(qc.as[(Int, Int)].collect().sorted.toSeq == brute)
    // strict < and the reversed literal-first orientation
    val qs = a.join(b, lit(3.0) > st_distance(col("ga"), col("gb"))).select("pid", "bid")
    assertGridPlan(qs)
    val bruteStrict = (for {
      (i, p) <- aRows; (j, q) <- bRows if p.distance(q) < 3.0
    } yield (i, j)).sorted
    assert(qs.as[(Int, Int)].collect().sorted.toSeq == bruteStrict)
  }

  test("st_contains with right-side geometry as first operand (swapped sides)") {
    installed()
    val (pts, ptRows) = ptsDf(300, 21)
    val (boxes, boxRows) = boxDf(20, 22)
    val q = pts.join(boxes, st_contains(col("gb"), col("ga"))).select("pid", "bid")
    assertGridPlan(q)
    val brute = (for {
      (i, p) <- ptRows; (j, b) <- boxRows if b.contains(p)
    } yield (i, j)).sorted
    assert(q.as[(Int, Int)].collect().sorted.toSeq == brute && brute.nonEmpty)
  }

  test("extra conjuncts ride along; NULL and EMPTY geometries drop like the naive plan") {
    installed()
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val rng = new scala.util.Random(31)
    val ptRows = (0 until 150).map(i => (i, GeomOps.point(rng.nextDouble() * 50, rng.nextDouble() * 50)))
    val pts = (ptRows.map { case (i, g) => (i, Wkb.write(g)) } ++
      Seq((900, null.asInstanceOf[Array[Byte]]), (901, Wkb.write(gf.createPolygon()))))
      .toDF("pid", "ga")
    val (boxes, boxRows) = boxDf(12, 32)
    val q = pts.join(boxes,
        st_intersects(col("ga"), col("gb")) && col("pid") % 2 === col("bid") % 2)
      .select("pid", "bid")
    assertGridPlan(q)
    val brute = (for {
      (i, p) <- ptRows; (j, b) <- boxRows if p.intersects(b) && i % 2 == j % 2
    } yield (i, j)).sorted
    assert(q.as[(Int, Int)].collect().sorted.toSeq == brute && brute.nonEmpty)
  }

  test("SQL spelling: JOIN ON st_intersects over stored WKB plans as the grid join") {
    installed()
    GeoFunctions.registerAll(spark)
    val (pts, ptRows) = ptsDf(250, 41)
    val (boxes, boxRows) = boxDf(15, 42)
    pts.createOrReplaceTempView("asj_pts")
    boxes.createOrReplaceTempView("asj_boxes")
    val q = spark.sql(
      "SELECT p.pid, b.bid FROM asj_pts p JOIN asj_boxes b ON st_intersects(p.ga, b.gb)")
    assertGridPlan(q)
    val brute = (for {
      (i, p) <- ptRows; (j, b) <- boxRows if p.intersects(b)
    } yield (i, j)).sorted
    assert(q.as[(Int, Int)].collect().sorted.toSeq == brute && brute.nonEmpty)
  }

  test("guards: outer joins and one-sided/literal conditions stay on Spark's plan") {
    installed()
    val (pts, _) = ptsDf(50, 51)
    val (boxes, _) = boxDf(5, 52)
    val leftJoin = pts.join(boxes, st_intersects(col("ga"), col("gb")), "left")
    val lp = leftJoin.queryExecution.executedPlan.toString
    assert(lp.contains("BroadcastNestedLoopJoin") && !lp.contains(AutoSpatialJoin.P),
      s"outer predicate joins are out of scope for the rewrite:\n$lp")
    val litWkb = Wkb.write(GeomOps.makeBox(0, 0, 50, 50))
    val oneSided = pts.join(boxes, st_intersects(col("ga"), lit(litWkb)))
    val op = oneSided.queryExecution.executedPlan.toString
    assert(!op.contains(s"${AutoSpatialJoin.P}_lcell"),
      s"a literal-geometry condition references one side only — not a spatial join:\n$op")
    // results still correct on the untouched plans
    assert(leftJoin.count() >= 50)
  }
}
