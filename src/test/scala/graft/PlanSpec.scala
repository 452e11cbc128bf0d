package graft

import graft.functions.GeoFunctions._
import graft.geom.{GeomOps, Wkb}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that matter at 100 TB —
  * pushdown reaching the scan, native expressions inside whole-stage
  * codegen, broadcast joins where expected. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def writeSample(): String = {
    val dir = java.nio.file.Files.createTempDirectory("plan").toString
    (0 until 1000).map(i => (i.toLong, (i % 100).toDouble, (i / 100).toDouble))
      .toDF("id", "x", "y").withColumn("geometry", st_point(col("x"), col("y")))
      .write.mode("overwrite").parquet(s"$dir/pts")
    s"$dir/pts"
  }

  test("column pruning: selecting x only reads x") {
    val path = writeSample()
    val plan = spark.read.parquet(path).select("x")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<x:double>"), plan.linesIterator.take(8).mkString("\n"))
  }

  test("filter pushdown reaches parquet scan") {
    val path = writeSample()
    val plan = spark.read.parquet(path).filter(col("id") > 500).select("id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,500)"), plan)
  }

  test("native geometry predicate stays inside WholeStageCodegen") {
    val path = writeSample()
    val df = spark.read.parquet(path)
      .filter(st_intersects(col("geometry"), lit(Wkb.write(GeomOps.makeBox(0, 0, 50, 5)))))
      .select(st_area(col("geometry")))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1)" prefixes mark operators fused into WholeStageCodegen stage 1
    assert(plan.contains("*(1) Filter"), plan)
    // the filter is a native expression (StIntersects), not a UDF node
    assert(plan.contains("stintersects") || plan.contains("StIntersects"), plan)
    df.collect() // forces janino compile of the generated code — must not fall back
  }

  test("BboxFastPath rule: .cx over GeoParquet covering column reaches PushedFilters") {
    import graft.api.GeoDataFrame
    graft.plans.BboxFastPath.install(spark)
    val dir = java.nio.file.Files.createTempDirectory("bboxrule").toString
    val src = GeoDataFrame((0 until 2000).map(i => (i.toLong, (i % 100).toDouble, (i / 100).toDouble))
      .toDF("id", "x", "y").withColumn("geometry", st_point(col("x"), col("y"))).drop("x", "y"))
    graft.io.GeoParquet.write(src, s"$dir/pts", spatialSort = true)
    val back = graft.io.GeoParquet.read(spark, s"$dir/pts")

    // ad-hoc literal intersects filter (what .cx builds) — no readBbox API
    val q = back.cx(10, 2, 30, 8)
    val plan = q.df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("bbox.xmin") || plan.contains("LessThanOrEqual(bbox")),
      s"expected bbox conjuncts in PushedFilters:\n${plan.take(2500)}")
    // results identical to the unaccelerated filter
    val expect = spark.read.parquet(s"$dir/pts")
      .filter(st_intersects(col("geometry"), lit(Wkb.write(GeomOps.makeBox(10, 2, 30, 8)))))
      .select("id").as[Long].collect().sorted.toSeq
    assert(q.df.select("id").as[Long].collect().sorted.toSeq == expect && expect.nonEmpty)

    // contains/within/dwithin literal forms get bounds too, and stay correct
    val boxLit = lit(Wkb.write(GeomOps.makeBox(20, 3, 22, 5)))
    val w = back.df.filter(st_within(col("geometry"), boxLit))
    assert(w.queryExecution.executedPlan.toString.contains("bbox"), "within should gain bbox bounds")
    val wIds = w.select("id").as[Long].collect().sorted.toSeq
    val wExpect = spark.read.parquet(s"$dir/pts")
      .filter(st_within(col("geometry"), boxLit)).select("id").as[Long].collect().sorted.toSeq
    assert(wIds == wExpect && wIds.nonEmpty)
    val dw = back.df.filter(st_dwithin(col("geometry"), lit(Wkb.write(GeomOps.point(50, 5))), lit(3.0)))
    val dwExpect = spark.read.parquet(s"$dir/pts")
      .filter(st_dwithin(col("geometry"), lit(Wkb.write(GeomOps.point(50, 5))), lit(3.0)))
      .select("id").as[Long].collect().sorted.toSeq
    assert(dw.select("id").as[Long].collect().sorted.toSeq == dwExpect && dwExpect.nonEmpty)
  }

  test("BboxFastPath: null bbox with non-null geometry is never dropped") {
    graft.plans.BboxFastPath.install(spark)
    val dir = java.nio.file.Files.createTempDirectory("bboxnull").toString
    // externally-written layout: spec-shaped covering column, but one row's
    // bbox entry is legally null while its geometry is not
    val df = Seq((1L, Wkb.write(GeomOps.point(5, 5)), true), (2L, Wkb.write(GeomOps.point(6, 6)), false))
      .toDF("id", "geometry", "hasb")
      .withColumn("bbox", when(col("hasb"), struct(
        (st_x(col("geometry")) - 0.1).as("xmin"), (st_y(col("geometry")) - 0.1).as("ymin"),
        (st_x(col("geometry")) + 0.1).as("xmax"), (st_y(col("geometry")) + 0.1).as("ymax"))))
      .drop("hasb")
    df.write.parquet(s"$dir/pts")
    val back = spark.read.parquet(s"$dir/pts")
    val got = back.filter(st_intersects(col("geometry"), lit(Wkb.write(GeomOps.makeBox(4, 4, 7, 7)))))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L), s"null-bbox row dropped: got $got")
  }

  test("sjoin broadcast path produces BroadcastHashJoin on the id key") {
    val pts = (0 until 100).map(i => (i, Wkb.write(GeomOps.point(i % 10, i / 10))))
      .toDF("pid", "geometry")
    val polys = Seq((0, Wkb.write(GeomOps.makeBox(0, 0, 20, 20)))).toDF("poly_id", "geometry")
    val j = graft.join.SpatialJoin.sjoin(pts, polys, "intersects", "inner")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("grid sjoin plans a hash join on the cell key, not a cartesian product") {
    val rng = new scala.util.Random(5)
    val pts = (0 until 200).map(i => (i, Wkb.write(GeomOps.point(rng.nextDouble() * 100, rng.nextDouble() * 100))))
      .toDF("pid", "geometry")
    val polys = (0 until 50).map { i =>
      val x = rng.nextDouble() * 90
      (i, Wkb.write(GeomOps.makeBox(x, x, x + 5, x + 5)))
    }.toDF("poly_id", "geometry")
    val j = graft.join.SpatialJoin.sjoin(pts, polys, "intersects", "inner", broadcastThreshold = -1)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__cell"), plan)
  }
}
