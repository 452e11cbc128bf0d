package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // explicit AQE skew posture — the 100 TB conf recipe (SCALE.md):
      // spatial-cell and LSH-band shuffle keys are skewed by nature
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.BboxFastPath.install(spark)
    // local-iteration hooks (driver never sets these): run only named
    // queries, optionally several times (last timing wins = warm numbers)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Per-query timings jitter up to ±40% run-to-run at sf0.1 (measured:
    // q67 1.75-2.71 s across two same-code runs), so each query is measured
    // `reps` times and the MEDIAN reported — round-over-round deltas are
    // then signal, not noise.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // Per-query warmup execution (unmeasured), then the measured runs —
    // the same warmup-then-measure methodology as the reference's asv
    // baseline (BASELINE.md): at sf0.1 a cold run is dominated by one-time
    // whole-stage-codegen compilation (~1-2 s/query), which asv also
    // excludes. Steady-state is what a long-running 100 TB job sees.
    // A failing query must surface as "err" + non-zero exit, never as a
    // fast-looking wall time that masks a regression.
    val results: Map[String, Either[String, Double]] = selected.map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warmup
      val times = collection.mutable.ArrayBuffer.empty[Double]
      var err: Option[String] = None
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable => err = Some("err: " + e.getClass.getSimpleName) }
      }
      // drop this query's cached plans before the next one: a 69-query run
      // otherwise accumulates every .cache()d subtree (4 executions each)
      // in storage memory, and late queries pay eviction churn that has
      // nothing to do with their own plan
      spark.sharedState.cacheManager.clearCache()
      val out: Either[String, Double] = err.toLeft {
        val s = times.sorted
        if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
      }
      name -> out
    }
    val qs = results.map {
      case (k, Right(v)) => s"\"" + k + "\":" + v
      case (k, Left(e))  => s"\"" + k + "\":\"" + e.takeWhile(_ != '"') + "\""
    }.mkString("{", ",", "}")
    // index BUILD phases (q63/q68 build their stored index once per JVM, at
    // warmup — see SparkEntry.memoIndex), reported apart from query medians
    val builds = {
      import scala.jdk.CollectionConverters._
      SparkEntry.indexBuildSec.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    }
    val total = results.values.collect { case Right(v) => v }.sum
    val nErr = results.values.count(_.isLeft)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"index_build":$builds,"errors":$nErr,"reps":$reps,"stat":"median","sf":"$sfDir"}"""
    println(json)
    // the driver captures a log TAIL that has truncated long lines before —
    // persist the full JSON to a file so every query's timing survives
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // read-only cwd must not fail the bench
    spark.stop()
    if (nErr > 0) sys.exit(1)
  }
}
