package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling + sequence packing for training pipelines. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, s"tok${i % 7} " * (1 + i % 20))).toDF("doc_id", "text")

  test("deterministicSample: reproducible, partitioning-independent, ~fraction") {
    val df = corpus(2000)
    val a = Sampling.deterministicSample(df, "doc_id", 0.3).select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(df.repartition(13), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b) // stable under repartition (rand() would not be)
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
    // a different salt draws an independent sample
    val c = Sampling.deterministicSample(df, "doc_id", 0.3, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(a != c)
    // nested fractions: the 10% sample is NOT necessarily a subset of the
    // 30% one per spec (threshold on same hash => actually it IS a subset)
    val d = Sampling.deterministicSample(df, "doc_id", 0.1).select("doc_id").as[Long].collect().toSet
    assert(d.subsetOf(a)) // same hash, lower threshold
  }

  test("stratifiedSample: per-group fractions and default") {
    val df = corpus(3000).withColumn("grp", (col("doc_id") % 3).cast("string"))
    val kept = Sampling.stratifiedSample(df, "doc_id", "grp",
      weights = Map("0" -> 0.6, "1" -> 0.1), defaultFraction = 0.0)
    val byGrp = kept.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(byGrp.getOrElse("0", 0L) / 1000.0 - 0.6) < 0.08)
    assert(math.abs(byGrp.getOrElse("1", 0L) / 1000.0 - 0.1) < 0.06)
    assert(!byGrp.contains("2")) // default 0 drops the unlisted group
  }

  test("packSequences: deterministic bins, budget respected at pack starts") {
    val df = corpus(500)
    val packed = Sampling.packSequences(df, "doc_id", "text", budgetTokens = 64, shards = 4)
    val rows = packed.select("doc_id", "n_tokens", "shard", "pack")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 500)
    // within each shard, docs in id order: pack is nondecreasing and equals
    // exclusive-prefix div budget
    rows.groupBy(_._3).foreach { case (_, docs) =>
      var pre = 0L
      docs.sortBy(_._1).foreach { case (_, nt, _, pack) =>
        assert(pack == pre / 64, s"pack mismatch at pre=$pre")
        pre += nt
      }
    }
    // shards partition by doc_id % 4
    rows.foreach { case (id, _, sh, _) => assert(sh == id % 4) }
    // stable under repartition
    val again = Sampling.packSequences(df.repartition(11), "doc_id", "text", 64, 4)
      .select("doc_id", "pack").as[(Long, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._4).toMap == again)
  }
}
