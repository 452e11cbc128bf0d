package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * The cosine kernel is a native expression composition (`zip_with` +
  * `aggregate`) — whole-stage-codegen'd, no UDF, and left-to-right IEEE
  * double summation so external oracles reproduce it exactly.
  *
  * Brute-force top-k is the correctness baseline (full scan, one pass,
  * `orderBy limit k` → Spark TakeOrderedAndProject, no shuffle of the full
  * data). The scale path buckets vectors with random-hyperplane LSH so a
  * query only scans its probe buckets.
  */
object Similarity {

  /** Cosine similarity between two float-array columns, computed in double
    * precision, left-to-right summation. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")), lit(0.0), (acc, x) => acc + x))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (na * nb))
  }

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)

  /** Brute-force cosine top-k against a literal query vector. */
  def bruteForceTopK(df: DataFrame, vecCol: String, query: Seq[Float], k: Int,
                     idCol: String = "vec_id"): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    df.withColumn("cosine", cosine(col(vecCol), q))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** LSH-bucketed ANN top-k: random-hyperplane signature restricts the scan
    * to buckets within `probeHamming` of the query's signature. Recall is
    * tunable via planes/probeHamming; exact for probeHamming = planes. */
  def annTopK(df: DataFrame, vecCol: String, query: Seq[Float], k: Int,
              idCol: String = "vec_id", planes: Int = 8, probeHamming: Int = 2,
              seed: Long = 42L): DataFrame = {
    val dim = query.length
    val planeVals: Array[Array[Double]] = {
      val rng = new java.util.Random(seed)
      Array.fill(planes, dim)(rng.nextGaussian())
    }
    def signOf(v: Seq[Float]): String = {
      val sb = new StringBuilder(planes)
      var p = 0
      while (p < planes) {
        var d = 0.0
        var i = 0
        while (i < math.min(v.length, dim)) { d += v(i) * planeVals(p)(i); i += 1 }
        sb += (if (d >= 0) '1' else '0')
        p += 1
      }
      sb.toString
    }
    val querySign = signOf(query)
    val signU = udf((v: Seq[Float]) => if (v == null) null else signOf(v))
    val hamU = udf((s: String) => s.zip(querySign).count { case (x, y) => x != y })
    val q = array(query.map(v => lit(v)): _*)
    df.withColumn("__sig", signU(col(vecCol)))
      .filter(hamU(col("__sig")) <= probeHamming)
      .withColumn("cosine", cosine(col(vecCol), q))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
      .drop("__sig")
  }

  /** All-pairs top-k neighbour join via LSH buckets (for building kNN graphs
    * at scale): returns (id_a, id_b, cosine), the k best per id_a among
    * bucket-mates. */
  def knnJoin(df: DataFrame, idCol: String, vecCol: String, k: Int,
              planes: Int = 8, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Dedup.embeddingPairs(df, idCol, vecCol,
      dim = 0 /* derived from planes arrays lazily */, planes = planes, seed = seed, threshold = -1.0)
    val sym = pairs.select(col("id_a"), col("id_b"), col("cosine"))
      .unionByName(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"), col("cosine")))
    val w = Window.partitionBy("id_a").orderBy(col("cosine").desc, col("id_b").asc)
    sym.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k).drop("__rk")
  }
}
