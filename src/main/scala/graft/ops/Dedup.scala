package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed as a
  * shuffle-bounded distributed plan:
  *
  *  - exact: hash-groupBy on content digest (one shuffle on md5 — uniform
  *    keys, no skew)
  *  - MinHash+LSH: shingle → minhash signature → band keys → bucket
  *    self-join (shuffle on band key only; candidate pairs verified with
  *    exact Jaccard via native array_intersect/array_union)
  *  - SimHash: 64-bit signature → 4×16-bit band keys → bucket join →
  *    hamming verify
  *  - n-gram Jaccard: direct verified-pair computation on LSH candidates
  *  - embedding cosine: random-hyperplane LSH buckets → cosine verify
  */
object Dedup {

  /** Exact dedup: one representative row (min of `idCol`) per distinct value
    * of `textCol`, plus the duplicate count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("dup_count", count(lit(1)).over(Window.partitionBy(md5(col(textCol)))))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Candidate near-duplicate pairs via MinHash LSH, verified with exact
    * shingle-set Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * numHashes must be divisible by bands; rows per band bucket shuffle on
    * the band key, so the only quadratic work is within buckets.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, numHashes: Int = 16, bands: Int = 4,
                   threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    // small corpora often arrive as one parquet file = one partition; the
    // signature UDF is the expensive stage, so spread it across cores first
    val par = df.sparkSession.sparkContext.defaultParallelism
    val sig = df.select(col(idCol).as("__id"), shingles(col(textCol), k).as("__sh"))
      .repartition(par)
      .withColumn("__sig", minhashMd5U(col("__sh"), lit(numHashes)))
      .filter(col("__sig").isNotNull)

    val shingleTable = sig.select(col("__id"), col("__sh")).cache()

    // band join carries ONLY (band, key, id) — the shingle arrays would
    // otherwise be shuffled once per band; they re-attach by id after dedup
    val banded = sig.select(col("__id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|", slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
        .as(Seq("__band", "__key")))

    val a = banded.select(col("__band"), col("__key"), col("__id").as("id_a"))
    val b = banded.select(col("__band"), col("__key"), col("__id").as("id_b"))
    val candidates = a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      .join(shingleTable.select(col("__id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(shingleTable.select(col("__id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))

    candidates
      .withColumn("jaccard",
        when(size(array_union(col("__sh_a"), col("__sh_b"))) === 0, 0.0)
          .otherwise(size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
            size(array_union(col("__sh_a"), col("__sh_b")))))
      .filter(col("jaccard") >= threshold)
      .drop("__sh_a", "__sh_b")
  }

  /** Cluster representative per near-dup group: smallest id among all pairs
    * (single-pass union approximation: id → min(id over its pairs ∪ self)). */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, numHashes: Int = 16, bands: Int = 4,
                   threshold: Double = 0.5): DataFrame = {
    val pairs = minhashPairs(df, idCol, textCol, k, numHashes, bands, threshold)
    val mapping = pairs.groupBy(col("id_b").as(idCol)).agg(min("id_a").as("__canon"))
    df.join(mapping, Seq(idCol), "left")
      .withColumn("canonical_id", coalesce(col("__canon"), col(idCol)))
      .drop("__canon")
  }

  /** SimHash near-dup pairs: the 64-bit signature is banded into
    * `maxHamming + 1` chunks — by pigeonhole, any pair within hamming
    * distance `maxHamming` has at least one chunk with no differing bit, so
    * it shares ≥1 band key and is found by the bucket join. (The chunks are
    * hex-aligned, 16 hex chars split as evenly as possible.) */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15] (needs maxHamming+1 non-empty hex chunks), got $maxHamming")
    val bands = maxHamming + 1
    val bound = (0 to bands).map(i => 16 * i / bands) // hex-char chunk boundaries
    val sig = df.select(col(idCol).as("__id"), simhash64(col(textCol)).as("__sig"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .filter(col("__sig").isNotNull)
    val banded = sig.select(col("__id"), col("__sig"),
      posexplode(array((0 until bands).map(i =>
        substring(col("__sig"), bound(i) + 1, bound(i + 1) - bound(i))): _*))
        .as(Seq("__band", "__key")))
    val a = banded.select(col("__band"), col("__key"), col("__id").as("id_a"), col("__sig").as("__sig_a"))
    val b = banded.select(col("__band"), col("__key"), col("__id").as("id_b"), col("__sig").as("__sig_b"))
    a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingHexU(col("__sig_a"), col("__sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity for all LSH candidate pairs (wrapper
    * naming the n-gram-Jaccard dedup mode of the pipeline). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
                        threshold: Double = 0.5): DataFrame =
    minhashPairs(df, idCol, textCol, k = n, threshold = threshold)

  /** Embedding near-dup pairs: random-hyperplane LSH (deterministic seeded
    * planes) buckets vectors by sign pattern; cosine verifies candidates. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int = 0, planes: Int = 8, seed: Long = 42L,
                     threshold: Double = 0.95): DataFrame = {
    val actualDim =
      if (dim > 0) dim
      else df.select(size(col(vecCol)).as("__d")).filter(col("__d") > 0).limit(1)
        .collect().headOption.map(_.getInt(0)).getOrElse(0)
    val planeVals: Array[Array[Double]] = {
      val rng = new java.util.Random(seed)
      Array.fill(planes, actualDim)(rng.nextGaussian())
    }
    val signU = udf((v: Seq[Float]) =>
      if (v == null) null
      else {
        val sb = new StringBuilder(planes)
        var p = 0
        while (p < planes) {
          var dot = 0.0
          var i = 0
          val plane = planeVals(p)
          while (i < math.min(v.length, plane.length)) { dot += v(i) * plane(i); i += 1 }
          sb += (if (dot >= 0) '1' else '0')
          p += 1
        }
        sb.toString
      })
    val sig = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__key", signU(col("__v"))).filter(col("__key").isNotNull)
    val a = sig.select(col("__key"), col("__id").as("id_a"), col("__v").as("__va"))
    val b = sig.select(col("__key"), col("__id").as("id_b"), col("__v").as("__vb"))
    a.join(b, Seq("__key"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
