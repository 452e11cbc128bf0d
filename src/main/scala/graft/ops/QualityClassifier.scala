package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** FastText-style linear quality classifier, trained on the corpus itself —
  * the "model-based quality filter" step of the public LLM data recipes
  * (GPT-3 / LLaMA data work trains a linear classifier over hashed
  * bag-of-words features to score web documents against a curated target;
  * Joulin et al. 2016 is the public architecture). Zero egress: features
  * are hashed token buckets, labels come from any boolean column (a
  * curated slice marker, [[TextFunctions.gopherKeep]] as weak labels, a
  * language slice, …).
  *
  * Training is full-batch logistic regression by gradient descent with a
  * deterministic, oracle-replayable spec (the [[Similarity.kmeansCentroids]]
  * posture): per-document logits are rounded to 10⁻⁹ before the sigmoid and
  * weights to 10⁻⁶ after every epoch, so double-summation order and libm
  * `exp` ulp differences can never accumulate across epochs — each epoch is
  * replayable as a plain-SQL CTE triple (logit, sigmoid, gradient).
  *
  * Scale posture: the feature extraction is one map-side projection +
  * groupBy to (doc, bucket, count) — `buckets` is small by design, so the
  * weight vector broadcasts. Per epoch: one groupBy(doc) for logits (the
  * weight join is a broadcast), one groupBy(bucket) reducing to ≤`buckets`
  * rows on the driver. Epoch count is a constant; every pass is one scan
  * of the (doc, bucket) table, which callers should cache (the gate does).
  */
object QualityClassifier {

  /** Hashed feature bucket of a token: first two hex chars of md5 read
    * base-16, mod `buckets` — the [[LmQuality]] DSIR spec, portable to the
    * oracle via strpos arithmetic. */
  private def bucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 2), 16, 10).cast("int") % buckets

  /** (idCol, __bk, __x) sparse feature counts: whitespace-token unigrams
    * hashed into `buckets`. One narrow shuffle on (doc, bucket). */
  def features(docs: DataFrame, idCol: String, textCol: String,
               buckets: Int = 64): DataFrame =
    docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .select(col(idCol), bucket(col("__tok"), buckets).as("__bk"))
      .groupBy(col(idCol), col("__bk"))
      .agg(count(lit(1)).cast("double").as("__x"))

  /** Train `epochs` rounds of full-batch gradient descent from w = 0.
    * Returns the weight vector (index = bucket id). Deterministic: replayed
    * bit-for-bit by chained SQL CTEs (the q129 gate).
    *
    * Update rule per epoch: z_d = round(Σ_b w_b·x_db, 9);
    * p_d = 1/(1+e^(−z_d)); grad_b = Σ_d (p_d − y_d)·x_db;
    * w_b ← round(w_b − lr·grad_b/n, 6) with n = total documents. */
  /** One row per document: (idCol, __y label, __f = list of (__bk, __x)
    * feature entries; null when the document has no tokens). Built once
    * and cached by [[trainLogReg]]; every epoch is then MAP-SIDE over this
    * table (optimization round 21) — the weight vector rides along as a
    * literal array instead of a broadcast-joined table, and the per-doc
    * logit is an `aggregate` over the feature entries instead of a
    * groupBy(doc) shuffle, so an epoch costs one scan + one ≤`buckets`-row
    * gradient aggregation (vs two joins + two shuffles before). */
  private def docFeatures(docs: DataFrame, idCol: String, textCol: String,
                          labelCol: Column, buckets: Int): DataFrame =
    docs.select(col(idCol), when(labelCol, 1.0).otherwise(0.0).as("__y"))
      .join(features(docs, idCol, textCol, buckets)
        .groupBy(col(idCol))
        .agg(collect_list(struct(col("__bk"), col("__x"))).as("__f")),
        Seq(idCol), "left")

  /** Per-document logit and sigmoid under literal weights `w`:
    * z = round(Σ w_b·x_b, 9), p = sigmoid(z); a document with no features
    * (null `__f`) scores the exact sigmoid of 0 = 0.5. The 10⁻⁹ rounding
    * keeps z order-independent: every w_b is a multiple of 10⁻⁶ (the
    * post-epoch rounding) and every x an integer count, so the true sum
    * lies on the 10⁻⁶ grid — far coarser than both the float error and
    * the rounding grid. */
  private def pCol(w: Array[Double]): Column = {
    val wLit = array(w.map(lit(_)): _*)
    val z = round(aggregate(col("__f"), lit(0.0),
      (acc, e) => acc + element_at(wLit, e.getField("__bk") + 1) * e.getField("__x")), 9)
    lit(1.0) / (lit(1.0) + exp(-coalesce(z, lit(0.0))))
  }

  def trainLogReg(docs: DataFrame, idCol: String, textCol: String,
                  labelCol: Column, buckets: Int = 64, epochs: Int = 3,
                  lr: Double = 0.5): Array[Double] = {
    // ScratchCache (bounded FIFO), not cache()+unpersist: scoreLogReg
    // builds the IDENTICAL docFeatures plan right after training, and a
    // bench rep-loop rebuilds both — keeping the entry live lets every
    // later consumer hit it instead of re-extracting features
    val base = ScratchCache(docFeatures(docs, idCol, textCol, labelCol, buckets))
    val n = base.count().toDouble
    val w = Array.fill(buckets)(0.0)
    for (_ <- 1 to epochs) {
      // grad_b = Σ_d (p_d − y_d)·x_db — explode the cached feature lists
      // and reduce to ≤`buckets` rows (map-side partial agg); docs with no
      // features contribute nothing (explode drops null lists), exactly as
      // the join formulation this replaces
      val grad = base
        .select((pCol(w) - col("__y")).as("__d"), explode(col("__f")).as("__e"))
        .groupBy(col("__e.__bk"))
        .agg(sum(col("__d") * col("__e.__x")).as("__g"))
        .collect()
      grad.foreach { r =>
        val b = r.getInt(0)
        val g = r.getDouble(1)
        w(b) = math.floor((w(b) - lr * g / n) * 1e6 + 0.5) / 1e6
      }
    }
    // no unpersist: the ScratchCache FIFO bounds the entry's lifetime, and
    // the scoring pass that almost always follows reuses it
    w
  }

  /** Score every document of `docs` with a trained weight vector:
    * (idCol, label y, score p, keep = p ≥ 0.5). */
  def scoreLogReg(docs: DataFrame, idCol: String, textCol: String,
                  labelCol: Column, w: Array[Double]): DataFrame =
    docFeatures(docs, idCol, textCol, labelCol, w.length)
      .select(col(idCol), col("__y").as("label"), pCol(w).as("score"))
      .withColumn("keep", col("score") >= 0.5)
}
