package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Model-based quality signals for training-data curation, built from the
  * corpus itself (no external model, zero egress):
  *
  *  - [[unigramNllScore]] — the CCNet-style language-model quality proxy
  *    (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
  *    Datasets from Web Crawl Data"): train a unigram LM on the corpus,
  *    score each document by its mean token negative-log-likelihood.
  *    Low-perplexity ≈ fluent prose; high ≈ gibberish/boilerplate tails.
  *  - [[importanceWeights]] — DSIR-style hashed-n-gram importance sampling
  *    (Xie et al. 2023, "Data Selection for Language Models via Importance
  *    Resampling"): fit bag-of-hashed-n-gram models on a target corpus and
  *    the raw corpus, weight each raw document by its log-likelihood ratio.
  *    Documents distributionally close to the target get high weight.
  *
  * Both are pure DataFrame compositions (no UDFs): tokenization is the
  * engine-wide whitespace spec ([[TextFunctions.tokens]]), and the feature
  * hash is the first hex chars of md5 — deterministic and reproducible
  * bit-for-bit by the DuckDB oracle.
  */
object LmQuality {

  /** Per-document mean negative log-likelihood under a unigram LM trained on
    * `docs` itself (maximum-likelihood, no smoothing — every scored token is
    * in the vocabulary by construction).
    *
    * Output: (idCol, n_tokens, avg_nll) with avg_nll = ln(total_tokens) −
    * mean(ln(count(token))); 0.0 for empty documents.
    *
    * Scale posture: tokens are first reduced to per-document distinct
    * (doc, token, tf) rows (map-side combinable groupBy), so the join
    * against the vocabulary carries one row per distinct token per doc —
    * not one per token occurrence. The vocabulary itself is a groupBy on
    * token (Zipf-skewed key: partial aggregation absorbs the hot head
    * map-side; the (doc,token)⋈vocab equi-join is AQE-skew-splittable).
    * The corpus total rides along as a 1-row broadcast cross join. Nothing
    * is collected to the driver. */
  def unigramNllScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode_outer(TextFunctions.tokens(col(textCol))).as("__tok"))
    // per-doc term frequency first: shrinks the vocab join to distinct terms
    val tf = toks.filter(col("__tok").isNotNull)
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__tf"))
    val vocab = tf.groupBy(col("__tok")).agg(sum(col("__tf")).as("__cnt"))
    val total = vocab.agg(sum(col("__cnt")).as("__total"))
    val perDoc = tf.join(vocab, Seq("__tok"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).cast("long").as("n_tokens"),
           sum(col("__tf").cast("double") * log(col("__cnt").cast("double"))).as("__sum_ln_cnt"))
    docs.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(col("n_tokens").isNull || col("n_tokens") === 0L, lit(0.0))
          .otherwise(log(col("__total").cast("double")) - col("__sum_ln_cnt") / col("n_tokens"))
          .as("avg_nll"))
  }

  /** Portable hashed feature bucket: the first two hex characters of
    * md5(gram) read as a base-16 number → [0, 256). `conv` on the engine
    * side; strpos arithmetic on the oracle side — same value, no UDF. */
  private def bucket(gram: Column): Column =
    conv(substring(md5(gram), 1, 2), 16, 10).cast("int")

  /** Unigrams + bigrams over a PROJECTED token-array column — DSIR's
    * feature space. The token array must be materialized in its own column
    * first: handed the raw `tokens(text)` expression, the bigram lambda
    * re-runs the regex split once per element (the `shingled()` pitfall —
    * O(len²) regex work per document; measured 14× on the q116 gate). */
  private def gramsOfTokens(t: Column): Column =
    concat(t, TextFunctions.shinglesOfTokens(t, 2))

  /** DSIR-style importance weight for every document of `raw`: fit hashed
    * bag-of-n-gram (uni+bi) multinomials on `target` and on `raw` (add-one
    * smoothing over the `buckets` feature space), then score each raw
    * document by sum_b count_b(doc) · ln(p_target(b) / p_raw(b)).
    *
    * Output: (idCol, n_grams, log_weight); empty documents get 0.0.
    * Resample by `exp(log_weight)` (Gumbel top-k or [[Sampling]]'s
    * deterministic keep-rule) to skew a raw corpus toward the target
    * distribution without a learned classifier.
    *
    * Scale posture: both models are a groupBy over at most `buckets`
    * distinct keys (fully map-side combinable, reduce side is tiny) and are
    * broadcast as a `buckets`-row ratio table into the per-document scoring
    * join — the raw corpus is traversed exactly twice (model fit + scoring)
    * and never shuffled on a wide key. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= 256, s"buckets must be in [2, 256], got $buckets")
    def bucketed(df: DataFrame, keepId: Boolean): DataFrame = {
      val base = if (keepId) df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
                 else df.select(lit(0L).as(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      base.select(col(idCol), explode(gramsOfTokens(col("__t"))).as("__g"))
        .select(col(idCol), (bucket(col("__g")) % buckets).as("__b"))
    }
    // the raw corpus is exploded + hashed ONCE: the same bucketed rows feed
    // the raw model's counts and the per-document scoring aggregation (the
    // cached subtree is computed a single time inside the job)
    // ScratchCache (bounded FIFO), not a bare cache(): the entry otherwise
    // lingers in the CacheManager for the session's lifetime
    val rawB = ScratchCache(bucketed(raw, keepId = true))
    // add-one smoothed log p(b) per model, joined into one ratio table on
    // the dense bucket domain (buckets with zero mass still get smoothing)
    val domain = raw.sparkSession.range(buckets.toLong).select(col("id").cast("int").as("__b"))
    def logP(bucketCounts: DataFrame, as: String): DataFrame = {
      val cnts = domain.join(bucketCounts, Seq("__b"), "left")
        .select(col("__b"), coalesce(col("__n"), lit(0L)).as("__n"))
      cnts.crossJoin(broadcast(cnts.agg(sum(col("__n")).as("__tot"))))
        .select(col("__b"),
          log((col("__n") + 1).cast("double") / (col("__tot") + buckets).cast("double")).as(as))
    }
    def counts(b: DataFrame): DataFrame = b.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
    val ratio = logP(counts(bucketed(target, keepId = false)), "__lt")
      .join(logP(counts(rawB), "__lr"), Seq("__b"))
      .select(col("__b"), (col("__lt") - col("__lr")).as("__lratio"))
    val perDoc = rawB
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
      .join(broadcast(ratio), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).cast("long").as("n_grams"),
           sum(col("__c").cast("double") * col("__lratio")).as("log_weight"))
    raw.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }
}
