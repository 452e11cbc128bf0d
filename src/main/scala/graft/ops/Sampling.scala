package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and batch-packing operators for training-data
  * pipelines.
  *
  * Sampling is HASH-based, not `rand()`-based, on purpose: at 100 TB a
  * sample must be reproducible across job restarts AND stable under task
  * retry — `rand()` re-draws on a recomputed partition, silently changing
  * the sample. The keep-decision is the first 24 bits of md5("salt:id")
  * (native codegen `md5`, no UDF) compared as lowercase hex against the
  * hex threshold floor(fraction·2²⁴) — bit-identical in any engine with a
  * standard md5, so an external oracle replays every decision exactly.
  * All operators here are pure map-side filters or windowed passes — no
  * shuffle beyond the window's own shard exchange.
  */
object Sampling {

  /** First 6 hex digits (24 bits) of md5("salt:id") — a uniform draw in
    * [0, 2²⁴) encoded as lowercase hex. Changing the salt draws an
    * independent sample. */
  def hashHex(idCol: Column, salt: String): Column =
    substring(md5(concat_ws(":", lit(salt), idCol.cast("string"))), 1, 6)

  private def hexThreshold(fraction: Double): String =
    f"${math.floor(fraction * (1 << 24)).toLong}%06x"

  /** The boolean keep-decision behind [[deterministicSample]], exposed so
    * other operators (e.g. [[graft.ops.Dedup.clusterAwareSplit]]) can
    * reuse the identical oracle-replayable draw on their own key column.
    * `fraction >= 1` is the all-pass literal (the hex threshold would
    * wrap, see [[stratifiedSample]]). */
  def isSampled(key: Column, fraction: Double, salt: String = "s"): Column =
    if (fraction >= 1.0) lit(true)
    else hashHex(key, salt) < lit(hexThreshold(fraction))

  /** Keep each row with probability `fraction`, deterministically by id. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          salt: String = "s"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]; got $fraction")
    if (fraction >= 1.0) df
    else df.filter(isSampled(col(idCol), fraction, salt))
  }

  /** Stratified sampling with per-group fractions — the data-mixing
    * primitive (e.g. keep 50% of `en`, 10% of everything else). Groups
    * absent from `weights` fall back to `defaultFraction`. Map-side only:
    * the group column is compared against literal thresholds, no shuffle. */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
                       weights: Map[String, Double], defaultFraction: Double = 0.0,
                       salt: String = "s"): DataFrame = {
    require((defaultFraction +: weights.values.toSeq).forall(f => f >= 0 && f <= 1),
      "all fractions must be in [0,1]")
    // fraction 1.0 ⇒ threshold "1000000" (7 chars) which is lexicographically
    // BELOW any 6-hex-digit draw — special-case it to the all-pass sentinel
    def t(f: Double): String = if (f >= 1.0) "g" else hexThreshold(f)
    val thresh = weights.toSeq.sortBy(_._1).foldLeft(lit(t(defaultFraction))) {
      case (acc, (g, f)) => when(col(groupCol) === g, lit(t(f))).otherwise(acc)
    }
    df.filter(hashHex(col(idCol), salt) < thresh)
  }

  /** Deterministic weighted sampling WITHOUT replacement via Gumbel top-k
    * (Efraimidis–Spirakis/Gumbel-max: perturb each row's log-weight with an
    * independent Gumbel draw, take the k largest — the result is a true
    * weight-proportional sample). The Gumbel draw is hash-derived, not
    * `rand()`: u = (hash24 + 0.5) / 2²⁴ from the [[hashHex]] spec (strictly
    * inside (0,1), so the double log never sees 0), g = −ln(−ln(u)) —
    * reproducible across restarts, task retries, and external oracles.
    *
    * This is the resample step of DSIR-style curation: feed it
    * [[LmQuality.importanceWeights]]' `log_weight` and the kept set is
    * distributionally tilted toward the target corpus.
    *
    * Scale posture: one map-side projection + a global top-k
    * (TakeOrderedAndProject — per-partition heaps of size k, then one
    * k-row merge on the driver side of the exchange; no global sort). */
  def weightedTopK(df: DataFrame, idCol: String, logWeightCol: String, k: Int,
                   salt: String = "s"): DataFrame = {
    require(k > 0, s"k must be positive; got $k")
    val u = (conv(hashHex(col(idCol), salt), 16, 10).cast("double") + 0.5) /
      (1 << 24).toDouble
    val score = col(logWeightCol) + -log(-log(u))
    df.withColumn("__score", score)
      .orderBy(col("__score").desc, col(idCol))
      .limit(k)
  }

  /** Chunked sequence packing: assign documents to fixed-token-budget packs
    * in deterministic (shard, id) order; `pack` is the bin a doc STARTS in
    * (a doc may straddle a boundary — the training loader splits it, the
    * standard one-pass streaming-packing approximation, not a bin-packing
    * solve). Sharding bounds the window: each shard's prefix-sum is an
    * independent partition of the exchange, so there is no global-order
    * single-partition bottleneck; packs are globally unique as
    * (shard, pack). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budgetTokens: Long, shards: Int = 1024): DataFrame = {
    require(budgetTokens > 0 && shards > 0, "budgetTokens and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("shard", pmod(col(idCol), lit(shards)).cast("long"))
      .withColumn("__pre", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack", floor(col("__pre").cast("double") / budgetTokens.toDouble).cast("long"))
      .drop("__pre")
  }

  /** Sliding-window document chunking — the inverse of [[packSequences]]:
    * split each document into token windows of `chunkTokens` with
    * `overlapTokens` shared between consecutive windows (the RAG /
    * long-context-training chunking step). Chunk starts walk the token
    * array at stride `chunkTokens - overlapTokens` while they point at a
    * real token, so the final chunk may be short (and, when the stride is
    * small relative to the doc tail, entirely contained in its
    * predecessor — filter `n_tokens <= overlapTokens` downstream if that
    * matters). Token model = [[TextFunctions.tokens]]; empty docs emit no
    * chunks; ids stay with every chunk as (`idCol`, chunk_idx).
    *
    * Scale posture: pure map-side — tokenize, `sequence` over starts,
    * one `posexplode`, native `slice`/`array_join`. No shuffle, no UDF,
    * streaming-safe; output size is input tokens × (1 + overlap/stride). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1; got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens); got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as(Seq("chunk_idx", "__start")))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("__start")).cast("long").as("n_tokens"))
  }

  /** Assemble each pack's training chunk: member documents concatenated in
    * id order with a separator token, plus doc/token counts. One groupBy on
    * (shard, pack) — rows are already hash-partitioned by shard from the
    * packing window, and a chunk's size is bounded by the token budget by
    * construction, so the collect_list per group is small and safe. */
  def assemblePacks(packed: DataFrame, idCol: String, textCol: String,
                    sep: String = " <doc> "): DataFrame =
    packed.groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        array_join(transform(array_sort(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(textCol)), sep).as("pack_text"))

  /** Token-budget domain mixing: walk each domain's documents in a
    * deterministic pseudo-random order (the [[hashHex]] draw, then id) and
    * keep them until the domain's TOKEN budget is exhausted — the "sample
    * this mixture to N billion tokens per domain" step of corpus assembly,
    * where budgets come from a mixing recipe (e.g. DoReMi weights × total
    * token target). A document whose run starts strictly inside the budget
    * is kept whole (budgets may overshoot by at most one document — the
    * same one-pass streaming convention as [[packSequences]]); domains
    * absent from `budgets` fall back to `defaultBudget`.
    *
    * Scale posture: NO global-order window. The first hex char of the hash
    * is a 16-way shard that is a PREFIX of the sort key, so per-(domain,
    * shard) exclusive prefix-sums plus a cumulated per-shard offset (16
    * rows per domain, broadcast back) reproduce the exact global
    * per-domain running total — each window partition holds 1/16 of one
    * domain, and widening the shard prefix bounds partitions at any
    * corpus size. Output: every input row with its `n_tokens`,
    * `cum_before` (tokens admitted to the domain before it) and `keep`. */
  def tokenBudgetMix(df: DataFrame, idCol: String, textCol: String,
                     domainCol: String, budgets: Map[String, Long],
                     defaultBudget: Long = 0L, salt: String = "mix"): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val w = Window.partitionBy(col(domainCol), col("__shard"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = df
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("__h", hashHex(col(idCol), salt))
      .withColumn("__shard", substring(col("__h"), 1, 1))
      .withColumn("__pre", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
    val wo = Window.partitionBy(col(domainCol)).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy(col(domainCol), col("__shard"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wo), lit(0L)))
      .select(col(domainCol), col("__shard"), col("__off"))
    // literal budget lookup — map-side, no join against a budget table
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (dom, b)) =>
      when(col(domainCol) === dom, lit(b)).otherwise(acc)
    }
    base.join(broadcast(offs), Seq(domainCol, "__shard"))
      .withColumn("cum_before", col("__off") + col("__pre"))
      .select(col(idCol), col(domainCol), col("n_tokens"), col("cum_before"),
        (col("cum_before") < budget).as("keep"))
  }
}
