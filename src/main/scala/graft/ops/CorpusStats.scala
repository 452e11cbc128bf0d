package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level reporting for curation runs — the summary tables a data
  * team reads before/after every pipeline stage ("how many docs/tokens per
  * language and source, how much exact duplication, how are lengths
  * distributed"). All single-pass native aggregations: at 100 TB these are
  * the cheapest queries in the system (one scan, partial aggs map-side,
  * tiny result), and the rollup variant computes every margin in the same
  * shuffle rather than one job per grouping.
  */
object CorpusStats {

  // cosineLshRecallReport banding UDF, memoized per (planes, bands, seed,
  // dim): plan canonicalization compares ScalaUDF functions by reference —
  // a fresh closure per call would defeat every cache lookup over the plan
  private val cosineKeysUCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Long, Int), org.apache.spark.sql.expressions.UserDefinedFunction]()

  /** Per-(lang, source) corpus report with ROLLUP margins: every row
    * carries doc count, token count, character sum and the number of
    * DISTINCT texts (md5 content key — `n_docs - n_distinct` is the exact
    * duplicate overhang). Grouped-out rollup levels surface as '(all)'
    * via `grouping()` — margin rows are self-describing even when the
    * group columns contain genuine NULL values (which stay NULL).
    *
    * One shuffle computes all three grouping levels (Spark expands the
    * rollup before the exchange and partial-aggregates each level
    * map-side); count_distinct adds its usual expand, still bounded by
    * the (lang, source, text-hash) distinct set. */
  def corpusReport(docs: DataFrame, textCol: String,
                   langCol: String, sourceCol: String): DataFrame =
    docs
      .select(col(langCol).as("__lang"), col(sourceCol).as("__source"),
        col(textCol).as("__text"))
      .rollup(col("__lang"), col("__source"))
      .agg(
        // grouping() = 1 exactly on rollup-margin rows: a genuine NULL
        // lang/source VALUE keeps its NULL (distinguishable from the
        // '(all)' margins), where the previous coalesce conflated the two
        grouping(col("__lang")).as("__gl"),
        grouping(col("__source")).as("__gs"),
        count(lit(1)).cast("long").as("n_docs"),
        sum(TextFunctions.tokenCount(col("__text"))).cast("long").as("n_tokens"),
        sum(length(col("__text"))).cast("long").as("n_chars"),
        countDistinct(md5(col("__text"))).cast("long").as("n_distinct"))
      .select(
        when(col("__gl") === 1, lit("(all)")).otherwise(col("__lang")).as("lang"),
        when(col("__gs") === 1, lit("(all)")).otherwise(col("__source")).as("source"),
        col("n_docs"), col("n_tokens"), col("n_chars"), col("n_distinct"))

  /** Snapshot diff between two corpus versions — the first report an
    * incremental crawl pipeline computes: per-document content keys (md5)
    * full-outer-joined on the id, classified added / removed / changed /
    * unchanged, counted. One shuffle on the id; content never moves, only
    * 16-byte keys. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), md5(col(textCol)).as("__ho"))
    val n = newDf.select(col(idCol), md5(col(textCol)).as("__hn"))
    o.join(n, Seq(idCol), "full_outer")
      .select(when(col("__ho").isNull, "added")
        .when(col("__hn").isNull, "removed")
        .when(col("__ho") === col("__hn"), "unchanged")
        .otherwise("changed").as("status"))
      .groupBy(col("status")).agg(count(lit(1)).cast("long").as("n_docs"))
  }

  /** Measured recall of the banded MinHash path against exact brute-force
    * ground truth on a DETERMINISTIC sample — how a 100 TB pipeline tunes
    * (numHashes, bands, threshold) without an all-pairs pass over the
    * corpus: the md5-keyed sample is retry-stable and replayable, truth is
    * all-pairs only WITHIN the sample, and found ⊆ truth by construction
    * (the banded path verifies exact Jaccard), so recall = found / truth.
    * Output: one row (n_sample, truth_pairs, found_pairs, recall). */
  def lshRecallReport(docs: DataFrame, idCol: String, textCol: String,
                      sampleFraction: Double, salt: String,
                      k: Int = 2, numHashes: Int = 16, bands: Int = 4,
                      threshold: Double = 0.4): DataFrame = {
    // same materialize-once posture as cosineLshRecallReport: the sample
    // feeds the shingled truth, the banded found-side and n_sample
    val sample = ScratchCache(Sampling.deterministicSample(docs, idCol, sampleFraction, salt)
      .select(col(idCol), col(textCol)))
    // truth = exact all-pairs jaccard ≥ threshold, computed WITHOUT the
    // all-pairs cartesian (optimization round 21): jaccard(A,B) =
    // c/(|A|+|B|−c) with c = |A∩B|, and c comes from one shingle
    // EQUI-join + count per pair — pairs sharing no shingle have
    // jaccard 0 and can never reach a positive threshold, so skipping
    // them is exact. Before: BroadcastNestedLoopJoin over n²/2 pairs,
    // each paying array_intersect/array_union over full shingle arrays
    // (q133 measured 5.09 s); after: hash equi-join + partial-agg counts
    // (the same shuffle-friendly shape the prefix filter uses).
    require(threshold > 0,
      s"threshold must be > 0 for the equi-join truth pass; got $threshold")
    val sets = sample
      .select(col(idCol).as("__id"),
        array_distinct(TextFunctions.shingles(col(textCol), k)).as("__set"))
      .filter(size(col("__set")) > 0)
    val ex = sets.select(col("__id"), size(col("__set")).as("__n"),
      explode(col("__set")).as("__g"))
    val truth = ex.select(col("__g"), col("__id").as("__ia"), col("__n").as("__na"))
      .join(ex.select(col("__g"), col("__id").as("__ib"), col("__n").as("__nb")),
        Seq("__g"))
      .filter(col("__ia") < col("__ib"))
      .groupBy(col("__ia"), col("__ib"), col("__na"), col("__nb"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c").cast("double") /
        (col("__na") + col("__nb") - col("__c")).cast("double") >= threshold)
      .agg(count(lit(1)).cast("long").as("truth_pairs"))
    val found = Dedup.minhashPairs(sample, idCol, textCol, k, numHashes, bands, threshold)
      .agg(count(lit(1)).cast("long").as("found_pairs"))
    val n = sample.agg(count(lit(1)).cast("long").as("n_sample"))
    n.crossJoin(truth).crossJoin(found)
      .select(col("n_sample"), col("truth_pairs"), col("found_pairs"),
        round(when(col("truth_pairs") === 0L, lit(1.0))
          .otherwise(col("found_pairs").cast("double") / col("truth_pairs").cast("double")), 6)
          .as("recall"))
  }

  /** Cosine-LSH recall report — the embedding-side sibling of
    * [[lshRecallReport]], closing the tuning loop on
    * [[Similarity.knnBanding]]: that helper PREDICTS recall analytically
    * (bands solved from `1−(1−p^rpb)^bands ≥ recall`,
    * `p = 1 − arccos(t)/π`); this report MEASURES it on a deterministic
    * sample before a 100 TB run commits to a banding. Truth is all-pairs
    * cosine ≥ threshold WITHIN the md5 sample only (the one quadratic step,
    * bounded by the sample), candidates come from the multi-table
    * Rademacher-plane banding ([[Similarity.radPlane]] md5 spec — the same
    * deterministic planes the ANN bucket index uses, so a plain-SQL oracle
    * replays bucket assignment exactly), and found ⊆ truth because banded
    * candidates are cosine-verified. Output: one row (n_sample, planes,
    * bands, truth_pairs, found_pairs, recall, predicted_recall) — measured
    * vs predicted side by side.
    *
    * Defaults take the banding from [[Similarity.knnBanding]] at
    * (threshold, recall); pass explicit `planes`/`bands` (> 0, divisible)
    * to tune a specific configuration, e.g. coarser bands for
    * low-threshold corpora where 20-bit keys are unattainable. */
  def cosineLshRecallReport(embs: DataFrame, idCol: String, vecCol: String,
                            sampleFraction: Double, salt: String,
                            planes: Int = -1, bands: Int = -1,
                            threshold: Double = 0.9, recall: Double = 0.9,
                            seed: Long = 42L, dim: Int = 64): DataFrame = {
    val (pl, bd) =
      if (planes > 0 && bands > 0) (planes, bands)
      else {
        require(planes <= 0 && bands <= 0, "pass both planes and bands, or neither")
        Similarity.knnBanding(threshold, recall)
      }
    require(pl % bd == 0, "planes must be divisible by bands")
    val rpb = pl / bd
    val bandPlanes: Array[Array[Array[Double]]] = {
      val all = Similarity.radPlane(pl, dim, seed)
      Array.tabulate(bd)(b => all.slice(b * rpb, (b + 1) * rpb))
    }
    // the sample feeds four sub-plans (banding, both lookup sides, the
    // truth cross-join, n_sample) — cache it so the scan + md5 sample
    // filter run once, not per consumer. cache(), not localCheckpoint: the
    // report's consuming jobs can run long on a cluster and checkpoint
    // blocks don't survive executor loss (lineage is truncated), while a
    // cache degrades to recompute. A tuning report runs a handful of times
    // per session, so the lingering entry is bounded (and the q139 bench
    // harness clears caches between queries).
    val sample = ScratchCache(Sampling.deterministicSample(embs, idCol, sampleFraction, salt)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .filter(col("__v").isNotNull))
    // memoized per (planes, bands, seed, dim) — stable function reference
    // keeps re-built plans canonically equal (the hyperplaneKeysU argument)
    val keysU = cosineKeysUCache.computeIfAbsent((pl, bd, seed, dim), _ =>
      udf((v: Seq[Float]) => bandPlanes.map(p => Similarity.bucketOf(v, p))))
    val banded = sample
      .select(col("__id"), posexplode(keysU(col("__v"))).as(Seq("__band", "__key")))
    val candIds = banded.select(col("__band"), col("__key"), col("__id").as("__ia"))
      .join(banded.select(col("__band"), col("__key"), col("__id").as("__ib")),
        Seq("__band", "__key"))
      .filter(col("__ia") < col("__ib"))
      .select(col("__ia"), col("__ib")).dropDuplicates("__ia", "__ib")
    val va = sample.select(col("__id").as("__ia"), col("__v").as("__va"))
    val vb = sample.select(col("__id").as("__ib"), col("__v").as("__vb"))
    val found = candIds.join(va, Seq("__ia")).join(vb, Seq("__ib"))
      .filter(Similarity.cosine(col("__va"), col("__vb")) >= threshold)
      .agg(count(lit(1)).cast("long").as("found_pairs"))
    val truth = va.join(vb, col("__ia") < col("__ib"))
      .filter(Similarity.cosine(col("__va"), col("__vb")) >= threshold)
      .agg(count(lit(1)).cast("long").as("truth_pairs"))
    val n = sample.agg(count(lit(1)).cast("long").as("n_sample"))
    val p = 1.0 - math.acos(threshold) / math.Pi
    val predicted = 1.0 - math.pow(1.0 - math.pow(p, rpb.toDouble), bd.toDouble)
    n.crossJoin(truth).crossJoin(found)
      .select(col("n_sample"), lit(pl).as("planes"), lit(bd).as("bands"),
        col("truth_pairs"), col("found_pairs"),
        round(when(col("truth_pairs") === 0L, lit(1.0))
          .otherwise(col("found_pairs").cast("double") / col("truth_pairs").cast("double")), 6)
          .as("recall"),
        round(lit(predicted), 6).as("predicted_recall"))
  }

  /** Exact token-length quantiles per group (linear interpolation — the
    * percentile definition DuckDB's quantile_cont shares, so the numbers
    * are oracle-checkable). Exact rather than sketched: at corpus scale
    * the per-group sort this implies is still one shuffle on the group
    * key, and a t-digest approximation would not be replayable by the
    * oracle — callers who want the sketch use Spark's approx_percentile
    * directly. */
  def lengthQuantiles(docs: DataFrame, textCol: String, groupCol: String,
                      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9)): DataFrame = {
    val tc = docs.select(col(groupCol).as("__g"),
      TextFunctions.tokenCount(col(textCol)).as("__tc"))
    val aggs: Seq[Column] = count(lit(1)).cast("long").as("n_docs") +:
      probs.map(p => percentile(col("__tc"), lit(p)).as(f"p${(p * 100).round}%02d"))
    tc.groupBy(col("__g").as(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-document n-gram novelty: the fraction of a document's DISTINCT
    * word n-grams that occur in NO other document — high = unique content
    * worth keeping, low = templated/boilerplate even when no single
    * near-dup partner exists (the signal that catches mass-produced page
    * families MinHash pairs miss because each page differs from each
    * other page). Output: every input doc as (idCol, n_grams,
    * novel_grams, novel_frac); docs shorter than `n` tokens report zeros.
    *
    * Scale posture: per-doc distinct grams map-side (array_distinct on the
    * shingle array, no explode-then-distinct shuffle), one hash-agg
    * shuffle on the gram string counting OWNER DOCS, and the per-doc
    * roll-up joins back on the id — document text never shuffles. */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 2): DataFrame = {
    // spread a pathologically narrow input before the shingle/explode map
    // work (the Dedup.shingled posture — a single small parquet file
    // otherwise serializes the whole pass into one scan task; q155 profile
    // read two ~0.48 s single-task stages)
    val base = Dedup.spreadNarrow(docs.select(col(idCol), col(textCol)))
    // ONE shingle pass: the per-doc distinct-gram arrays feed both the
    // ownership aggregate and the per-doc totals — uncached, each consumer
    // re-ran the shingle map work (the bandedJaccardPairs sigT precedent)
    val arr = ScratchCache(base.select(col(idCol),
      array_distinct(TextFunctions.shingles(col(textCol), n)).as("__a")))
    val grams = arr.select(col(idCol), explode(col("__a")).as("__g"))
    // a NOVEL gram has exactly one (doc, gram) row corpus-wide (grams are
    // per-doc distinct), so min(id) of that single row IS its owning
    // document — the novel-gram credit flows straight out of the ownership
    // aggregate. The old shape joined the FULL gram table back against the
    // owner counts on the gram STRING (every gram row re-shuffled with its
    // string as the key) just to regroup by doc; this computes the same
    // numbers with the join-back gone (§2.3/§2.4): one string-keyed agg
    // (unavoidable — corpus-wide gram identity), then long-keyed aggs only.
    val novel = grams.groupBy(col("__g"))
      .agg(count(lit(1)).as("__nd"), min(col(idCol)).as("__owner"))
      .filter(col("__nd") === 1)
      .groupBy(col("__owner")).agg(count(lit(1)).as("__nov"))
      .withColumnRenamed("__owner", idCol)
    // per-doc totals map-side: rows per id in `grams` ≡ per-row distinct
    // shingle count summed over the id's rows — no second explode pass,
    // and the shuffle carries (id, int) with partial aggregation
    val totals = arr
      .select(col(idCol),
        coalesce(size(col("__a")).cast("long"), lit(0L)).as("__t1"))
      .groupBy(col(idCol)).agg(sum(col("__t1")).as("__tot"))
    docs.select(col(idCol)).distinct()
      .join(totals, Seq(idCol), "left")
      .join(novel, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__tot"), lit(0L)).as("n_grams"),
        coalesce(col("__nov"), lit(0L)).as("novel_grams"),
        round(coalesce(col("__nov"), lit(0L)) /
          greatest(coalesce(col("__tot"), lit(0L)), lit(1L)), 6).as("novel_frac"))
  }

  /** One Misra–Gries pass over a partition: ≤ k−1 surviving counters.
    * Shared by [[mgSketch]] and [[heavyHitters]] — the decrement-all rule
    * must stay identical in both. */
  private def mgPartition(it: Iterator[String], k: Int): scala.collection.mutable.HashMap[String, Long] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      if (t != null) {
        if (counters.contains(t)) counters(t) += 1L
        else if (counters.size < k - 1) counters(t) = 1L
        else {
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          counters.keysIterator.foreach { key =>
            val c = counters(key) - 1L
            if (c == 0L) dead += key else counters(key) = c
          }
          dead.foreach(counters.remove)
        }
      }
    }
    counters
  }

  /** MERGEABLE Misra–Gries sketch as a DataFrame: ≤ k−1 (term, est) rows
    * with the frequent-items guarantee `true − N/k <= est <= true` over
    * everything folded in so far. [[heavyHitters]] recounts exactly in a
    * second pass; this is the single-pass/incremental face for streams and
    * snapshot folds, where re-reading the corpus is not an option.
    *
    * Folding: `mgMerge(old, mgSketch(batch), k)` — summed counts are a
    * valid union sketch; the compress step subtracts the k-th largest
    * count and drops non-positives (Agarwal et al. 2012, "Mergeable
    * summaries": the MG error bound is additive under this merge, so the
    * folded error stays ≤ N_total/k). The sketch is ≤ k−1 rows at rest —
    * always broadcastable, like [[graft.ops.Dedup.bloomSketch]]. */
  def mgSketch(termDf: DataFrame, termCol: String, k: Int): DataFrame = {
    require(k > 1, s"k must be > 1; got $k")
    val spark = termDf.sparkSession
    import spark.implicits._
    val perPart = termDf.select(col(termCol).cast("string").as("__term"))
      .as[String].mapPartitions(it => mgPartition(it, k).iterator).toDF("term", "est")
    compress(perPart.groupBy("term").agg(sum(col("est")).as("est")), k)
  }

  /** Fold another sketch (or a fresh batch's [[mgSketch]]) into `sketch`.
    * Both inputs carry (term, est); output ≤ k−1 rows. */
  def mgMerge(sketch: DataFrame, other: DataFrame, k: Int): DataFrame =
    compress(sketch.unionByName(other)
      .groupBy("term").agg(sum(col("est")).as("est")), k)

  /** MG compress: keep the k−1 largest after subtracting the k-th largest
    * count (all estimates shrink by it — the merge step of the mergeable-
    * summaries construction). Runs over ≤ k·partitions rows. */
  private def compress(summed: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("est").desc, col("term"))
    val ranked = summed.withColumn("__rk", row_number().over(w))
    val kth = ranked.filter(col("__rk") === k)
      .select(col("est")).collect().headOption.map(_.getLong(0)).getOrElse(0L)
    ranked.filter(col("__rk") < k)
      .select(col("term"), (col("est") - lit(kth)).as("est"))
      .filter(col("est") > 0)
  }

  /** EXACT heavy hitters with sketch-bounded shuffle: every term occurring
    * MORE than `total/k` times (the φ = 1/k frequent-items threshold),
    * with its exact count.
    *
    * A plain `groupBy(term).count` shuffles one partial row per distinct
    * term per upstream partition — at 100 TB the distinct-term set (URLs,
    * n-grams, hostnames) can be billions of rows of exchange for a report
    * whose answer is a handful of terms. This instead runs MISRA–GRIES
    * summaries (k counters, the public frequent-items algorithm) inside
    * each input partition to produce a candidate set, then exactly
    * recounts ONLY the candidates. The union of per-partition MG item
    * sets provably contains every term with global count > total/k
    * (per-partition undercount is ≤ N_p/k; summed ≤ N/k, so a global
    * heavy hitter keeps a positive merged estimate and must appear in at
    * least one summary), making the final output EXACT — candidates are a
    * recall guarantee, never a precision claim. Shuffle volume: candidate
    * terms only (≤ k·numPartitions rows broadcast; recount rows only for
    * candidate occurrences).
    *
    * `termDf` = one row per occurrence (pre-exploded). Output:
    * (term, cnt), cnt > total/k. */
  def heavyHitters(termDf: DataFrame, termCol: String, k: Int): DataFrame = {
    require(k > 1, s"k must be > 1; got $k")
    val spark = termDf.sparkSession
    import spark.implicits._
    val terms = termDf.select(col(termCol).cast("string").as("__term"))
    // Misra–Gries per partition (shared [[mgPartition]] rule); the SAME
    // pass also emits each partition's non-null row count (a tagged row),
    // so candidates AND the total come from one scan — the recount is the
    // only other scan, matching the "two corpus scans" contract
    val mgPass = terms.as[String].mapPartitions { it =>
      var np = 0L
      val counted = it.map { t => if (t != null) np += 1; t }
      val counters = mgPartition(counted, k)
      counters.keysIterator.map(t => (false, t, 0L)) ++ Iterator((true, "", np))
    }.toDF("__isTotal", "__term", "__np").cache()
    // candidates materialize eagerly (<= k x partitions rows) so the
    // cached MG pass can be released before the lazy recount runs
    val candidates = mgPass.filter(!col("__isTotal"))
      .select(col("__term")).distinct().localCheckpoint()
    val total = mgPass.filter(col("__isTotal"))
      .agg(coalesce(sum(col("__np")), lit(0L))).head().getLong(0)
    mgPass.unpersist(false)
    terms.join(broadcast(candidates), Seq("__term"), "left_semi")
      .groupBy(col("__term").as("term"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > lit(total)) // exact integer compare: cnt > total/k
  }
}
