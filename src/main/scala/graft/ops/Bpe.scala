package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training + application
  * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — the public ACL formulation; merge
  * application is the paper's left-to-right non-overlapping scan).
  *
  * The scale split mirrors how BPE is actually trained on a corpus: the
  * only corpus-sized job is the word-frequency aggregation (one shuffle on
  * the word key); every training iteration then operates on the DISTINCT
  * word table — state bounded by vocabulary, not corpus size. When that
  * vocabulary fits under `localVocabThreshold` (probed with a
  * limit-count, the same guard pattern as the broadcast spatial join) the
  * merge loop runs on the driver over the collected table — numerically
  * identical by construction, and the right call for the thousands of
  * iterations a real tokenizer needs. Larger vocabularies use the
  * incremental distributed loop ([[trainDistributed]]): ONE full
  * pair-count aggregation, then exact driver-side counts updated by one
  * small delta job per merge batch — not one aggregate+sort job per merge,
  * which at a real 32k-merge vocabulary is a scheduler DoS. Encoding a
  * corpus with a trained merge list is one map-side pass with the merges
  * broadcast. */
object Bpe {

  /** End-of-word marker — makes "est " and "est" distinct subwords, per the
    * paper. */
  val EndOfWord = "</w>"

  /** Corpus word-frequency table: whitespace tokens and their counts — the
    * one corpus-scale aggregation (uniform word key, map-side partials). */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbolization of a word column: its characters plus
    * [[EndOfWord]]. (`split` on the empty pattern keeps a trailing empty
    * element under Spark's limit=-1 semantics — filter it out.) */
  def initSymbols(word: Column): Column =
    concat(filter(split(word, ""), s => length(s) > 0), array(lit(EndOfWord)))

  /** Adjacent-pair frequencies over a (syms, freq) word table: one row per
    * distinct symbol pair with its corpus-weighted count. Native
    * slice/zip_with — no UDF in the counting path. */
  def pairCounts(words: DataFrame): DataFrame = {
    val n = size(col("syms"))
    words
      .filter(n >= 2)
      .select(col("freq"), explode(zip_with(
        slice(col("syms"), lit(1), n - 1),
        slice(col("syms"), lit(2), n - 1),
        (a, b) => struct(a.as("left"), b.as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("freq")).as("freq"))
  }

  /** One merge applied to a symbol sequence: left-to-right, non-overlapping
    * (the `(aaa, a+a) -> (aa, a)` convention of the reference
    * implementation's regex substitution). */
  private[graft] def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `numMerges` BPE merges on the corpus. Returns the merge table
    * (rank asc) — (rank, left, right, freq), deterministic tie-break
    * (freq desc, left asc, right asc). Stops early if no pair remains. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            localVocabThreshold: Long = 1L << 20): Seq[(Int, String, String, Long)] = {
    require(numMerges >= 0, s"numMerges must be non-negative; got $numMerges")
    val freqs = wordFreqs(df, textCol)
    val vocabSmall =
      freqs.limit(localVocabThreshold.toInt + 1).count() <= localVocabThreshold
    if (vocabSmall) trainLocal(freqs, numMerges)
    else trainDistributed(freqs, numMerges)
  }

  private def trainLocal(freqs: DataFrame, numMerges: Int): Seq[(Int, String, String, Long)] = {
    var words: Array[(Array[String], Long)] = freqs.collect().map { r =>
      (r.getString(0).split("").filter(_.nonEmpty) :+ EndOfWord, r.getLong(1))
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (s, f) =>
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((rank, l, r, f))
        words = words.map { case (s, fr) => (applyMerge(s, l, r).toArray, fr) }
        rank += 1
      }
    }
    merges.result()
  }

  /** A whole symbol-disjoint merge BATCH applied in one left-to-right scan
    * (equivalent to applying each batch member with [[applyMerge]] in any
    * order, because batch pairs share no symbols and so cannot overlap or
    * interact inside a word). */
  private[graft] def applyBatchScan(syms: Seq[String],
                                    batch: Set[(String, String)]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && batch((syms(i), syms(i + 1)))) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Distributed training WITHOUT one Spark job per merge (the naive loop
    * is a scheduler DoS at real vocab sizes — 32k merges = 32k
    * aggregate+sort jobs). Instead:
    *
    *  - ONE full pair-count aggregation; the driver keeps the exact pair
    *    counts from then on (bounded by distinct ADJACENT symbol pairs —
    *    ~1e5..1e6 for natural-language corpora, guarded by
    *    `maxDriverPairs` with the per-round loop as the fallback);
    *  - each pass selects a batch of merges that is PROVABLY the next
    *    merges sequential BPE would pick (see below), then runs ONE small
    *    Spark job computing the exact pair-count deltas of applying the
    *    whole batch; the driver folds the deltas and repeats. Words update
    *    lazily (map-side scan), lineage truncated every `checkpointEvery`
    *    passes.
    *
    * Batch-exactness argument: candidates are walked in sequential order
    * (freq desc, left asc, right asc) and the batch is the maximal PREFIX
    * such that each accepted pair (a) shares no symbol — including the
    * concatenated merge result string — with any previously accepted pair,
    * and (b) has count strictly above every previously accepted pair's
    * created/boosted-pair cap. (a) means accepted counts are unchanged by
    * earlier batch members; any pair a prior merge could decrease ranks at
    * or below the stop point (everything above it in the prefix was
    * accepted, and a decreasing pair in the prefix stops the walk); and
    * (b) bounds pairs a merge l+r CREATES or boosts: (x, lr) occurrences
    * each contain an (x, l) occurrence and (lr, y) each contain (r, y), so
    * their counts stay ≤ max(maxCount(·,l), maxCount(r,·)) plus — when the
    * string l+r collides with a pre-existing symbol — that symbol's own
    * max pair count. Anything the batch might have mis-ordered therefore
    * ranks strictly below the accepted prefix, which is exactly the set
    * sequential BPE picks next, in the same order, with the same freqs
    * (parity-pinned against [[trainLocal]] in BpeSpec). */
  private[graft] def trainDistributed(freqs: DataFrame, numMerges: Int,
                                      maxDriverPairs: Long = 8L << 20,
                                      batchCap: Int = 64,
                                      checkpointEvery: Int = 24): Seq[(Int, String, String, Long)] = {
    var words = freqs.withColumn("syms", initSymbols(col("word")))
      .select("syms", "freq").localCheckpoint()
    val probe = pairCounts(words)
      .limit(math.min(maxDriverPairs + 1, Int.MaxValue - 1L).toInt).count()
    if (probe > maxDriverPairs) return trainDistributedPerRound(words, numMerges)
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    pairCounts(words).collect()
      .foreach(r => counts((r.getString(0), r.getString(1))) = r.getLong(2))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var passesSinceCkpt = 0
    while (rank <= numMerges && counts.nonEmpty) {
      // per-symbol max pair counts for the created/boosted-pair cap
      val maxLeft = scala.collection.mutable.HashMap.empty[String, Long]
      val maxRight = scala.collection.mutable.HashMap.empty[String, Long]
      counts.foreach { case ((a, b), c) =>
        if (c > maxLeft.getOrElse(a, 0L)) maxLeft(a) = c
        if (c > maxRight.getOrElse(b, 0L)) maxRight(b) = c
      }
      val sorted = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }
      val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      val used = scala.collection.mutable.HashSet.empty[String]
      var cap = Long.MinValue
      var stop = false
      val maxBatch = math.min(batchCap, numMerges - rank + 1)
      val it = sorted.iterator
      while (!stop && it.hasNext && batch.size < maxBatch) {
        val ((l, r), c) = it.next()
        if (used(l) || used(r)) stop = true
        else if (batch.nonEmpty && c <= cap) stop = true
        else {
          batch += ((l, r, c))
          val m = l + r
          used += l; used += r; used += m
          cap = math.max(cap, math.max(
            maxRight.getOrElse(m, 0L) + maxRight.getOrElse(l, 0L),
            maxLeft.getOrElse(m, 0L) + maxLeft.getOrElse(r, 0L)))
        }
      }
      batch.foreach { case (l, r, c) => merges += ((rank, l, r, c)); rank += 1 }
      // ONE delta job for the whole batch: affected words emit
      // (old pairs − new pairs)·freq; unaffected words emit nothing
      val bset: Set[(String, String)] = batch.map(t => (t._1, t._2)).toSet
      val deltaU = udf((syms: Seq[String], freq: Long) => {
        var touched = false
        var i = 0
        while (!touched && i + 1 < syms.length) {
          if (bset((syms(i), syms(i + 1)))) touched = true
          i += 1
        }
        if (!touched) Seq.empty[(String, String, Long)]
        else {
          val ns = applyBatchScan(syms, bset)
          val d = scala.collection.mutable.HashMap.empty[(String, String), Long]
          var j = 0
          while (j + 1 < ns.length) {
            val k = (ns(j), ns(j + 1)); d(k) = d.getOrElse(k, 0L) + freq; j += 1
          }
          j = 0
          while (j + 1 < syms.length) {
            val k = (syms(j), syms(j + 1)); d(k) = d.getOrElse(k, 0L) - freq; j += 1
          }
          d.iterator.collect { case ((a, b), v) if v != 0L => (a, b, v) }.toSeq
        }
      })
      val deltas = words
        .select(explode(deltaU(col("syms"), col("freq"))).as("d"))
        .groupBy(col("d._1").as("l"), col("d._2").as("r"))
        .agg(sum(col("d._3")).as("dv"))
        .collect()
      deltas.foreach { row =>
        val k = (row.getString(0), row.getString(1))
        val nv = counts.getOrElse(k, 0L) + row.getLong(2)
        if (nv <= 0L) counts.remove(k) else counts(k) = nv
      }
      val applyU = udf((syms: Seq[String]) => applyBatchScan(syms, bset))
      words = words.withColumn("syms", applyU(col("syms")))
      passesSinceCkpt += 1
      if (passesSinceCkpt >= checkpointEvery) {
        // truncate lineage so pass k's delta scan doesn't replay every
        // earlier pass's map UDF (the connected-components posture)
        words = words.localCheckpoint()
        passesSinceCkpt = 0
      }
    }
    merges.result()
  }

  /** The naive one-aggregation-per-merge loop — correct at ANY pair-space
    * size (nothing driver-resident), kept as the fallback when the
    * distinct-pair table exceeds what the driver should hold. */
  private def trainDistributedPerRound(wordsIn: DataFrame, numMerges: Int): Seq[(Int, String, String, Long)] = {
    var words = wordsIn
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("freq").desc, col("left"), col("right")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val l = top(0).getString(0); val r = top(0).getString(1)
        merges += ((rank, l, r, top(0).getLong(2)))
        val u = udf((syms: Seq[String]) => applyMerge(syms, l, r))
        // localCheckpoint: round k's plan must not replay rounds 1..k-1
        // (the nearest-join/connected-components lineage posture)
        val next = words.withColumn("syms", u(col("syms"))).localCheckpoint()
        words = next
        rank += 1
      }
    }
    merges.result()
  }

  /** Encode a text column with a trained merge list: whitespace pre-split,
    * per-word merge application in rank order, subwords rejoined in order.
    * Map-side only (merges ride the closure); the per-document cost is
    * O(len · merges touching it). Returns the input plus `bpe_tokens`
    * (array of subword strings) and `n_bpe_tokens`. */
  def encode(df: DataFrame, textCol: String, merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val ordered = merges.sortBy(_._1).map(m => (m._2, m._3)).toArray
    val u = udf((ws: Seq[String]) =>
      if (ws == null) null
      else ws.flatMap { w =>
        var s: Seq[String] = w.split("").filter(_.nonEmpty).toSeq :+ EndOfWord
        ordered.foreach { case (l, r) => s = applyMerge(s, l, r) }
        s
      })
    df.withColumn("bpe_tokens", u(TextFunctions.tokens(col(textCol))))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")))
  }
}
