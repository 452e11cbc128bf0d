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
  * iterations a real tokenizer needs. Larger vocabularies fall back to a
  * distributed loop (a pair-count aggregation + a map-side merge per
  * round). Encoding a corpus with a trained merge list is one map-side
  * pass with the merges broadcast. */
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

  private def trainDistributed(freqs: DataFrame, numMerges: Int): Seq[(Int, String, String, Long)] = {
    var words = freqs.withColumn("syms", initSymbols(col("word")))
      .select("syms", "freq").localCheckpoint()
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
