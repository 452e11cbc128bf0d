package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-scale lexical retrieval — the BM25 ranking function (Robertson &
  * Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and Beyond";
  * idf form is the Lucene variant ln(1 + (N − df + 0.5)/(df + 0.5)), which
  * is non-negative for every df). Training-data pipelines use this for
  * retrieval-based decontamination (find corpus documents that *retrieve*
  * a benchmark question, not just share n-grams) and for targeted data
  * selection (pull documents matching a topic query out of a 100 TB crawl).
  *
  * Everything is native DataFrame composition over the engine-wide
  * whitespace tokenization ([[TextFunctions.tokens]]) — no UDFs, fully
  * reproducible by a plain-SQL oracle.
  *
  * Scale posture: the query's term set is a LITERAL `isin` filter applied
  * in the exploded scan projection, so the only rows that ever reach a
  * shuffle are (doc, matching-term) occurrences — the corpus itself never
  * shuffles. Document length is carried through that same projection
  * (`first` inside the tf aggregate), so no second join against a
  * per-document length table. Document frequencies aggregate the already
  * tiny (doc, term) distinct set and come back as a broadcast; the corpus
  * row count + total length ride along as a 1-row broadcast. The final
  * per-document score is one groupBy on the id of the matching subset.
  */
object Retrieval {

  /** BM25 score of every document of `docs` against the bag-of-words query
    * `queryTerms`. Output: one row per DISTINCT document id, (idCol, bm25)
    * — documents matching no query term score 0.0. Ids are expected unique
    * (one document per id); if duplicates arrive anyway, their term
    * frequencies merge into one id-level score (the per-id groupBy) and
    * exactly one output row is emitted per id — never duplicated rows.
    *
    * @param k1 term-frequency saturation (BM25 default 1.2)
    * @param b  length normalization (BM25 default 0.75)
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.distinct
    val withDl = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("double"))
    // N and total length: a 1-row broadcast (avgdl = __sumdl / __n, derived
    // identically on the oracle side — never pre-divided, so both engines
    // round the same expression)
    val stats = withDl.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__dl")).as("__sumdl"))
    // (doc, term) term frequencies restricted to the query's literal term
    // set BEFORE the shuffle; document length rides along via first()
    val tf = withDl
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(terms: _*))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"), first(col("__dl")).as("__dl"))
    // document frequency per query term: ≤ |terms| rows, broadcast back
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).cast("double").as("__df"))
    val scored = tf
      .join(broadcast(dfreq), Seq("__term"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s",
        col("__idf") * col("__tf") * lit(k1 + 1.0) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / (col("__sumdl") / col("__n")))))
      .groupBy(col(idCol)).agg(sum(col("__s")).as("bm25"))
    // distinct mirrors the oracle's SELECT DISTINCT doc_id: a duplicated id
    // would otherwise fan the left join out into duplicate score rows
    docs.select(col(idCol)).distinct().join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("bm25"), lit(0.0)).as("bm25"))
  }

  /** Per-document keyword extraction: the `k` highest tf·idf terms of each
    * document (idf = ln(N/df) over the corpus itself, tf·idf rounded to
    * 10⁻⁶ BEFORE ranking so the order is oracle-replayable; ties toward
    * the lexicographically smaller term). The classic corpus-signal for
    * tagging, domain mixing, and routing documents in a curation pipeline.
    * Output: (idCol, term, tf, tfidf, rank 1..k); documents whose every
    * term is corpus-universal still rank their terms (idf 0 ⇒ tfidf 0).
    *
    * Scale posture: two hash-agg shuffles on bounded keys — (id, term)
    * then term — a broadcast 1-row corpus count, and one per-document
    * window over that document's distinct terms. The document TEXT never
    * shuffles; the df join moves only (term, count) pairs, vocab-bounded
    * (AQE picks broadcast when the vocabulary is small). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("__df"))
    val n = docs.select(col(idCol)).distinct()
      .agg(count(lit(1)).cast("double").as("__n"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("__tf") * log(col("__n") / col("__df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("__tf").cast("long").as("tf"),
        col("tfidf"), col("rank"))
  }

  /** Top-`k` documents by BM25 score (ties broken by ascending id — fully
    * deterministic). Runs as TakeOrderedAndProject: per-partition heaps,
    * no global sort. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scores(docs, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("bm25").desc, col(idCol).asc)
      .limit(k)

  /** Batch retrieval: top-`k` corpus documents for EVERY query of a query
    * table at once — the decontamination shape (thousands of benchmark
    * questions against a 100 TB corpus in one job, instead of one job per
    * question). Query term frequency is binarized (distinct terms per
    * query — the standard short-query BM25 form). Output: (qidCol, idCol,
    * bm25), ranked per query on the ROUNDED (4 d.p.) score with ascending
    * id tie-break — ranking on the rounded value makes the boundary
    * deterministic when equal-score documents differ only in double
    * summation order.
    *
    * Scale posture: the whole query table rides as broadcasts (its
    * distinct-term set semi-joins the exploded corpus map-side, and the
    * (query, term) pairs expand matched tf rows only); the corpus
    * contributes one (doc, matching-term) reduction and one
    * (query, doc) aggregation — both restricted to matches. The per-query
    * top-k window partitions by query id, so no global sort. */
  def bm25TopKPerQuery(docs: DataFrame, idCol: String, textCol: String,
                       queries: DataFrame, qidCol: String, qtextCol: String,
                       k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qt = queries.select(col(qidCol),
      explode(array_distinct(TextFunctions.tokens(col(qtextCol)))).as("__term"))
    val qTerms = qt.select(col("__term")).distinct()
    val withDl = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("double"))
    val stats = withDl.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__dl")).as("__sumdl"))
    val tf = withDl
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("__term"))
      .join(broadcast(qTerms), Seq("__term"), "left_semi")
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"), first(col("__dl")).as("__dl"))
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).cast("double").as("__df"))
    val scoredTerms = tf
      .join(broadcast(dfreq), Seq("__term"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s",
        col("__idf") * col("__tf") * lit(k1 + 1.0) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / (col("__sumdl") / col("__n")))))
    val perQuery = scoredTerms.join(broadcast(qt), Seq("__term"))
      .groupBy(col(qidCol), col(idCol))
      .agg(round(sum(col("__s")), 4).as("bm25"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("bm25").desc, col(idCol).asc)
    perQuery.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }
}
