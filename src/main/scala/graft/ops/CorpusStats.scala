package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-(lang, source) corpus report with ROLLUP margins: every row
    * carries doc count, token count, character sum and the number of
    * DISTINCT texts (md5 content key — `n_docs - n_distinct` is the exact
    * duplicate overhang). Grouped-out rollup levels surface as
    * '(all)' so the margins are self-describing.
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
        count(lit(1)).cast("long").as("n_docs"),
        sum(TextFunctions.tokenCount(col("__text"))).cast("long").as("n_tokens"),
        sum(length(col("__text"))).cast("long").as("n_chars"),
        countDistinct(md5(col("__text"))).cast("long").as("n_distinct"))
      .select(
        coalesce(col("__lang"), lit("(all)")).as("lang"),
        coalesce(col("__source"), lit("(all)")).as("source"),
        col("n_docs"), col("n_tokens"), col("n_chars"), col("n_distinct"))

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
}
