package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl curation — PageRank (Brin & Page 1998)
  * as the quality-propagation / crawl-prioritization signal public web
  * pipelines (Common Crawl ranking, OpenWebText-style filtering) attach to
  * documents before sampling.
  *
  * Scale posture: each iteration is ONE shuffle — contributions
  * (`rank/outdeg` per edge) hash-aggregate on the destination id with
  * map-side partial sums, so a hub page's in-links reach the reducer
  * pre-combined; the dangling-mass total and the node count are scalar
  * driver values per iteration (the ≤k-driver-rows-per-epoch posture of
  * the k-means/logreg ops); ranks `localCheckpoint` per round so round k's
  * plan does not replay rounds 1..k-1. Edges never materialize more than
  * once per iteration and node payloads never shuffle.
  *
  * Oracle-replayability: ranks round to 1e-9 after every iteration (the
  * q126/q129 posture), so double summation ORDER — the only
  * engine-dependent freedom — cannot drift the final hash: per-iteration
  * drift is ~1e-18 absolute against a 1e-9 grid.
  */
object LinkGraph {

  /** PageRank over a directed edge list (`srcCol`, `dstCol`). Nodes = the
    * distinct endpoints of the edge list. Parallel edges count once
    * (deduplicated — the convention that makes rank independent of edge
    * duplication upstream). Dangling nodes (no out-edges) spread their
    * mass uniformly. Output: (id, rank) for every node, ranks rounded to
    * 1e-9, summing to ~1. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1; got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1); got $damping")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .dropDuplicates("src", "dst")
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank", lit(0.0))
    val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    // (id, outdeg) with 0 for dangling — joined once, reused every round
    val withDeg = nodes.join(outdeg, Seq("id"), "left")
      .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .localCheckpoint()
    val base = (1.0 - damping) / n
    // superseded rank checkpoints are unpersisted once the next round is
    // materialized (the connectedComponents tracked-checkpoint posture):
    // executor storage stays O(one rank table), not O(iterations)
    val sc = edges.sparkSession.sparkContext
    def checkpointTracked(df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint()
      (out, sc.getPersistentRDDs.collect { case (k, r) if !before(k) => r }.toSeq)
    }
    var (ranks, rankRdds) = checkpointTracked(withDeg.select(col("id"), col("outdeg"),
      round(lit(1.0 / n), 9).as("rank")))
    for (_ <- 1 to iterations) {
      val dangling = ranks.filter(col("outdeg") === 0)
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contrib = e.join(ranks.select(col("id").as("src"),
            (col("rank") / col("outdeg")).as("__c")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("__c")).as("__in"))
      val (next, nextRdds) = checkpointTracked(withDeg.join(contrib, Seq("id"), "left")
        .select(col("id"), col("outdeg"),
          round(lit(base) + lit(damping) *
            (coalesce(col("__in"), lit(0.0)) + lit(dangling / n)), 9).as("rank")))
      rankRdds.foreach(_.unpersist(false))
      ranks = next; rankRdds = nextRdds
    }
    ranks.select(col("id"), col("rank"))
  }

  /** Pointwise-mutual-information collocations (phrase mining): the top-k
    * adjacent token pairs by PMI = ln(p(ab) / (p(a)·p(b))) with
    * p(ab) = c_ab / total_bigrams and p(x) = c_x / total_unigrams, over
    * pairs occurring at least `minCount` times. PMI rounds to 1e-6 BEFORE
    * ranking (oracle-replayable order; ties break on the bigram text).
    * Two bounded hash-agg shuffles (unigram + bigram counts) and two
    * 1-row total aggregates; document text never shuffles; top-k is a
    * TakeOrderedAndProject. Output: (bigram, cnt, pmi). */
  def pmiCollocations(docs: DataFrame, textCol: String,
                      minCount: Int = 5, topK: Int = 50): DataFrame = {
    require(minCount >= 1 && topK >= 1)
    import graft.functions.TextFunctions
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("__t"))
    val uni = toks.select(explode(col("__t")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__cw")).localCheckpoint()
    val bi = toks.filter(size(col("__t")) >= 2)
      .select(explode(TextFunctions.shinglesOfTokens(col("__t"), 2)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__cb"))
      .filter(col("__cb") >= minCount)
    val totalUni = uni.agg(sum(col("__cw"))).head().getLong(0).toDouble
    val totalBi = toks.filter(size(col("__t")) >= 2)
      .select((size(col("__t")) - 1).cast("long").as("__nb"))
      .agg(coalesce(sum(col("__nb")), lit(0L))).head().getLong(0).toDouble
    bi.withColumn("__wa", substring_index(col("__b"), " ", 1))
      .withColumn("__wb", substring_index(col("__b"), " ", -1))
      .join(uni.select(col("__w").as("__wa"), col("__cw").as("__ca")), Seq("__wa"))
      .join(uni.select(col("__w").as("__wb"), col("__cw").as("__cb2")), Seq("__wb"))
      .select(col("__b").as("bigram"), col("__cb").as("cnt"),
        round(log((col("__cb") / lit(totalBi)) /
          ((col("__ca") / lit(totalUni)) * (col("__cb2") / lit(totalUni)))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(topK)
  }
}
