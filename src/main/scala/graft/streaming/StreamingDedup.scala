package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deduplication for unbounded document feeds — the streaming
  * face of [[graft.ops.Dedup]] (beyond-reference, SURVEY §2.12):
  *
  *  - exact: content digest + `dropDuplicatesWithinWatermark` — Spark
  *    keeps digest state only within the watermark horizon, so state is
  *    bounded on an infinite stream.
  *  - near-dup: SimHash band keys → `flatMapGroupsWithState` keyed by band
  *    bucket; each bucket remembers recent (id, signature) pairs and emits
  *    (id_a, id_b, hamming) when a new document lands within `maxHamming`
  *    of a remembered one. Same pigeonhole guarantee as the batch
  *    [[graft.ops.Dedup.simhashPairs]]; a pair can surface from more than
  *    one band, so sinks should de-duplicate (id_a, id_b).
  */
object StreamingDedup {

  /** Exact streaming dedup on content digest, state bounded by watermark. */
  def exactDedup(stream: DataFrame, textCol: String, tsCol: String,
                 watermark: String = "10 minutes"): DataFrame =
    stream.withColumn("__graft_digest", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__graft_digest")
      .drop("__graft_digest")

  /** Cross-batch incremental MinHash near-dup — the streaming face of the
    * stored-signature snapshot shape ([[graft.ops.Dedup.minhashSignatureTable]]
    * / [[graft.ops.Dedup.minhashPairsIncremental]], and the same foreachBatch
    * fold as the streaming Bloom sketch): each micro-batch's signatures probe
    * the signature table accumulated from all PRIOR batches (plus the batch
    * itself, for new-new pairs). Old-old pairs never re-emit, and old TEXT is
    * never re-read — only the ≤0.5 KB/doc signatures persist across batches,
    * `localCheckpoint`-truncated so batch k's plan does not replay batches
    * 1..k-1. A 100 TB deployment would swap the in-memory fold for a parquet
    * signature table (write each batch's newSigs, read it back next batch) —
    * the probe call is identical.
    *
    * `onPairs` receives each batch's (id_a, id_b, est_jaccard) frame and the
    * epoch id; ids must be unique across the whole stream (the
    * minhashPairsIncremental caller contract — crawl snapshots use disjoint
    * id ranges). Caller starts the returned writer. */
  def minhashIncremental(stream: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, numHashes: Int = 16, bands: Int = 4,
                         threshold: Double = 0.5)
                        (onPairs: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var sigs: Option[DataFrame] = None
    stream.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val newSigs = graft.ops.Dedup.minhashSignatureTable(
        batch, idCol, textCol, k, numHashes).localCheckpoint()
      val old = sigs.getOrElse(newSigs.limit(0))
      val (pairs, banding) = graft.ops.Dedup.minhashPairsIncrementalTracked(
        newSigs, old, idCol, numHashes = numHashes, bands = bands, threshold = threshold)
      try onPairs(pairs, epoch)
      // the probe's cached banding is per-batch state: without this
      // unpersist, one CacheManager entry accumulates per micro-batch for
      // the stream's lifetime (round-12 advice)
      finally banding.unpersist(false)
      // previous checkpoint blocks are released by the ContextCleaner once
      // this union supersedes them (same posture as connectedComponents)
      sigs = Some(old.unionByName(newSigs).localCheckpoint())
      ()
    }
  }

  /** [[minhashIncremental]] down the PRE-BANDED path — the streaming face
    * of [[graft.ops.Dedup.minhashPairsIncrementalBanded]] (q140): alongside
    * the signature fold, the band-key projection of every prior batch is
    * accumulated too, so each micro-batch probes STORED band keys — the
    * corpus accumulated so far is never re-exploded or re-hashed per batch
    * (with the plain incremental probe, batch k re-bands all k-1 prior
    * batches' signatures; here banding cost is once per row, at arrival).
    * No cache handle to release either: the banded probe checkpoints only
    * the small new batch internally. A 100 TB deployment swaps the two
    * in-memory folds for the bucketed snapshot tables
    * ([[graft.ops.Dedup.writeSignatureSnapshot]] /
    * [[graft.ops.Dedup.writeBandedSnapshot]]) — the probe call is
    * identical. Same contract: stream-unique ids, pairs per batch via
    * `onPairs`, old-old pairs never re-emitted. */
  def minhashIncrementalBanded(stream: DataFrame, idCol: String, textCol: String,
                               k: Int = 3, numHashes: Int = 16, bands: Int = 4,
                               threshold: Double = 0.5)
                              (onPairs: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var sigs: Option[DataFrame] = None
    var bandedAcc: Option[DataFrame] = None
    stream.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val newSigs = graft.ops.Dedup.minhashSignatureTable(
        batch, idCol, textCol, k, numHashes).localCheckpoint()
      val newBanded = graft.ops.Dedup.bandedSnapshotProjection(
        newSigs, idCol, numHashes = numHashes, bands = bands).localCheckpoint()
      val oldSigs = sigs.getOrElse(newSigs.limit(0))
      val oldBanded = bandedAcc.getOrElse(newBanded.limit(0))
      val pairs = graft.ops.Dedup.minhashPairsIncrementalBanded(
        newSigs, oldSigs, oldBanded, idCol,
        numHashes = numHashes, bands = bands, threshold = threshold)
      onPairs(pairs, epoch)
      sigs = Some(oldSigs.unionByName(newSigs).localCheckpoint())
      bandedAcc = Some(oldBanded.unionByName(newBanded).localCheckpoint())
      ()
    }
  }

  /** Streaming exact-substring (repeated-span) dedup — the streaming face
    * of [[graft.ops.Dedup.repeatedSpansIncrementalStored]] (q147): the
    * window-hash profile of every PRIOR batch is accumulated (an
    * append-only fold of [[graft.ops.Dedup.windowSnapshotProjection]] —
    * ~24-byte rows, window strings never kept), and each micro-batch
    * probes it for spans duplicated against the corpus so far OR within
    * the batch itself. Old documents are never re-tokenized or
    * re-windowed per batch — windowing cost is once per document, at
    * arrival. `onSpans` receives each batch's (idCol, span_start,
    * span_tokens) frame and the epoch id. A 100 TB deployment swaps the
    * in-memory fold for the bucketed snapshot table
    * ([[graft.ops.Dedup.writeWindowSnapshot]], appended per batch and
    * compacted offline) — the probe call is identical. Ids must be unique
    * across the stream. Caller starts the returned writer. */
  def repeatedSpansIncremental(stream: DataFrame, idCol: String, textCol: String,
                               minTokens: Int = 5)
                              (onSpans: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var profile: Option[DataFrame] = None
    stream.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val newProf = graft.ops.Dedup.windowSnapshotProjection(
        batch, idCol, textCol, minTokens).localCheckpoint()
      val old = profile.getOrElse(newProf.limit(0))
      val spans = graft.ops.Dedup.repeatedSpansIncrementalStored(
        batch, old, idCol, textCol, minTokens)
      onSpans(spans, epoch)
      // append-only fold: duplicate (__wh, __wh2) rows across batches are
      // fine (probe hits are position-distinct before the span merge) —
      // exactly the parquet-append posture of the stored deployment
      profile = Some(old.unionByName(newProf).localCheckpoint())
      ()
    }
  }

  case class BandDoc(bkey: String, id: Long, sig: String)
  case class BucketState(docs: List[(Long, String)])
  case class DupPair(id_a: Long, id_b: Long, hamming: Int)

  /** Streaming SimHash near-dup pairs. `maxStatePerBucket` caps memory per
    * band bucket (oldest evicted — a sliding near-dup horizon). */
  def simhashPairs(stream: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxStatePerBucket: Int = 1024): Dataset[DupPair] = {
    require(maxHamming >= 0 && maxHamming <= 15, "maxHamming in [0, 15]")
    val spark = stream.sparkSession
    import spark.implicits._
    val bands = maxHamming + 1
    val bound = (0 to bands).map(i => 16 * i / bands)
    val banded = stream
      .select(col(idCol).cast("long").as("id"), TextFunctions.simhash64(col(textCol)).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"), col("sig"),
        posexplode(array((0 until bands).map(i =>
          substring(col("sig"), bound(i) + 1, bound(i + 1) - bound(i))): _*))
          .as(Seq("band", "key")))
      .select(concat_ws(":", col("band"), col("key")).as("bkey"), col("id"), col("sig"))
      .as[BandDoc]

    val maxH = maxHamming
    val cap = maxStatePerBucket
    banded.groupByKey(_.bkey).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout())(
      (_: String, docs: Iterator[BandDoc], state: GroupState[BucketState]) => {
        var seen = state.getOption.map(_.docs).getOrElse(Nil)
        val out = scala.collection.mutable.ArrayBuffer[DupPair]()
        docs.foreach { d =>
          seen.foreach { case (oid, osig) =>
            if (oid != d.id) {
              var h = 0
              var i = 0
              while (i < math.min(osig.length, d.sig.length)) {
                h += Integer.bitCount(Character.digit(osig.charAt(i), 16) ^ Character.digit(d.sig.charAt(i), 16))
                i += 1
              }
              if (h <= maxH) out += DupPair(math.min(oid, d.id), math.max(oid, d.id), h)
            }
          }
          seen = ((d.id, d.sig) :: seen).take(cap)
        }
        state.update(BucketState(seen))
        out.iterator
      })
  }
}
