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

  /** Replay-idempotent accumulator for `foreachBatch` folds. Spark may
    * re-run a micro-batch with the SAME epoch id (failure between the
    * fold and the sink commit, or a sink-commit retry); a naive
    * `state = fold(state, batch)` would then fold the batch twice, and —
    * worse for the dedup probes here — the replayed batch would probe a
    * state that already contains ITSELF, emitting spurious self-hits
    * (every window/signature of the batch "already in the corpus").
    * This keeps the previous epoch's state alongside the current one:
    * a replayed epoch probes the PRE-fold state and the commit is a
    * no-op, so probe output is identical across replays and the fold
    * lands exactly once per epoch.
    *
    * Driver-memory state only: on query RESTART (new foreachBatch
    * closure) the accumulator starts empty — under-detecting, never
    * mis-detecting. Deployments needing restart-proof folds swap in the
    * persistent snapshot tables (write each batch's projection, probe
    * the table) — the probe calls are identical. */
  private[graft] final class EpochFold[S](empty: S) {
    private var cur: S = empty
    private var pre: S = empty
    private var last: Long = Long.MinValue
    def isReplay(epoch: Long): Boolean = epoch == last
    /** State the batch should probe: pre-fold state when `epoch` is a
      * replay of the last committed epoch, current state otherwise. */
    def probeState(epoch: Long): S = if (isReplay(epoch)) pre else cur
    /** Fold the epoch's contribution exactly once; no-op on replay. */
    def commit(epoch: Long)(next: => S): Unit =
      if (!isReplay(epoch)) { val n = next; pre = cur; cur = n; last = epoch }
  }

  /** `df.localCheckpoint()` on a FIRST run of the epoch; the df unchanged
    * on a replay. On replays the checkpoint would be built and then
    * orphaned — `EpochFold.commit` no-ops, so nothing retains it and its
    * blocks linger until RDD GC (round-16 advice), while the replayed
    * batch is small enough to recompute from lineage inside the probe. */
  private def ckptUnlessReplay(df: DataFrame, replay: Boolean): DataFrame =
    if (replay) df else df.localCheckpoint()

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
    * id ranges). Epoch replays are idempotent ([[EpochFold]]): a re-run
    * batch probes the pre-fold signature table (so it never pairs against
    * itself) and the fold lands once. Caller starts the returned writer. */
  def minhashIncremental(stream: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, numHashes: Int = 16, bands: Int = 4,
                         threshold: Double = 0.5)
                        (onPairs: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch(
      minhashBatchFn(idCol, textCol, k, numHashes, bands, threshold)(onPairs))

  /** The per-batch body of [[minhashIncremental]], exposed for replay
    * specs (a `foreachBatch` closure cannot be re-invoked from a test). */
  private[graft] def minhashBatchFn(idCol: String, textCol: String,
                                    k: Int, numHashes: Int, bands: Int,
                                    threshold: Double)
                                   (onPairs: (DataFrame, Long) => Unit)
      : (DataFrame, Long) => Unit = {
    val fold = new EpochFold[Option[DataFrame]](None)
    (batch: DataFrame, epoch: Long) => {
      val newSigs = ckptUnlessReplay(graft.ops.Dedup.minhashSignatureTable(
        batch, idCol, textCol, k, numHashes), fold.isReplay(epoch))
      val old = fold.probeState(epoch).getOrElse(newSigs.limit(0))
      val (pairs, banding) = graft.ops.Dedup.minhashPairsIncrementalTracked(
        newSigs, old, idCol, numHashes = numHashes, bands = bands, threshold = threshold)
      try onPairs(pairs, epoch)
      // the probe's cached banding is per-batch state: without this
      // unpersist, one CacheManager entry accumulates per micro-batch for
      // the stream's lifetime (round-12 advice)
      finally banding.unpersist(false)
      // previous checkpoint blocks are released by the ContextCleaner once
      // this union supersedes them (same posture as connectedComponents)
      fold.commit(epoch)(Some(old.unionByName(newSigs).localCheckpoint()))
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
    * `onPairs`, old-old pairs never re-emitted, epoch replays idempotent
    * ([[EpochFold]] — both folds advance together, so a replayed batch
    * probes the pre-fold signature AND band tables). */
  def minhashIncrementalBanded(stream: DataFrame, idCol: String, textCol: String,
                               k: Int = 3, numHashes: Int = 16, bands: Int = 4,
                               threshold: Double = 0.5)
                              (onPairs: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch(
      minhashBandedBatchFn(idCol, textCol, k, numHashes, bands, threshold)(onPairs))

  /** The per-batch body of [[minhashIncrementalBanded]], exposed for
    * replay specs. */
  private[graft] def minhashBandedBatchFn(idCol: String, textCol: String,
                                          k: Int, numHashes: Int, bands: Int,
                                          threshold: Double)
                                         (onPairs: (DataFrame, Long) => Unit)
      : (DataFrame, Long) => Unit = {
    val fold = new EpochFold[Option[(DataFrame, DataFrame)]](None)
    (batch: DataFrame, epoch: Long) => {
      val replay = fold.isReplay(epoch)
      val newSigs = ckptUnlessReplay(graft.ops.Dedup.minhashSignatureTable(
        batch, idCol, textCol, k, numHashes), replay)
      val newBanded = ckptUnlessReplay(graft.ops.Dedup.bandedSnapshotProjection(
        newSigs, idCol, numHashes = numHashes, bands = bands), replay)
      val (oldSigs, oldBanded) =
        fold.probeState(epoch).getOrElse((newSigs.limit(0), newBanded.limit(0)))
      val pairs = graft.ops.Dedup.minhashPairsIncrementalBanded(
        newSigs, oldSigs, oldBanded, idCol,
        numHashes = numHashes, bands = bands, threshold = threshold)
      onPairs(pairs, epoch)
      fold.commit(epoch)(Some((
        oldSigs.unionByName(newSigs).localCheckpoint(),
        oldBanded.unionByName(newBanded).localCheckpoint())))
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
    * ([[graft.ops.Dedup.writeWindowSnapshot]], then
    * [[graft.ops.Dedup.appendWindowSnapshot]] per batch and
    * [[graft.ops.Dedup.compactWindowSnapshot]] offline) — the probe call
    * is identical. Ids must be unique
    * across the stream. Epoch replays are idempotent ([[EpochFold]]): a
    * re-run batch probes the pre-fold profile — without the guard every
    * window of the replayed batch would hit its own already-folded
    * profile, emitting spurious whole-doc spans. Caller starts the
    * returned writer. */
  def repeatedSpansIncremental(stream: DataFrame, idCol: String, textCol: String,
                               minTokens: Int = 5)
                              (onSpans: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch(
      repeatedSpansBatchFn(idCol, textCol, minTokens)(onSpans))

  /** The per-batch body of [[repeatedSpansIncremental]], exposed for
    * replay specs. */
  private[graft] def repeatedSpansBatchFn(idCol: String, textCol: String,
                                          minTokens: Int)
                                         (onSpans: (DataFrame, Long) => Unit)
      : (DataFrame, Long) => Unit = {
    val fold = new EpochFold[Option[DataFrame]](None)
    (batch: DataFrame, epoch: Long) => {
      val newProf = ckptUnlessReplay(graft.ops.Dedup.windowSnapshotProjection(
        batch, idCol, textCol, minTokens), fold.isReplay(epoch))
      val old = fold.probeState(epoch).getOrElse(newProf.limit(0))
      val spans = graft.ops.Dedup.repeatedSpansIncrementalStored(
        batch, old, idCol, textCol, minTokens)
      onSpans(spans, epoch)
      // append-only fold: duplicate (__wh, __wh2) rows across batches are
      // fine (probe hits are position-distinct before the span merge) —
      // exactly the parquet-append posture of the stored deployment
      fold.commit(epoch)(Some(old.unionByName(newProf).localCheckpoint()))
      ()
    }
  }

  /** Streaming rolling cluster labels — the streaming face of
    * [[graft.ops.Dedup.connectedComponentsIncremental]]: a stream of
    * near-dup PAIRS (e.g. each micro-batch's [[minhashIncrementalBanded]]
    * output) folds into one persistent (id, component) labeling. Per
    * batch, the accumulated labeling (already height-1 stars) plus the
    * batch's edges relabel in a round or two — the historical pair list is
    * never kept, only the one-row-per-doc label table, checkpointed across
    * batches. `onLabels` receives the UPDATED full labeling and the epoch;
    * epoch replays are idempotent ([[EpochFold]] — a re-run batch relabels
    * from the pre-fold labeling, so the emitted labels are identical).
    * A 100 TB deployment swaps the in-memory fold for a bucketed label
    * table rewritten per batch. Caller starts the returned writer. */
  def ccIncremental(pairStream: DataFrame, aCol: String = "id_a", bCol: String = "id_b")
                   (onLabels: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    pairStream.writeStream.foreachBatch(ccBatchFn(aCol, bCol)(onLabels))

  /** The per-batch body of [[ccIncremental]], exposed for replay specs. */
  private[graft] def ccBatchFn(aCol: String, bCol: String)
                              (onLabels: (DataFrame, Long) => Unit)
      : (DataFrame, Long) => Unit = {
    val fold = new EpochFold[Option[DataFrame]](None)
    (batch: DataFrame, epoch: Long) => {
      val labels = fold.probeState(epoch) match {
        case None => graft.ops.Dedup.connectedComponents(batch, aCol, bCol)
        case Some(old) =>
          graft.ops.Dedup.connectedComponentsIncremental(old, batch, aCol, bCol)
      }
      val snap = ckptUnlessReplay(labels, fold.isReplay(epoch))
      onLabels(snap, epoch)
      fold.commit(epoch)(Some(snap))
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
