package graft.ops

import org.apache.spark.sql.DataFrame

/** Bounded FIFO of OPERATOR-SCOPED scratch caches.
  *
  * Several pair-emitting operators cache a small midpoint (content-keyed
  * reps, member-key maps) because the final plan consumes it through
  * differently-pruned subtrees, which defeats exchange reuse — measured on
  * the cross-table embedding join: no cache = 6.6x slower. But library code
  * returns LAZY frames and cannot know when the caller's last action ran,
  * so a bare `.cache()` leaks one CacheManager entry per call for the
  * session's lifetime; under a long query sequence (the 178-query bench)
  * the storage pool fills and LRU eviction thrashes — observed as 2-14 s
  * rep variance on a 3 s join (round-17 evidence).
  *
  * So: every scratch cache registers here, and beyond the newest [[MaxLive]]
  * entries the oldest is unpersisted. Unpersist is always SAFE — a consumer
  * still holding the frame recomputes instead of reading the cache — so the
  * bound trades at worst a recompute on a pathological evaluation order for
  * a hard cap on accumulated storage. One operator creates at most ~4
  * entries, so 32 keeps the most recent ~8 operators' scratch hot (a bench
  * rep-loop on one query stays fully cached) while a 100 TB pipeline
  * running hundreds of ops in one session stays flat.
  *
  * Intentional MEMOIZATION (ANN index builds keyed by build params) does
  * not go through here — those are keyed, deduped, and meant to live. */
private[graft] object ScratchCache {
  private val MaxLive = 32
  private val live = new java.util.ArrayDeque[DataFrame]()

  /** Cache `df` and register it in the bounded FIFO; returns `df`.
    *
    * A plan that is ALREADY cached (same canonicalized plan registered by an
    * earlier call — common now that UDF instances are memoized, so repeated
    * operator invocations build canonically-equal plans) is returned as-is:
    * re-caching it would only log CacheManager's "already cached" WARN and
    * burn a FIFO slot on a duplicate, whose eviction could unpersist a hot
    * entry out from under the original holder (r21 verdict #8). The check is
    * `df.storageLevel` (public API; resolves through CacheManager's
    * canonical-plan lookup), so it also stays correct when something OTHER
    * than the FIFO dropped the cache — e.g. the bench harness's
    * between-queries clearCache(): the entry re-registers instead of being
    * silently believed cached. */
  def apply(df: DataFrame): DataFrame = live.synchronized {
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
    else {
      df.cache()
      live.addLast(df)
      while (live.size() > MaxLive) {
        try live.removeFirst().unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () }
      }
      df
    }
  }

  private[graft] def liveCount: Int = live.synchronized(live.size())
}
