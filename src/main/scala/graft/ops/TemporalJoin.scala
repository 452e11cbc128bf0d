package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}

/** Temporal joins for event streams: as-of join (point-in-time lookup) and
  * range/interval joins, Spark-first.
  *
  * The naive spelling of every one of these — `l JOIN r ON l.ts >= r.ts`,
  * `pt BETWEEN start AND end` — plans as a BroadcastNestedLoopJoin
  * (quadratic work, broadcast of a whole side at worst). These operators
  * re-express them as EQUI-joins or single window passes Catalyst can
  * hash/sort-merge and AQE can skew-split, which is what survives a 100 TB
  * event table:
  *
  *  - KEYED as-of: one shuffle on the `by` keys — union both sides tagged,
  *    a single window pass carries the latest right payload forward onto
  *    each left row. No join node at all, no candidate duplication. The
  *    classic backfill formulation of `merge_asof` semantics.
  *  - KEYLESS as-of: reduced onto the keyed core by range-bucketing time:
  *    every bucket gets a "carry-in" row (the latest right row from all
  *    earlier buckets) computed from one tiny per-bucket aggregate
  *    (≤ numBuckets rows), so buckets become independent keys.
  *    Parallelism = numBuckets even with zero key columns.
  *  - RANGE join: intervals explode onto fixed-width bins (`sequence` —
  *    native, no UDF; expected duplication ≈ 2 rows per interval at the
  *    default width), points map to exactly one bin, and the match is a
  *    hash equi-join on the bin + an exact refine. Each qualifying pair is
  *    produced exactly once (a point's bin is unique) — no dedup shuffle.
  *    The PBSM spatial grid join in 1-D.
  *  - INTERVAL OVERLAP join: both sides explode to bins; a pair is claimed
  *    only in the FIRST bin both intervals share
  *    (`greatest(bin(aStart), bin(bStart))`), so no post-join dedup.
  *
  * Timestamps: ts columns may be numeric (e.g. the long nanos that
  * TIMESTAMP(NANOS) parquet reads as under `nanosAsLong`) or TimestampType
  * (normalized to epoch micros). All ordering/bucketing happens in exact
  * integer arithmetic (`div`, not double division) — a double-rounded
  * bucket id at nano scale (ts ~ 1.7e18 > 2^53) would silently misplace
  * boundary rows.
  */
object TemporalJoin {

  private def checkReserved(df: DataFrame, who: String): Unit = {
    // the join cores strip EVERY "__"-prefixed column from the output (the
    // internal scratch columns all use that prefix), so a user column like
    // "__score" would silently vanish — refuse the whole namespace loudly
    // instead of just the 8 internal names (round-17 advice)
    val bad = df.columns.filter(_.startsWith("__"))
    require(bad.isEmpty,
      s"$who input must not carry '__'-prefixed columns (reserved for join " +
        s"internals and stripped from the output): ${bad.mkString(",")}")
  }

  /** Normalize a ts column to an exactly-comparable integral numeric:
    * TimestampType → epoch micros; numeric types pass through. */
  private def tsNorm(df: DataFrame, c: String): Column =
    normCol(df.schema(c).dataType, col(c))

  /** TIMESTAMP → epoch micros; TIMESTAMP_NTZ → epoch micros via a session-
    * timezone cast (the engine mains pin UTC); numerics pass through. */
  private def normCol(dt: org.apache.spark.sql.types.DataType, c: Column): Column =
    dt match {
      case TimestampType    => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case _                => c
    }

  /** Normalize a timestamp-ish column to EXACT long nanoseconds in a new
    * column: long inputs pass through (already nanos under `nanosAsLong`),
    * TIMESTAMP/TIMESTAMP_NTZ upscale from micros. The shared time-domain
    * contract of the engine's event gates/benches — one definition, so
    * SparkEntry/Plans/Scale cannot drift apart (round-17 review). */
  def withNanos(df: DataFrame, tsCol: String, outCol: String): DataFrame = {
    val c = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => col(tsCol)
      case TimestampType                       => unix_micros(col(tsCol)) * 1000L
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType)) * 1000L
      case dt => throw new IllegalArgumentException(
        s"withNanos: $tsCol must be long nanos or a timestamp; got $dt")
    }
    df.withColumn(outCol, c)
  }

  /** Exact integral division (SQL `div`): long-domain bucketing with no
    * double rounding. Truncates toward zero — monotone over the integers,
    * which is all the bin logic needs (callers with non-negative numerators
    * get true floor division). */
  private def idiv(x: Column, w: Long): Column =
    call_function("div", x, lit(w))

  /** AS-OF JOIN: for each left row, the single right row with the largest
    * `rightTs <= leftTs` (`direction = "backward"`; `"forward"` matches the
    * smallest `rightTs >= leftTs`), sharing the `by` keys, and — when
    * `tolerance` is set — with the ts gap `<= tolerance` (same units as the
    * ts columns; the LATEST match is tested against the tolerance, not the
    * nearest-within-tolerance). Equal ts match. `how = "left"` null-extends
    * unmatched left rows; `"inner"` drops them.
    *
    * Output: every left column, then every right column except the `by`
    * keys, prefixed with `rightPrefix`. Right rows with a null ts never
    * match; left rows with a null ts match nothing.
    *
    * With `by` keys this is ONE shuffle (the window partition) and no join
    * node; without keys it dispatches to [[asofJoinKeyless]].
    *
    * Rows with duplicate (`by`, `rightTs`) on the right have no defined
    * winner — pre-aggregate the right side if that matters.
    *
    * NULL `by` keys group together (window-partition semantics): a null-key
    * left row matches null-key right rows. SQL's `ON l.k = r.k` would drop
    * them — filter nulls first for strict equi-join parity (spec-pinned). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftTs: String, rightTs: String,
               by: Seq[String] = Nil,
               direction: String = "backward",
               tolerance: Option[Long] = None,
               how: String = "left",
               rightPrefix: String = "r_"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest; got $direction")
    require(how == "left" || how == "inner", s"how must be left|inner; got $how")
    require(tolerance.forall(_ >= 0), "tolerance must be >= 0")
    checkReserved(left, "asofJoin left"); checkReserved(right, "asofJoin right")
    if (by.isEmpty)
      return asofJoinKeyless(left, right, leftTs, rightTs, direction, tolerance, how, rightPrefix)
    require(!by.contains(rightTs), s"right ts column $rightTs must not be a by key")
    val sign = if (direction == "forward") -1L else 1L
    core(left, right, leftTs, rightTs, by, sign, tolerance, how, rightPrefix,
      nearest = direction == "nearest")
  }

  /** The keyless as-of: bucket time into `numBuckets` fixed-width ranges
    * (domain bounds from one 2-row aggregate over the union of both ts
    * columns — the same eager-stats posture as the spatial grid build),
    * seed EVERY bucket with its carry-in row (latest right row from all
    * earlier buckets; ≤ numBuckets + 2 rows total), then run the keyed
    * core with the bucket as the key. */
  def asofJoinKeyless(left: DataFrame, right: DataFrame,
                      leftTs: String, rightTs: String,
                      direction: String = "backward",
                      tolerance: Option[Long] = None,
                      how: String = "left",
                      rightPrefix: String = "r_",
                      numBuckets: Int = 256): DataFrame = {
    require(numBuckets > 0)
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest; got $direction")
    checkReserved(left, "asofJoin left"); checkReserved(right, "asofJoin right")
    val spark = right.sparkSession
    val nearest = direction == "nearest"
    val sign = if (direction == "forward") -1L else 1L
    val lt = left.select((tsNorm(left, leftTs) * sign).as("__t"))
    val rt = right.select((tsNorm(right, rightTs) * sign).as("__t"))
    val Array(bounds) = lt.unionByName(rt)
      .agg(min(col("__t")).as("lo"), max(col("__t")).as("hi")).collect()
    if (bounds.isNullAt(0)) // no non-null ts anywhere: nothing matches
      return core(left.withColumn("__bkt", lit(0L)),
        right.withColumn("__bkt", lit(0L)),
        leftTs, rightTs, Seq("__bkt"), sign, tolerance, how, rightPrefix,
        nearest = nearest)
        .drop("__bkt")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / numBuckets + 1)
    // numerator >= 0 by construction, so trunc-div == floor-div (exact)
    def bkt(tSigned: Column): Column = idiv(tSigned - lit(lo), width)
    val rn = tsNorm(right, rightTs)
    // Latest right row per bucket on the signed axis, then the running
    // carry over ALL bucket ids (buckets holding only left rows still need
    // their carry-in): ≤ numBuckets + 2 rows end to end.
    val perBucket = right.filter(rn.isNotNull)
      .groupBy(bkt(rn * sign).as("__bkt"))
      .agg(max_by(struct(right.columns.map(col).toIndexedSeq: _*), rn * sign).as("__row"))
    val allB = spark.range(0, numBuckets.toLong + 2).select(col("id").as("__bkt"))
    val cumW = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allB.join(perBucket, Seq("__bkt"), "left")
      .withColumn("__carry", last(col("__row"), ignoreNulls = true).over(cumW))
      .filter(col("__carry").isNotNull)
      .select(col("__bkt"), col("__carry.*"))
    // nearest also needs the SYMMETRIC carry: for bucket b, the earliest
    // right row in any bucket > b (the forward candidate may live past the
    // bucket boundary). Same <= numBuckets+2 rows.
    val carryF = if (!nearest) carry.limit(0) else {
      val perBucketF = right.filter(rn.isNotNull)
        .groupBy(bkt(rn * sign).as("__bkt"))
        .agg(min_by(struct(right.columns.map(col).toIndexedSeq: _*), rn * sign).as("__row"))
      val fwdW = Window.orderBy(col("__bkt"))
        .rowsBetween(1, Window.unboundedFollowing)
      allB.join(perBucketF, Seq("__bkt"), "left")
        .withColumn("__carry", first(col("__row"), ignoreNulls = true).over(fwdW))
        .filter(col("__carry").isNotNull)
        .select(col("__bkt"), col("__carry.*"))
    }
    // A carry row duplicates a real right row into another bucket; its real
    // ts sorts it before (backward) / after (forward) every left row of
    // that bucket, so the window core sees it as the seed candidate. (For
    // buckets that also hold the original row the duplicate is harmless:
    // identical payload, same carry result.)
    val rightSeeded = right.withColumn("__bkt",
        when(rn.isNotNull, bkt(rn * sign)))
      .unionByName(carry).unionByName(carryF)
    val leftB = left.withColumn("__bkt",
      when(tsNorm(left, leftTs).isNotNull, bkt(tsNorm(left, leftTs) * sign)))
    core(leftB, rightSeeded, leftTs, rightTs, Seq("__bkt"), sign, tolerance,
      how, rightPrefix, nearest = nearest).drop("__bkt")
  }

  /** HOT-KEY-SAFE keyed as-of: [[asofJoin]]'s window pins every row of a
    * key into ONE task (windows cannot skew-split — a user with 10⁸ events
    * is a straggler at 100 TB). This variant adds the keyless path's time
    * bucketing WITHIN each key, so parallelism = (key, bucket) pairs:
    *
    *  - global time bounds from one 2-row aggregate (shared bucket grid
    *    across keys — per-key bounds would cost a per-key agg for no
    *    correctness gain);
    *  - per-(key, bucket) latest/earliest right rows from one aggregate;
    *  - carry-in rows for exactly the (key, bucket) pairs the LEFT
    *    occupies, computed by running the SAME union+running-last trick at
    *    bucket granularity (so the carry table is bounded by the DATA —
    *    distinct (key, bucket) occupancy — never keys × buckets);
    *  - the standard core then runs with (by :+ bucket) as the partition
    *    key.
    *
    * Results are identical to [[asofJoin]] (spec-pinned, incl. nearest).
    *
    * TRADEOFF, measured honestly: this costs ~3 extra aggregates/scans of
    * the inputs, so wherever the hot key's rows still FIT one task's sort
    * (local[32] handled a fully-collapsed 1.3M-row key in ~8 s; the plain
    * window was 2-3x FASTER than this spelling there), prefer [[asofJoin]].
    * Reach for the skewed spelling when a single key's row count exceeds
    * what one task can sort within its memory budget (the 10⁸-rows-per-user
    * shape at 100 TB, where the plain window's one-task-per-key is a
    * spill-or-OOM straggler, not just a slow task). */
  def asofJoinSkewed(left: DataFrame, right: DataFrame,
                     leftTs: String, rightTs: String,
                     by: Seq[String],
                     direction: String = "backward",
                     tolerance: Option[Long] = None,
                     how: String = "left",
                     rightPrefix: String = "r_",
                     numBuckets: Int = 64): DataFrame = {
    require(by.nonEmpty, "asofJoinSkewed needs by keys; use asofJoinKeyless otherwise")
    require(numBuckets > 0)
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest; got $direction")
    checkReserved(left, "asofJoin left"); checkReserved(right, "asofJoin right")
    require(!by.contains(rightTs), s"right ts column $rightTs must not be a by key")
    val nearest = direction == "nearest"
    val sign = if (direction == "forward") -1L else 1L
    val lt = left.select((tsNorm(left, leftTs) * sign).as("__t"))
    val rt = right.select((tsNorm(right, rightTs) * sign).as("__t"))
    val Array(bounds) = lt.unionByName(rt)
      .agg(min(col("__t")).as("lo"), max(col("__t")).as("hi")).collect()
    if (bounds.isNullAt(0))
      return core(left.withColumn("__bkt", lit(0L)),
        right.withColumn("__bkt", lit(0L)),
        leftTs, rightTs, by :+ "__bkt", sign, tolerance, how, rightPrefix,
        nearest = nearest).drop("__bkt")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / numBuckets + 1)
    def bkt(tSigned: Column): Column = idiv(tSigned - lit(lo), width)
    val rn = tsNorm(right, rightTs)
    val rowT = struct(right.columns.map(col).toIndexedSeq: _*)
    // bucket-granularity carry: union the per-(key,bucket) right extremes
    // (tag 0) with the left-occupied (key,bucket) targets (tag 1), run the
    // running-last window per key ordered by bucket — the core's own trick
    // one level up. Emitted carry rows: <= left-occupied (key,bucket) pairs.
    def carryFor(extreme: DataFrame, forward: Boolean): DataFrame = {
      val targets = left
        .select(by.map(col) :+
          bkt(tsNorm(left, leftTs) * sign).as("__bkt"): _*)
        .filter(col("__bkt").isNotNull).distinct()
        .withColumn("__ctag", lit(1))
        .withColumn("__row", lit(null).cast(extreme.schema("__row").dataType))
      val uni = extreme.withColumn("__ctag", lit(0)).unionByName(targets)
      val w =
        if (!forward)
          Window.partitionBy(by.map(col): _*)
            .orderBy(col("__bkt").asc, col("__ctag").desc) // right extremes
            .rowsBetween(Window.unboundedPreceding, -1)    // strictly earlier rows
        else
          Window.partitionBy(by.map(col): _*)
            .orderBy(col("__bkt").asc, col("__ctag").asc)
            .rowsBetween(1, Window.unboundedFollowing)     // strictly later rows
      val carried =
        if (!forward) uni.withColumn("__c", last(col("__row"), ignoreNulls = true).over(w))
        else uni.withColumn("__c", first(col("__row"), ignoreNulls = true).over(w))
      // the struct's key fields equal the partition key (the window never
      // crosses keys), so the carry row is rebuilt wholly from the struct
      carried.filter(col("__ctag") === 1 && col("__c").isNotNull)
        .select(col("__bkt") +: right.columns.toIndexedSeq.map(c => col(s"__c.$c").as(c)): _*)
    }
    // tag ordering makes the carries STRICTLY earlier/later buckets only:
    // backward sorts targets before same-bucket extremes (ctag desc), so
    // the (-inf,-1) frame sees smaller buckets only; forward sorts extremes
    // first (ctag asc), so the (1,+inf) frame sees larger buckets only.
    // Same-bucket right rows are the in-bucket window's job.
    val perB = right.filter(rn.isNotNull)
      .groupBy((by.map(col) :+ bkt(rn * sign).as("__bkt")): _*)
      .agg(max_by(rowT, rn * sign).as("__row"))
    val carryB = carryFor(perB, forward = false)
    val carryF = if (!nearest) carryB.limit(0) else {
      val perF = right.filter(rn.isNotNull)
        .groupBy((by.map(col) :+ bkt(rn * sign).as("__bkt")): _*)
        .agg(min_by(rowT, rn * sign).as("__row"))
      carryFor(perF, forward = true)
    }
    val rightSeeded = right.withColumn("__bkt",
        when(rn.isNotNull, bkt(rn * sign)))
      .unionByName(carryB).unionByName(carryF)
    val leftB = left.withColumn("__bkt",
      when(tsNorm(left, leftTs).isNotNull, bkt(tsNorm(left, leftTs) * sign)))
    core(leftB, rightSeeded, leftTs, rightTs, by :+ "__bkt", sign, tolerance,
      how, rightPrefix, nearest = nearest).drop("__bkt")
  }

  /** Union-and-carry core: both sides tagged into one frame, a single
    * running-`last` window per `by` partition. Right rows sort before left
    * rows at equal ts (ties match). `by` may include an internal `__bkt`. */
  private def core(left: DataFrame, right: DataFrame,
                   leftTs: String, rightTs: String,
                   by: Seq[String], sign: Long,
                   tolerance: Option[Long], how: String,
                   rightPrefix: String, nearest: Boolean = false): DataFrame = {
    val rPayloadCols = right.columns.filterNot(by.contains).toIndexedSeq
    val leftCols = left.columns.toIndexedSeq
    rPayloadCols.filterNot(_.startsWith("__")).foreach { c =>
      require(!leftCols.contains(s"$rightPrefix$c"),
        s"output column collision: left already has $rightPrefix$c")
    }
    val lStructT = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val rKeyed = right.select(
      by.map(col) ++ Seq(
        (tsNorm(right, rightTs) * sign).as("__ord"),
        lit(0).as("__tag"),
        struct(rPayloadCols.map(col): _*).as("__r"),
        lit(null).cast(lStructT).as("__l")): _*)
      .filter(col("__ord").isNotNull)
    val lKeyed = left.select(
      by.map(col) ++ Seq(
        (tsNorm(left, leftTs) * sign).as("__ord"),
        lit(1).as("__tag"),
        lit(null).cast(rKeyed.schema("__r").dataType).as("__r"),
        struct(leftCols.map(col): _*).as("__l")): _*)
    val base0 = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__ord").asc_nulls_first, col("__tag"))
    val w = base0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withBack = rKeyed.unionByName(lKeyed)
      .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(w))
    // nearest: the forward candidate comes from the SAME sort in the same
    // window pass (frame current->following). A right row at equal ts sits
    // before the left row (tag order) so it is only in the backward frame —
    // harmless: its gap is 0, the minimum, so backward wins anyway.
    val withBoth =
      if (!nearest) withBack.withColumn("__m", col("__mb"))
      else withBack.withColumn("__mf",
        first(col("__r"), ignoreNulls = true)
          .over(base0.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    def tsOf(c: String): Column = {
      val st = withBoth.schema(c).dataType.asInstanceOf[StructType]
      normCol(st(rightTs).dataType, col(s"$c.$rightTs"))
    }
    val carried =
      if (!nearest) withBoth.filter(col("__tag") === 1)
      else {
        val bg = col("__ord") - tsOf("__mb") * sign
        val fg = tsOf("__mf") * sign - col("__ord")
        // ties (bg == fg) take the backward match — pandas merge_asof
        // direction='nearest' convention
        withBoth
          .withColumn("__m", when(col("__mb").isNotNull &&
            (col("__mf").isNull || bg <= fg), col("__mb")).otherwise(col("__mf")))
          .filter(col("__tag") === 1)
      }
    val mTs = {
      val st = carried.schema("__m").dataType.asInstanceOf[StructType]
      normCol(st(rightTs).dataType, col(s"__m.$rightTs"))
    }
    val gap =
      if (!nearest) col("__ord") - mTs * sign
      else abs(col("__ord") - mTs * sign)
    val lagOk = tolerance match {
      case None      => col("__m").isNotNull && col("__ord").isNotNull
      case Some(tol) => col("__m").isNotNull && col("__ord").isNotNull &&
        gap <= lit(tol)
    }
    val matched = carried.withColumn("__ok", coalesce(lagOk, lit(false)))
    val base = if (how == "inner") matched.filter(col("__ok")) else matched
    val outCols =
      leftCols.map(c => col(s"__l.$c").as(c)) ++
      rPayloadCols.filterNot(_.startsWith("__")).map(c =>
        when(col("__ok"), col(s"__m.$c")).as(s"$rightPrefix$c"))
    base.select(outCols: _*)
  }

  /** RANGE JOIN: every (point, interval) pair with `start <= pt <= end`
    * (closed), as a binned hash equi-join. `binWidth` defaults to the mean
    * interval length (one small aggregate), bounding expected duplication
    * at ~2 exploded rows per interval; pass it explicitly when the
    * interval-length distribution is long-tailed. Inverted intervals
    * (end < start) match nothing. Output: all point columns, then interval
    * columns prefixed with `ivPrefix`. Each qualifying pair appears
    * exactly once. */
  def rangeJoin(points: DataFrame, ptCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                binWidth: Option[Long] = None,
                ivPrefix: String = "iv_",
                keys: Seq[(String, String)] = Nil): DataFrame = {
    checkReserved(points, "rangeJoin points"); checkReserved(intervals, "rangeJoin intervals")
    val pt = tsNorm(points, ptCol)
    val st = tsNorm(intervals, startCol)
    val en = tsNorm(intervals, endCol)
    val w = binWidth.getOrElse {
      val Array(r) = intervals.filter(en >= st).agg(avg(en - st)).collect()
      if (r.isNullAt(0)) 1L else math.max(1L, math.ceil(r.getDouble(0)).toLong)
    }
    require(w > 0, s"binWidth must be positive; got $w")
    val ivCols = intervals.columns.toIndexedSeq
    points.columns.foreach { c =>
      require(!ivCols.map(ivPrefix + _).contains(c),
        s"output column collision: points already has $c")
    }
    val ex = intervals.filter(en >= st)
      .withColumn("__bin", explode(sequence(idiv(st, w), idiv(en, w))))
      .select(col("__bin") +: ivCols.map(c => col(c).as(s"$ivPrefix$c")): _*)
    val ptsB = points.withColumn("__bin", idiv(pt, w))
    // optional equi keys (e.g. per-user windows): ride the same hash join
    val keyCond = keys.map { case (pc, ic) => col(pc) === col(s"$ivPrefix$ic") }
      .foldLeft(ptsB("__bin") === ex("__bin"))(_ && _)
    val joined = ptsB.join(ex, keyCond).drop(ex("__bin"))
    val stJ = tsNormP(joined, s"$ivPrefix$startCol", intervals, startCol)
    val enJ = tsNormP(joined, s"$ivPrefix$endCol", intervals, endCol)
    joined.filter(pt >= stJ && pt <= enJ).drop("__bin")
  }

  /** INTERVAL OVERLAP JOIN: every (a, b) pair of closed intervals with
    * `aStart <= bEnd && bStart <= aEnd`. Both sides explode to bins; a
    * pair is claimed only in the first bin both cover, so the equi-join
    * emits each pair exactly once. `binWidth` defaults to the larger of
    * the two sides' mean lengths. Output: a's columns, then b's prefixed
    * with `bPrefix`. */
  def intervalOverlapJoin(a: DataFrame, aStart: String, aEnd: String,
                          b: DataFrame, bStart: String, bEnd: String,
                          binWidth: Option[Long] = None,
                          bPrefix: String = "b_",
                          keys: Seq[(String, String)] = Nil): DataFrame = {
    checkReserved(a, "intervalOverlapJoin a"); checkReserved(b, "intervalOverlapJoin b")
    val as0 = tsNorm(a, aStart); val ae0 = tsNorm(a, aEnd)
    val bs0 = tsNorm(b, bStart); val be0 = tsNorm(b, bEnd)
    val w = binWidth.getOrElse {
      val Array(ra) = a.filter(ae0 >= as0).agg(avg(ae0 - as0)).collect()
      val Array(rb) = b.filter(be0 >= bs0).agg(avg(be0 - bs0)).collect()
      val m = Seq(ra, rb).filterNot(_.isNullAt(0)).map(_.getDouble(0))
      if (m.isEmpty) 1L else math.max(1L, math.ceil(m.max).toLong)
    }
    require(w > 0, s"binWidth must be positive; got $w")
    val bCols = b.columns.toIndexedSeq
    a.columns.foreach { c =>
      require(!bCols.map(bPrefix + _).contains(c),
        s"output column collision: a already has $c")
    }
    val aEx = a.filter(ae0 >= as0)
      .withColumn("__bin", explode(sequence(idiv(as0, w), idiv(ae0, w))))
    val bEx = b.filter(be0 >= bs0)
      .withColumn("__bin", explode(sequence(idiv(bs0, w), idiv(be0, w))))
      .select(col("__bin") +: bCols.map(c => col(c).as(s"$bPrefix$c")): _*)
    val keyCond = keys.map { case (ac, bc) => col(ac) === col(s"$bPrefix$bc") }
      .foldLeft(aEx("__bin") === bEx("__bin"))(_ && _)
    val joined = aEx.join(bEx, keyCond).drop(bEx("__bin"))
    val asJ = tsNormP(joined, aStart, a, aStart)
    val aeJ = tsNormP(joined, aEnd, a, aEnd)
    val bsJ = tsNormP(joined, s"$bPrefix$bStart", b, bStart)
    val beJ = tsNormP(joined, s"$bPrefix$bEnd", b, bEnd)
    joined
      .filter(asJ <= beJ && bsJ <= aeJ)
      .filter(col("__bin") === greatest(idiv(asJ, w), idiv(bsJ, w)))
      .drop("__bin")
  }

  /** Prefixed/joined-frame ts normalization: column `prefixed` in the
    * joined frame carries `src(orig)`'s type. */
  private def tsNormP(joined: DataFrame, prefixed: String,
                      src: DataFrame, orig: String): Column =
    normCol(src.schema(orig).dataType, col(prefixed))
}
