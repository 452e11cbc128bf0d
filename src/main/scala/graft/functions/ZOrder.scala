package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve keys for multi-dimensional data layout.
  *
  * Sorting a table by the bit-interleave of several columns before a
  * parquet write co-locates rows that are close in EVERY dimension, so
  * min/max row-group statistics prune scans filtered on any subset of the
  * interleaved columns — the standard layout trick for multi-dimensional
  * pruning at 100 TB, where a single-column sort only helps that one
  * column's predicates. (The repo's [[graft.geom.Hilbert]] plays the same
  * role for geometry; this is the integer-attribute counterpart.)
  *
  * Everything here is pure Column arithmetic (shifts and masks — a balanced
  * reduction tree that whole-stage codegen inlines; no UDF) over the LOW
  * `bits` bits of non-negative long inputs: exact, engine-portable integer
  * ops with no doubles anywhere, so an external engine replays the key
  * bit-identically.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd):
    * result bit 2i = x bit i, bit 2i+1 = y bit i. Inputs must be
    * non-negative; values >= 2^bits contribute only their low bits
    * (callers clamp/quantize first). */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]; got $bits")
    interleave(Seq(x, y), bits)
  }

  /** N-column interleave: result bit (i*n + j) = cols(j) bit i — the
    * round-robin generalization (dimension j's bit i lands at stride-n
    * position). `n * bits` must fit a signed long. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "need at least one column")
    require(bits >= 1 && n.toLong * bits <= 63, s"n*bits must be <= 63; got ${n * bits}")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Clamp-quantize an arbitrary numeric column onto [0, 2^bits): values
    * at or below `lo` map to 0, at or above `hi` to 2^bits − 1, linear
    * in between. Double arithmetic is written as the canonical
    * `floor((c − lo) / (hi − lo) * 2^bits)` so an external engine doing
    * the identically-parenthesized IEEE ops reproduces the cell id. */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"hi must exceed lo; got [$lo, $hi]")
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]; got $bits")
    val cells = (1L << bits).toDouble
    least(greatest(floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(cells))
      .cast("long"), lit(0L)), lit((1L << bits) - 1L))
  }
}
