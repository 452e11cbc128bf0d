package graft.geom

/** Hilbert space-filling curve index (reference
  * `geopandas/tools/hilbert_curve.py:4-184`: bbox midpoint → discretize →
  * bit-interleave). Used both as the user-facing `hilbert_distance` column
  * (ref `base.py:6345`) and as the engine's spatial shuffle key:
  * `repartitionByRange(st_hilbert(geom))` gives locality-preserving
  * partitioning for spatial joins at cluster scale.
  */
object Hilbert {
  /** Map (x, y) in cell coordinates on a 2^order × 2^order grid to the
    * Hilbert curve distance. Classic Wikipedia xy2d bit-twiddling. */
  def xy2d(order: Int, xIn: Long, yIn: Long): Long = {
    var rx = 0L
    var ry = 0L
    var d = 0L
    var x = xIn
    var y = yIn
    var s: Long = 1L << (order - 1)
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert distance of a geometry bbox midpoint within total bounds,
    * at the given curve order (ref level ≤ 16, `base.py:6345-6377`). */
  def distance(midX: Double, midY: Double,
               tbMinX: Double, tbMinY: Double, tbMaxX: Double, tbMaxY: Double,
               order: Int): Long = {
    val side: Long = (1L << order) - 1
    val w = tbMaxX - tbMinX
    val h = tbMaxY - tbMinY
    val cx = if (w <= 0) 0L else math.min(side, math.max(0L, math.floor((midX - tbMinX) / w * side).toLong))
    val cy = if (h <= 0) 0L else math.min(side, math.max(0L, math.floor((midY - tbMinY) / h * side).toLong))
    xy2d(order, cx, cy)
  }
}
