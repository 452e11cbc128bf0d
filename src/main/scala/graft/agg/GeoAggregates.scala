package graft.agg

import graft.geom.{GeomOps, Wkb}
import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Geometry aggregates (reference `union_all` `base.py:2500-2553`,
  * `intersection_all` `base.py:2554`, dissolve's per-group union
  * `geodataframe.py:2309-2316`, `total_bounds` `base.py:5288`).
  *
  * Implemented as `Aggregator`s with a buffered WKB list + periodic
  * compaction: Spark runs them as partial (map-side) + final aggregation, so
  * a dissolve over 100 TB unions per-partition first — the tree-merge the
  * reference gets from GEOS CascadedPolygonUnion, distributed.
  */
object GeoAggregates {

  case class GeomBuf(items: Seq[Array[Byte]]) {
    def add(b: Array[Byte]): GeomBuf = compactIfNeeded(GeomBuf(items :+ b))
    def ++(o: GeomBuf): GeomBuf = compactIfNeeded(GeomBuf(items ++ o.items))
  }
  private val CompactAt = 64
  private def compactIfNeeded(b: GeomBuf): GeomBuf =
    if (b.items.length < CompactAt) b
    else GeomBuf(Seq(Wkb.write(GeomOps.unionAll(b.items.map(Wkb.read)))))

  private val bufEnc: Encoder[GeomBuf] = Encoders.product[GeomBuf]
  private val binEnc: Encoder[Array[Byte]] = Encoders.BINARY

  /** st_union_agg — GEOS UnaryUnion per group, tree-merged across partitions. */
  class UnionAgg extends Aggregator[Array[Byte], GeomBuf, Array[Byte]] {
    def zero: GeomBuf = GeomBuf(Nil)
    def reduce(b: GeomBuf, a: Array[Byte]): GeomBuf = if (a == null) b else b.add(a)
    def merge(x: GeomBuf, y: GeomBuf): GeomBuf = x ++ y
    def finish(b: GeomBuf): Array[Byte] =
      if (b.items.isEmpty) null else Wkb.write(GeomOps.unionAll(b.items.map(Wkb.read)))
    def bufferEncoder: Encoder[GeomBuf] = bufEnc
    def outputEncoder: Encoder[Array[Byte]] = binEnc
  }

  /** st_coverage_union_agg — union for polygonal COVERAGES (non-overlapping,
    * edge-matched inputs; ref union_all(method="coverage"),
    * array.py:1002-1019): JTS CoverageUnion skips overlay noding entirely,
    * ~10× cheaper than UnaryUnion for dissolves over admin boundaries.
    * Map-side compaction is safe: the union of a sub-coverage keeps its
    * outer edges exact, so partial results stay edge-matched with the rest. */
  class CoverageUnionAgg extends Aggregator[Array[Byte], GeomBuf, Array[Byte]] {
    private val compactAt = 256
    private def compact(b: GeomBuf): GeomBuf =
      if (b.items.length < compactAt) b
      else GeomBuf(Seq(Wkb.write(GeomOps.coverageUnion(b.items.map(Wkb.read)))))
    def zero: GeomBuf = GeomBuf(Nil)
    def reduce(b: GeomBuf, a: Array[Byte]): GeomBuf =
      if (a == null) b else compact(GeomBuf(b.items :+ a))
    def merge(x: GeomBuf, y: GeomBuf): GeomBuf = compact(GeomBuf(x.items ++ y.items))
    def finish(b: GeomBuf): Array[Byte] =
      if (b.items.isEmpty) null else Wkb.write(GeomOps.coverageUnion(b.items.map(Wkb.read)))
    def bufferEncoder: Encoder[GeomBuf] = bufEnc
    def outputEncoder: Encoder[Array[Byte]] = binEnc
  }

  /** st_disjoint_subset_union_agg — union via connected components (ref
    * union_all(method="disjoint_subset"), GEOS 3.12): clusters that don't
    * touch never node against each other. Union is associative, so
    * map-side compaction with the same kernel is safe. */
  class DisjointSubsetUnionAgg extends Aggregator[Array[Byte], GeomBuf, Array[Byte]] {
    private val compactAt = 128
    private def compact(b: GeomBuf): GeomBuf =
      if (b.items.length < compactAt) b
      else GeomBuf(Seq(Wkb.write(GeomOps.unionAllDisjointSubset(b.items.map(Wkb.read)))))
    def zero: GeomBuf = GeomBuf(Nil)
    def reduce(b: GeomBuf, a: Array[Byte]): GeomBuf =
      if (a == null) b else compact(GeomBuf(b.items :+ a))
    def merge(x: GeomBuf, y: GeomBuf): GeomBuf = compact(GeomBuf(x.items ++ y.items))
    def finish(b: GeomBuf): Array[Byte] =
      if (b.items.isEmpty) null else Wkb.write(GeomOps.unionAllDisjointSubset(b.items.map(Wkb.read)))
    def bufferEncoder: Encoder[GeomBuf] = bufEnc
    def outputEncoder: Encoder[Array[Byte]] = binEnc
  }

  /** st_collect_agg — collect geometries into a Multi-geometry or
    * GeometryCollection (no dissolve/dedup). */
  class CollectAgg extends Aggregator[Array[Byte], GeomBuf, Array[Byte]] {
    def zero: GeomBuf = GeomBuf(Nil)
    def reduce(b: GeomBuf, a: Array[Byte]): GeomBuf = if (a == null) b else GeomBuf(b.items :+ a)
    def merge(x: GeomBuf, y: GeomBuf): GeomBuf = GeomBuf(x.items ++ y.items)
    def finish(b: GeomBuf): Array[Byte] =
      if (b.items.isEmpty) null else Wkb.write(GeomOps.collect(b.items.map(Wkb.read)))
    def bufferEncoder: Encoder[GeomBuf] = bufEnc
    def outputEncoder: Encoder[Array[Byte]] = binEnc
  }

  /** st_intersection_all_agg — fold of pairwise intersection (ref base.py:2554). */
  class IntersectionAllAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = null
    def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
      if (a == null) b
      else if (b == null) a
      else Wkb.write(GeomOps.intersection(Wkb.read(b), Wkb.read(a)))
    def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = reduce(x, y)
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: Encoder[Array[Byte]] = binEnc
    def outputEncoder: Encoder[Array[Byte]] = binEnc
  }

  case class Bounds4(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

  /** total_bounds (ref base.py:5288) — min/max envelope over a geometry column. */
  class TotalBoundsAgg extends Aggregator[Array[Byte], Bounds4, Bounds4] {
    def zero: Bounds4 = Bounds4(Double.PositiveInfinity, Double.PositiveInfinity, Double.NegativeInfinity, Double.NegativeInfinity)
    def reduce(b: Bounds4, a: Array[Byte]): Bounds4 =
      if (a == null) b
      else {
        val e = Wkb.read(a).getEnvelopeInternal
        // empty geometries have a null (0,0,-1,-1) envelope — folding it in
        // would contaminate the bounds; the reference skips them
        if (e.isNull) b
        else Bounds4(math.min(b.xmin, e.getMinX), math.min(b.ymin, e.getMinY),
          math.max(b.xmax, e.getMaxX), math.max(b.ymax, e.getMaxY))
      }
    def merge(x: Bounds4, y: Bounds4): Bounds4 =
      Bounds4(math.min(x.xmin, y.xmin), math.min(x.ymin, y.ymin), math.max(x.xmax, y.xmax), math.max(x.ymax, y.ymax))
    // a group whose geometries are all null/empty leaves the zero buffer
    // untouched; the reference's total_bounds returns [nan, nan, nan, nan]
    // there (base.py:5288), not the +Inf/-Inf identity
    def finish(b: Bounds4): Bounds4 =
      if (b.xmin == Double.PositiveInfinity) Bounds4(Double.NaN, Double.NaN, Double.NaN, Double.NaN)
      else b
    def bufferEncoder: Encoder[Bounds4] = Encoders.product[Bounds4]
    def outputEncoder: Encoder[Bounds4] = Encoders.product[Bounds4]
  }

  lazy val stUnionAggU = udaf(new UnionAgg())
  lazy val stCoverageUnionAggU = udaf(new CoverageUnionAgg())
  lazy val stDisjointSubsetUnionAggU = udaf(new DisjointSubsetUnionAgg())
  lazy val stCollectAggU = udaf(new CollectAgg())
  lazy val stIntersectionAllAggU = udaf(new IntersectionAllAgg())
  lazy val stTotalBoundsAggU = udaf(new TotalBoundsAgg())

  def st_union_agg(g: Column): Column = stUnionAggU(g)
  def st_coverage_union_agg(g: Column): Column = stCoverageUnionAggU(g)
  def st_disjoint_subset_union_agg(g: Column): Column = stDisjointSubsetUnionAggU(g)
  def st_collect_agg(g: Column): Column = stCollectAggU(g)
  def st_intersection_all_agg(g: Column): Column = stIntersectionAllAggU(g)
  def st_total_bounds_agg(g: Column): Column = stTotalBoundsAggU(g)

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("st_union_agg", stUnionAggU)
    spark.udf.register("st_coverage_union_agg", stCoverageUnionAggU)
    spark.udf.register("st_disjoint_subset_union_agg", stDisjointSubsetUnionAggU)
    spark.udf.register("st_collect_agg", stCollectAggU)
    spark.udf.register("st_intersection_all_agg", stIntersectionAllAggU)
    spark.udf.register("st_total_bounds_agg", stTotalBoundsAggU)
  }
}
