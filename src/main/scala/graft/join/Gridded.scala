package graft.join

import graft.io.Bucketed
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pre-gridded, bucket-co-located spatial storage — the spatial analog of
  * the pre-banded MinHash snapshot tier: move the per-join work (grid
  * sizing stats, bbox computation, cell explode, and above all the
  * SHUFFLE) to write time, once, so every subsequent spatial join over the
  * stored tables is a zero-Exchange sort-merge join on the stored cell
  * column plus the usual bbox prefilter + exact refine.
  *
  * At the 100 TB steady state a corpus's geometry tables are spatially
  * joined over and over (every analysis run probes the same parcels /
  * regions / grid layers). The plain grid `sjoin` pays per call: two
  * sampled stats jobs, per-row bbox + cell explode of BOTH sides, and a
  * full shuffle of both exploded sides onto the cell key. Writing each
  * table once with [[writeGridded]] (explode to covering cells of a SHARED
  * [[SpatialJoin.GridSpec]], bucket by the cell column) makes Spark's
  * bucketed-join machinery plan [[sjoinGridded]] with no Exchange on
  * either side — the join reads co-located bucket files directly.
  *
  * Storage contract:
  *  - the cell column name ENCODES the grid spec
  *    (`__grid_<xmin><ymin><xmax><ymax>-hex_<nx>_<ny>`), so two tables
  *    written against different grids fail loudly at join time instead of
  *    silently joining nothing — the same spec-fused-into-the-name trick
  *    as the pre-banded dedup snapshot;
  *  - envelope columns `__gb_x0/y0/x1/y1` are stored per row (needed by
  *    the bbox prefilter and the reference-cell dedup);
  *  - rows with NULL or EMPTY geometry cover no cells and are dropped at
  *    write (they can never satisfy a predicate — inner-join semantics;
  *    use the plain `sjoin` for outer hows over such rows);
  *  - a row appears once per covered cell (duplication factor bounded by
  *    the grid sizing, ~2-3 copies) — [[sjoinGridded]] de-duplicates with
  *    the reference-cell trick, and [[readGridded]] exposes the raw table
  *    for callers who want the cell layout itself.
  *
  * `dwithin` needs distance-expanded cell coverage decided at write time,
  * so it is not supported here — every other [[SpatialJoin.Predicates]]
  * member implies bbox overlap and works on the stored envelopes.
  */
object Gridded {

  private def hex(d: Double): String =
    java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(d))
  private def unhex(s: String): Double =
    java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(s, 16))

  private[graft] def cellColName(g: SpatialJoin.GridSpec): String =
    s"__grid_${hex(g.xmin)}_${hex(g.ymin)}_${hex(g.xmax)}_${hex(g.ymax)}_${g.nx}_${g.ny}"

  private[graft] def parseSpec(name: String): SpatialJoin.GridSpec = {
    val p = name.stripPrefix("__grid_").split('_')
    require(p.length == 6, s"not a gridded cell column: $name")
    SpatialJoin.GridSpec(unhex(p(0)), unhex(p(1)), unhex(p(2)), unhex(p(3)),
      p(4).toInt, p(5).toInt)
  }

  /** The grid spec a gridded frame was written with (from its cell column
    * name). Fails with the supported layout when the frame is not gridded. */
  def specOf(df: DataFrame): SpatialJoin.GridSpec = {
    val cells = df.columns.filter(_.startsWith("__grid_"))
    require(cells.length == 1,
      s"expected exactly one __grid_ cell column (a table written by " +
        s"Gridded.writeGridded), found: ${cells.mkString(", ")}")
    parseSpec(cells.head)
  }

  /** Size a grid for one table from its own (sampled) bbox stats — the
    * single-table analog of the join-time sizing. Compute it once from the
    * LARGER table of a join family and pass the same spec to every
    * [[writeGridded]] that should be joinable against it. */
  def gridFor(df: DataFrame, geomCol: String = "geometry"): SpatialJoin.GridSpec =
    SpatialJoin.computeGrid(df, col(geomCol), df, col(geomCol), 0.0)

  /** Write `df` gridded + bucketed: bbox and covering-cell columns
    * computed once, exploded, bucketed by the cell into `buckets` files,
    * registered as `table` in the session catalog. Both sides of a future
    * [[sjoinGridded]] must share `grid` AND `buckets`. Returns the spec. */
  def writeGridded(df: DataFrame, table: String, path: String,
                   grid: SpatialJoin.GridSpec, geomCol: String = "geometry",
                   buckets: Int = 32): SpatialJoin.GridSpec = {
    val g = grid
    val cellsU = udf((x0: Double, y0: Double, x1: Double, y1: Double) =>
      g.cellsFor(x0, y0, x1, y1))
    val c = cellColName(g)
    val exploded = df
      .withColumn("__gb", graft.functions.GeoFunctions.st_bounds(col(geomCol)))
      .filter(col("__gb").isNotNull)
      .withColumn("__gb_x0", col("__gb.xmin"))
      .withColumn("__gb_y0", col("__gb.ymin"))
      .withColumn("__gb_x1", col("__gb.xmax"))
      .withColumn("__gb_y1", col("__gb.ymax"))
      .withColumn(c, explode(cellsU(col("__gb_x0"), col("__gb_y0"), col("__gb_x1"), col("__gb_y1"))))
      .drop("__gb")
    Bucketed.write(exploded, table, path, c, buckets)
    g
  }

  /** Read a gridded table back WITH its bucket metadata (reading the
    * parquet path directly would lose the bucket spec and reintroduce the
    * join shuffle). */
  def readGridded(spark: SparkSession, table: String): DataFrame =
    Bucketed.read(spark, table)

  /** Inner spatial join of two gridded tables: sort-merge on the stored
    * cell column (co-located buckets — zero Exchange, pinned by
    * GriddedSpatialSpec), bbox-overlap prefilter on the stored envelopes,
    * reference-cell dedup, exact refine through [[RefineCache]]. Results
    * equal `SpatialJoin.sjoin(..., "inner")` on the original tables minus
    * nothing — NULL/EMPTY rows were never candidates. */
  def sjoinGridded(left: DataFrame, right: DataFrame,
                   predicate: String = "intersects",
                   leftGeom: String = "geometry", rightGeom: String = "geometry",
                   lsuffix: String = "left", rsuffix: String = "right"): DataFrame = {
    require(SpatialJoin.Predicates.contains(predicate) && predicate != "dwithin",
      s"predicate must be one of ${SpatialJoin.Predicates - "dwithin"} " +
        "(dwithin needs distance-expanded cells decided at write time — use SpatialJoin.sjoin)")
    val gl = specOf(left)
    val gr = specOf(right)
    require(gl == gr,
      s"gridded tables were written against different grids ($gl vs $gr) — " +
        "re-write one side with the other's spec (Gridded.writeGridded(grid = ...))")
    val cellC = cellColName(gl)
    // rename the right side's working + clashing columns (the cell column
    // keeps its left name for the equi-join; Spark's alias-aware
    // partitioning propagation keeps the bucket co-location through the
    // renames)
    val (rightGeomed, rGeomName) =
      if (leftGeom == rightGeom)
        (right.withColumnRenamed(rightGeom, s"${rightGeom}_$rsuffix"), s"${rightGeom}_$rsuffix")
      else (right, rightGeom)
    val r2 = rightGeomed
      .withColumnRenamed(cellC, "__gridr")
      .withColumnRenamed("__gb_x0", "__gbr_x0")
      .withColumnRenamed("__gb_y0", "__gbr_y0")
      .withColumnRenamed("__gb_x1", "__gbr_x1")
      .withColumnRenamed("__gb_y1", "__gbr_y1")
    val (l2, r3) = SpatialJoin.applySuffixes(left, r2, leftGeom, rGeomName, lsuffix, rsuffix)
    val g = gl
    val cellOfU = udf((x: Double, y: Double) => g.cellOf(x, y))
    val pred = predicate
    val refineU = udf((a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) false else RefineCache.eval(pred, a, b, 0.0))
    l2.join(r3, col(cellC) === col("__gridr"))
      .filter(col("__gb_x0") <= col("__gbr_x1") && col("__gbr_x0") <= col("__gb_x1") &&
        col("__gb_y0") <= col("__gbr_y1") && col("__gbr_y0") <= col("__gb_y1") &&
        col(cellC) === cellOfU(greatest(col("__gb_x0"), col("__gbr_x0")),
          greatest(col("__gb_y0"), col("__gbr_y0"))) &&
        refineU(col(leftGeom), col(rGeomName)))
      .drop(cellC, "__gridr", "__gb_x0", "__gb_y0", "__gb_x1", "__gb_y1",
        "__gbr_x0", "__gbr_y0", "__gbr_x1", "__gbr_y1")
  }
}
