package graft.api

import graft.agg.GeoAggregates
import graft.crs.CrsTransform
import graft.functions.GeoFunctions._
import graft.join.{Clip, Overlay, SJoinNearest, SpatialJoin}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Spark-native `GeoDataFrame` (reference `geodataframe.py:83`):
  * a `DataFrame` + the name of the active geometry column + a CRS per
  * geometry column. Thin and immutable — every method returns a new wrapper
  * around a new lazy plan; nothing executes until an action.
  *
  * Reference semantics preserved: active-geometry concept
  * (`geodataframe.py:293-302`), `set_crs` vs `to_crs`
  * (`geoseries.py:1083-1184` / `1185`), `.cx` bbox indexer
  * (`base.py:6206-6240`), dissolve (`geodataframe.py:2172-2327`).
  * Documented divergence: no pandas row index, so cross-frame aligned binary
  * ops are expressed as explicit joins instead (SURVEY §1.1).
  */
case class GeoDataFrame(df: DataFrame, geometryCol: String = "geometry",
                        crs: Map[String, String] = Map.empty) {

  def geometry: Column = col(geometryCol)
  def activeGeometryName: String = geometryCol
  def activeCrs: Option[String] = crs.get(geometryCol)

  def setGeometry(name: String): GeoDataFrame = {
    require(df.columns.contains(name), s"no column $name")
    copy(geometryCol = name)
  }

  /** Declare CRS without transforming (ref set_crs, errors if set unless override). */
  def setCrs(crsName: String, allowOverride: Boolean = false): GeoDataFrame = {
    if (!allowOverride && crs.contains(geometryCol))
      throw new IllegalArgumentException(
        "CRS already set; pass allowOverride=true (ref GeoSeries.set_crs semantics)")
    copy(crs = crs + (geometryCol -> crsName))
  }

  /** Reproject coordinates (ref to_crs; no-op when CRS already matches).
    * The source CRS may be a WKT string (e.g. a shapefile .prj) or PROJJSON —
    * its EPSG code is recovered from AUTHORITY clauses or well-known ESRI
    * names; when the code isn't in the registry, the projection parameters
    * carried by the definition itself are parsed (LCC/TM/Albers/Mercator
    * families, crs/ProjParse.scala). */
  def toCrs(target: String): GeoDataFrame = {
    val from = activeCrs.getOrElse(throw new IllegalArgumentException(
      "Cannot transform naive geometries: CRS not set (ref to_crs)"))
    val fromEpsg = CrsTransform.normalizeOpt(from)
    val toEpsg = CrsTransform.normalizeOpt(target)
    val label = toEpsg.map(c => s"EPSG:$c").getOrElse(target)
    (fromEpsg, toEpsg) match {
      case (Some(a), Some(b)) if a == b => this
      case (Some(a), Some(b)) if CrsTransform.forEpsg(a).isDefined && CrsTransform.forEpsg(b).isDefined =>
        GeoDataFrame(
          df.withColumn(geometryCol, st_transform(col(geometryCol), lit(a), lit(b))),
          geometryCol, crs + (geometryCol -> label))
      case _ =>
        // parameter-driven path; resolve eagerly so an unsupported CRS fails
        // here with a clear message, not inside an executor task
        CrsTransform.chainStr(from, target)
        GeoDataFrame(
          df.withColumn(geometryCol, st_transform_crs(col(geometryCol), lit(from), lit(target))),
          geometryCol, crs + (geometryCol -> label))
    }
  }

  def estimateUtmCrs(datumName: String = "WGS 84"): String = {
    val b = totalBounds
    val epsg = CrsTransform.estimateUtmEpsg((b._1 + b._3) / 2, (b._2 + b._4) / 2, datumName)
    s"EPSG:$epsg"
  }

  // ---- per-row derived columns (GeoSeries properties) ----------------------
  private def derived(c: Column): DataFrame = df.withColumn(geometryCol, c)

  /** The reference warns when planar measures run in a geographic CRS —
    * degrees are not meters (array.py:435-446). Never throws: a WKT-valued
    * CRS (e.g. a raw .prj from the Shapefile reader) is a normal state. */
  private def warnIfGeographic(op: String): Unit =
    activeCrs.filter(CrsTransform.isGeographic)
      .foreach { c =>
        org.slf4j.LoggerFactory.getLogger(classOf[GeoDataFrame]).warn(
          s"Geometry is in a geographic CRS ($c); '$op' results are likely incorrect. " +
            "Use toCrs() to project to a planar CRS first (ref geopandas array.py:435-446).")
      }

  def area: DataFrame = { warnIfGeographic("area"); df.withColumn("area", st_area(geometry)) }
  def length: DataFrame = { warnIfGeographic("length"); df.withColumn("length", st_length(geometry)) }
  def bounds: DataFrame = df.withColumn("bounds", st_bounds(geometry))
  /** Interior-ring count per geometry (ref count_interior_rings, base.py:629);
    * 0 for non-polygons, summed across a MultiPolygon's members. */
  def countInteriorRings: DataFrame =
    df.withColumn("count_interior_rings", st_n_interior_rings(geometry))
  /** Interior rings as an array-of-linework column (ref interiors,
    * geoseries.py — list of LinearRings per polygon). */
  def interiors: DataFrame = df.withColumn("interiors", st_interiors(geometry))
  def centroid: GeoDataFrame = { warnIfGeographic("centroid"); copy(df = derived(st_centroid(geometry))) }
  def boundary: GeoDataFrame = copy(df = derived(st_boundary(geometry)))
  def envelope: GeoDataFrame = copy(df = derived(st_envelope(geometry)))
  def convexHull: GeoDataFrame = copy(df = derived(st_convex_hull(geometry)))
  def buffer(d: Double): GeoDataFrame = { warnIfGeographic("buffer"); copy(df = derived(st_buffer(geometry, lit(d)))) }
  def simplify(tol: Double, preserveTopology: Boolean = true): GeoDataFrame =
    copy(df = derived(st_simplify(geometry, lit(tol), lit(preserveTopology))))
  def makeValid: GeoDataFrame = copy(df = derived(st_make_valid(geometry)))

  /** (minx, miny, maxx, maxy) over the whole column (ref base.py:5288).
    * Runs through [[graft.agg.GeoAggregates.TotalBoundsAgg]], which SKIPS
    * empty geometries (the old per-row st_bounds + min/max spelling folded
    * their JTS null envelope (0, 0, −1, −1) into the result — the
    * reference ignores empties) and reports the reference's
    * (nan, nan, nan, nan) for an all-null/empty column. For CONSTRUCTED
    * point columns the GeomSimplify aggregate rewrite turns this into four
    * columnar min/max aggregates — no per-row WKB at all. */
  def totalBounds: (Double, Double, Double, Double) = {
    val r = df.agg(graft.agg.GeoAggregates.st_total_bounds_agg(geometry).as("b"))
      .select(col("b.xmin"), col("b.ymin"), col("b.xmax"), col("b.ymax")).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  /** `.cx[xmin:xmax, ymin:ymax]` — rows whose geometry intersects the bbox
    * (ref base.py:6206-6240). */
  def cx(xmin: Double, ymin: Double, xmax: Double, ymax: Double): GeoDataFrame = {
    import graft.geom.{GeomOps, Wkb}
    copy(df = df.filter(st_intersects(geometry, lit(Wkb.write(GeomOps.makeBox(xmin, ymin, xmax, ymax))))))
  }

  /** `.cx` with open-ended slices (ref `.cx[:x1, y0:]` etc.): missing ends
    * fall back to the frame's total bounds, like the reference's unbounded
    * numpy slices. */
  def cx(xmin: Option[Double], ymin: Option[Double],
         xmax: Option[Double], ymax: Option[Double]): GeoDataFrame = {
    if (xmin.isEmpty && ymin.isEmpty && xmax.isEmpty && ymax.isEmpty) return this
    val b = totalBounds
    cx(xmin.getOrElse(b._1), ymin.getOrElse(b._2), xmax.getOrElse(b._3), ymax.getOrElse(b._4))
  }

  /** Multi-part → single-part rows (ref explode, geodataframe.py:2330-2440);
    * adds `part_index` like the reference's index_parts. */
  def explodeParts(): GeoDataFrame = {
    val exploded = df
      .select(col("*"), posexplode(st_parts(geometry)).as(Seq("part_index", "__graft_part")))
      .withColumn(geometryCol, col("__graft_part")).drop("__graft_part")
    copy(df = exploded)
  }

  /** Flatten to one row per vertex (ref get_coordinates, base.py:6242-6343). */
  def getCoordinates: DataFrame =
    df.select(col("*"), explode(st_coords(geometry)).as("__c"))
      .withColumn("x", col("__c.x")).withColumn("y", col("__c.y")).drop("__c", geometryCol)

  /** groupBy + geometric union + data aggregations (ref dissolve,
    * geodataframe.py:2172-2327). `aggfunc`: column -> first/sum/mean/min/max/
    * count/collect_list; unspecified non-key columns default to `first`. */
  def dissolve(by: Seq[String] = Nil, aggfunc: Map[String, String] = Map.empty,
               method: String = "unary"): GeoDataFrame = {
    require(Seq("unary", "coverage", "disjoint_subset").contains(method),
      s"method must be unary/coverage/disjoint_subset, got $method")
    def toAgg(c: String, f: String): Column = f match {
      case "first"        => first(col(c), ignoreNulls = false).as(c)
      case "sum"          => sum(col(c)).as(c)
      case "mean" | "avg" => avg(col(c)).as(c)
      case "min"          => min(col(c)).as(c)
      case "max"          => max(col(c)).as(c)
      case "count"        => org.apache.spark.sql.functions.count(col(c)).as(c)
      case "collect_list" => collect_list(col(c)).as(c)
      case other          => expr(s"$other(`$c`)").as(c)
    }
    val dataCols = df.columns.filterNot(c => by.contains(c) || c == geometryCol)
    val unionAgg = method match {
      case "coverage"        => GeoAggregates.st_coverage_union_agg(geometry)
      case "disjoint_subset" => GeoAggregates.st_disjoint_subset_union_agg(geometry)
      case _                 => GeoAggregates.st_union_agg(geometry)
    }
    val aggs = unionAgg.as(geometryCol) +:
      dataCols.map(c => toAgg(c, aggfunc.getOrElse(c, "first"))).toSeq
    val grouped =
      if (by.isEmpty) df.groupBy(lit(0).as("__graft_g")).agg(aggs.head, aggs.tail: _*).drop("__graft_g")
      else df.groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
    copy(df = grouped)
  }

  /** Arbitrary per-vertex coordinate transform (ref base.py:2257
    * transform(func)); the closure ships to executors like any UDF. */
  def transform(f: (Double, Double, Double) => (Double, Double, Double)): GeoDataFrame =
    copy(df = derived(st_transform_coords(geometry)(f)))

  // ---- coverage operations (ref base.py:378/450/5536) ----------------------

  /** Whether the geometry column forms a valid polygonal coverage. With
    * `by`, every group must be one (each group validated in a single
    * executor task, the [[simplifyCoverage]] shape). With no `by`, each
    * polygon is validated on executors against only its dwithin(gapWidth)
    * neighbours — candidate pairs come from the distributed spatial join, so
    * this is the same per-polygon check JTS CoverageValidator runs against
    * an in-memory STRtree, without the whole column ever landing on one
    * machine. */
  def isValidCoverage(gapWidth: Double = 0.0, by: Seq[String] = Nil): Boolean = {
    import graft.geom.{GeomOps, Wkb}
    val gw = gapWidth
    if (by.nonEmpty) {
      val vU = udf((gs: Seq[Array[Byte]]) => GeomOps.isValidCoverage(gs.map(Wkb.read), gw))
      df.filter(geometry.isNotNull)
        .groupBy(by.map(col): _*).agg(collect_list(geometry).as("__gs"))
        .filter(!vU(col("__gs"))).limit(1).count() == 0L
    } else {
      val base = df.select(geometry.as("geometry")).filter(col("geometry").isNotNull)
        .withColumn("__cid", monotonically_increasing_id()).localCheckpoint()
      val pairs = SpatialJoin.sjoinCore(
        base.withColumnRenamed("__cid", "__tid"),
        base.withColumnRenamed("__cid", "__aid"),
        predicate = "dwithin", how = "inner",
        leftGeom = "geometry", rightGeom = "geometry", distance = gw)
      val vU = udf((g: Array[Byte], adj: Seq[Array[Byte]]) =>
        GeomOps.isValidCoveragePolygon(Wkb.read(g), adj.map(Wkb.read), gw))
      // self-pairs (dwithin is reflexive) keep isolated polygons in the
      // aggregate; when() maps them to null, which collect_list drops
      pairs.groupBy(col("__tid"))
        .agg(first(col("geometry")).as("__g"),
          collect_list(when(col("__aid") =!= col("__tid"), col("geometry_right"))).as("__adj"))
        .filter(!vU(col("__g"), col("__adj"))).limit(1).count() == 0L
    }
  }

  /** Coverage-preserving simplification: shared edges stay identical across
    * neighbours. Distributed by `by` groups (each group must be a coverage
    * and fit an executor — e.g. one admin region per group); rows keep their
    * non-geometry columns. */
  def simplifyCoverage(tolerance: Double, by: Seq[String] = Nil,
                       boundary: Boolean = true): GeoDataFrame = {
    import graft.geom.{GeomOps, Wkb}
    val idc = "__graft_cov_id"
    // ids are reused across the group plan and the re-attach join: pin them
    val withId = df.withColumn(idc, monotonically_increasing_id()).localCheckpoint()
    val tol = tolerance
    val inner = boundary
    val simU = udf((gs: Seq[Array[Byte]]) =>
      GeomOps.simplifyCoverage(gs.map(Wkb.read), tol, inner).map(Wkb.write))
    // array_sort on (id, geom) structs orders by id, keeping the two arrays
    // positionally aligned through the simplifier
    val arr = array_sort(collect_list(struct(col(idc).as("i"), geometry.as("g"))))
    val grouped =
      if (by.isEmpty) withId.groupBy(lit(0).as("__g")).agg(arr.as("__a")).drop("__g")
      else withId.groupBy(by.map(col): _*).agg(arr.as("__a"))
    // fully-qualified: the GeoDataFrame.transform method shadows functions.transform
    def fTransform(a: Column, f: Column => Column): Column =
      org.apache.spark.sql.functions.transform(a, f)
    val pairs = grouped
      .withColumn("__z", arrays_zip(fTransform(col("__a"), x => x.getField("i")).as("i"),
        simU(fTransform(col("__a"), x => x.getField("g"))).as("g")))
      .select(explode(col("__z")).as("__p"))
      .select(col("__p.i").as(idc), col("__p.g").as("__simplified"))
    val joined = withId.join(pairs, Seq(idc))
      .withColumn(geometryCol, col("__simplified")).drop(idc, "__simplified")
    copy(df = joined)
  }

  /** Hilbert-curve distance column (ref base.py:6345); also the engine's
    * spatial shuffle key: `.spatialPartition()` range-partitions on it. */
  def hilbertDistance(level: Int = 16): DataFrame = {
    val (x0, y0, x1, y1) = totalBounds
    df.withColumn("hilbert_distance",
      st_hilbert(geometry, lit(x0), lit(y0), lit(x1), lit(y1), lit(level)))
  }

  /** Locality-preserving repartition for downstream spatial ops at scale. */
  def spatialPartition(numPartitions: Int, level: Int = 12): GeoDataFrame = {
    val (x0, y0, x1, y1) = totalBounds
    copy(df = df.repartitionByRange(numPartitions,
      st_hilbert(geometry, lit(x0), lit(y0), lit(x1), lit(y1), lit(level))))
  }

  // ---- relational spatial ops ---------------------------------------------
  def sjoin(other: GeoDataFrame, predicate: String = "intersects", how: String = "inner",
            lsuffix: String = "left", rsuffix: String = "right",
            distance: Double = 0.0, onAttribute: Seq[String] = Nil): GeoDataFrame = {
    checkCrs(other)
    val res = SpatialJoin.sjoin(df, other.df, predicate, how, geometryCol, other.geometryCol,
      lsuffix, rsuffix, distance, onAttribute)
    val keptGeom = if (how == "right") other.geometryCol else geometryCol
    GeoDataFrame(res, keptGeom, if (how == "right") other.crs else crs)
  }

  def sjoinNearest(other: GeoDataFrame, how: String = "inner",
                   maxDistance: Option[Double] = None, distanceCol: Option[String] = None,
                   exclusive: Boolean = false): GeoDataFrame = {
    checkCrs(other)
    val keptGeom = if (how == "right") other.geometryCol else geometryCol
    GeoDataFrame(SJoinNearest.sjoinNearest(df, other.df, how, geometryCol, other.geometryCol,
      maxDistance = maxDistance, distanceCol = distanceCol, exclusive = exclusive), keptGeom,
      if (how == "right") other.crs else crs)
  }

  def overlay(other: GeoDataFrame, how: String = "intersection", keepGeomType: Boolean = true): GeoDataFrame = {
    checkCrs(other)
    GeoDataFrame(Overlay.overlay(df, other.df, how, geometryCol, other.geometryCol, keepGeomType),
      geometryCol, crs)
  }

  def clip(mask: GeoDataFrame, keepGeomType: Boolean = false): GeoDataFrame =
    GeoDataFrame(Clip.clip(df, mask.df, geometryCol, mask.geometryCol, keepGeomType), geometryCol, crs)

  def clipByRect(xmin: Double, ymin: Double, xmax: Double, ymax: Double): GeoDataFrame =
    GeoDataFrame(Clip.clipByRect(df, xmin, ymin, xmax, ymax, geometryCol), geometryCol, crs)

  // ---- cross-frame aligned binary ops (ref base.py:27-87) ------------------

  /** Cross-frame element-wise binary op — the reference's index-aligned form
    * (`_delegate_binary_method`, base.py:27-71) re-expressed with an EXPLICIT
    * key, the Spark-native spelling of "align": rows pair by equality on
    * `on`, the op applies to the two active geometries, and keys present on
    * only one side behave like pandas' NaN-alignment (left rows with no
    * partner get a NULL result; unmatched right rows are dropped — use an
    * outer join directly for the symmetric form). Duplicate keys fan out
    * pairwise, exactly as duplicate index labels do in pandas. CRS equality
    * is enforced like every other cross-frame op (array.py:96-139).
    *
    * The equi-join broadcasts or shuffles on the key per Catalyst/AQE — at
    * 100 TB this is a plain hash join, never a row-position zip (Spark rows
    * are unordered; a positional align would need a global sort). */
  def alignedBinary(other: GeoDataFrame, on: Seq[String],
                    op: (Column, Column) => Column,
                    resultName: String = "result"): DataFrame = {
    require(on.nonEmpty, "alignedBinary needs at least one key column")
    checkCrs(other)
    val rhs = other.df.select((on.map(col) :+ other.geometry.as("__g_align")): _*)
    df.join(rhs, on, "left")
      .withColumn(resultName, op(geometry, col("__g_align")))
      .drop("__g_align")
  }

  /** Key-aligned distance (ref geoseries distance(align=True)). */
  def alignedDistance(other: GeoDataFrame, on: Seq[String]): DataFrame =
    alignedBinary(other, on, st_distance(_, _), "distance")

  /** Key-aligned intersects (ref binary predicate with align=True). */
  def alignedIntersects(other: GeoDataFrame, on: Seq[String]): DataFrame =
    alignedBinary(other, on, st_intersects(_, _), "intersects")

  /** Key-aligned geometric intersection (ref binary geo op, align=True). */
  def alignedIntersection(other: GeoDataFrame, on: Seq[String]): GeoDataFrame =
    copy(df = alignedBinary(other, on, st_intersection(_, _), "__g_new")
      .drop(geometryCol).withColumnRenamed("__g_new", geometryCol))

  private def checkCrs(other: GeoDataFrame): Unit = {
    (activeCrs, other.activeCrs) match {
      case (Some(a), Some(b)) =>
        (CrsTransform.normalizeOpt(a), CrsTransform.normalizeOpt(b)) match {
          case (Some(ca), Some(cb)) if ca != cb =>
            throw new IllegalArgumentException(s"CRS mismatch: $a vs $b (ref array.py:96-139)")
          case (Some(_), Some(_)) => ()
          case _ =>
            // WKT CRS with no recoverable EPSG code: comparable only textually
            if (a.trim != b.trim)
              org.slf4j.LoggerFactory.getLogger(classOf[GeoDataFrame]).warn(
                s"CRS strings differ and are not EPSG-comparable: '$a' vs '$b'")
        }
      case _ => ()
    }
  }

  // ---- missing-geometry surface (ref geoseries.py:817-995) -----------------

  /** Rows whose active geometry is missing (ref isna). */
  def isna: DataFrame = df.withColumn("isna", geometry.isNull)
  def notna: DataFrame = df.withColumn("notna", geometry.isNotNull)

  /** Fill missing geometries with a constant geometry (ref fillna — filling
    * with None/empty is the default there; pass empty WKB for parity). */
  def fillna(replacement: Array[Byte]): GeoDataFrame =
    copy(df = df.withColumn(geometryCol, coalesce(geometry, lit(replacement))))

  // ---- delegation ----------------------------------------------------------
  def select(cols: Column*): GeoDataFrame = copy(df = df.select(cols: _*))
  def filter(cond: Column): GeoDataFrame = copy(df = df.filter(cond))
  def withColumn(name: String, c: Column): GeoDataFrame = copy(df = df.withColumn(name, c))
  def drop(cols: String*): GeoDataFrame = copy(df = df.drop(cols: _*))
  def limit(n: Int): GeoDataFrame = copy(df = df.limit(n))
  def unionByName(other: GeoDataFrame): GeoDataFrame = {
    checkCrs(other)
    copy(df = df.unionByName(other.df, allowMissingColumns = true))
  }
  def count(): Long = df.count()
  def cache(): GeoDataFrame = { df.cache(); this }

  /** Write in the format inferred from the extension (ref
    * GeoDataFrame.to_file, io/file.py:614): .shp/.fgb/.geojson/.gpkg/.csv/
    * .kml/.gml/.gpx/.feather, else GeoParquet. `mode = "a"` appends to
    * GPKG / line-delimited GeoJSON / GeoParquet (ref mode="a"); other
    * formats raise loudly. */
  def toFile(path: String, mode: String = "w"): Unit =
    graft.io.GeoIO.toFile(this, path, mode)

  /** GeoParquet write (ref to_parquet, io/arrow.py). */
  def toParquet(path: String): Unit = graft.io.GeoParquet.write(this, path)
}

object GeoDataFrame {
  /** read_file entry point (ref io/file.py:197): format inferred from the
    * extension, with the reference's bbox/mask/columns/rows/where args. */
  def readFile(spark: org.apache.spark.sql.SparkSession, path: String,
               layer: Option[String] = None,
               bbox: Option[(Double, Double, Double, Double)] = None,
               mask: Option[Array[Byte]] = None,
               columns: Option[Seq[String]] = None,
               rows: Option[Int] = None,
               where: Option[String] = None): GeoDataFrame =
    graft.io.GeoIO.readFile(spark, path, layer, bbox, mask, columns, rows, where)

  /** points_from_xy constructor (ref array.py:293-343). */
  def pointsFromXy(df: DataFrame, x: String, y: String, geomName: String = "geometry",
                   crs: Option[String] = None): GeoDataFrame =
    GeoDataFrame(df.withColumn(geomName, st_point(col(x), col(y))), geomName,
      crs.map(c => Map(geomName -> c)).getOrElse(Map.empty))

  /** `onInvalid` (ref array.py:217-245): raise (the reference default) /
    * warn / ignore / fix. */
  def fromWkt(df: DataFrame, wktCol: String, geomName: String = "geometry",
              onInvalid: String = "raise"): GeoDataFrame = {
    requireOnInvalid(onInvalid)
    GeoDataFrame(df.withColumn(geomName, st_geomfromwkt(col(wktCol), onInvalid)), geomName)
  }

  def fromWkb(df: DataFrame, wkbCol: String, geomName: String = "geometry",
              onInvalid: String = "raise"): GeoDataFrame = {
    requireOnInvalid(onInvalid)
    GeoDataFrame(df.withColumn(geomName,
      graft.functions.GeoFunctions.st_geomfromwkb(col(wkbCol), onInvalid)), geomName)
  }

  private def requireOnInvalid(mode: String): Unit =
    require(Seq("raise", "warn", "ignore", "fix").contains(mode),
      s"onInvalid must be raise/warn/ignore/fix, got $mode")
}
