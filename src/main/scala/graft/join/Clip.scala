package graft.join

import graft.functions.GeoFunctions._
import graft.geom.{GeomOps, Wkb}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Geometry

/** Clip a geometry DataFrame by a mask — reference `tools/clip.py:42-268`.
  * The mask (a small geometry set or a rectangle) is dissolved on the driver
  * and broadcast as a literal; the clip itself is a filter + per-row
  * intersection, embarrassingly parallel. Fast paths carried over from the
  * reference: 4-tuple rectangle masks use `clip_by_rect` (clip.py:67-99);
  * point inputs skip the exact intersection (clip.py:77-82).
  */
object Clip {

  /** Clip by an arbitrary mask DataFrame (its geometries are unioned first,
    * ref clip.py:214). */
  def clip(df: DataFrame, mask: DataFrame, geom: String = "geometry", maskGeom: String = "geometry",
           keepGeomType: Boolean = false): DataFrame = {
    val maskGeoms = mask.select(col(maskGeom)).na.drop().collect().map(_.getAs[Array[Byte]](0))
    if (maskGeoms.isEmpty) return df.limit(0)
    val unioned = GeomOps.unionAll(maskGeoms.map(Wkb.read).toSeq)
    clipByGeometry(df, unioned, geom, keepGeomType)
  }

  /** Clip by a rectangle — fast path, pure bbox math + clip_by_rect. */
  def clipByRect(df: DataFrame, xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                 geom: String = "geometry", keepGeomType: Boolean = false): DataFrame = {
    val filtered = df.filter(st_intersects(col(geom), lit(Wkb.write(GeomOps.makeBox(xmin, ymin, xmax, ymax)))))
    val clipped = filtered.withColumn(geom,
      when(stGeometryTypeU(col(geom)).isin("Point", "MultiPoint"), col(geom))
        .otherwise(st_clip_by_rect(col(geom), lit(xmin), lit(ymin), lit(xmax), lit(ymax))))
    finish(clipped, geom, keepGeomType)
  }

  def clipByGeometry(df: DataFrame, maskGeometry: Geometry, geom: String,
                     keepGeomType: Boolean): DataFrame = {
    val maskLit = lit(Wkb.write(maskGeometry))
    // bbox pre-filter (the st_intersects UDF already short-circuits on
    // envelopes via JTS, and the mask is a plan literal)
    val filtered = df.filter(st_intersects(col(geom), maskLit))
    val clipped = filtered.withColumn(geom,
      when(stGeometryTypeU(col(geom)).isin("Point", "MultiPoint"), col(geom))
        .otherwise(st_intersection(col(geom), maskLit)))
    finish(clipped, geom, keepGeomType)
  }

  private val keepTypeU = udf((b: Array[Byte], dim: Int) =>
    if (b == null) null else Wkb.write(GeomOps.collectionExtract(Wkb.read(b), dim)))
  private val dimU = udf((b: Array[Byte]) => if (b == null) None else Some(Wkb.read(b).getDimension))

  private def finish(clipped: DataFrame, geom: String, keepGeomType: Boolean): DataFrame = {
    val nonEmpty = clipped.filter(col(geom).isNotNull && !st_isempty(col(geom)))
    if (!keepGeomType) nonEmpty
    else {
      val dim = clipped.select(dimU(col(geom)).as("__d")).filter(col("__d").isNotNull)
        .limit(1).collect().headOption.map(_.getInt(0)).getOrElse(2)
      nonEmpty.withColumn(geom, keepTypeU(col(geom), lit(dim))).filter(!st_isempty(col(geom)))
    }
  }
}
