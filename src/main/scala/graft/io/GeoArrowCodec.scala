package graft.io

import graft.geom.Wkb
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.locationtech.jts.geom.{Coordinate, LinearRing}

/** GeoParquet 1.1 "geoarrow" geometry encodings ⇄ WKB (reference
  * `io/_geoarrow.py:264-543`; spec github.com/geoarrow/geoarrow — the
  * separated/struct representation GeoParquet uses):
  *
  *   point            struct<x,y>
  *   linestring       list<struct<x,y>>            multipoint  same shape
  *   polygon          list<list<struct<x,y>>>      multilinestring same
  *   multipolygon     list<list<list<struct<x,y>>>>
  *
  * Spark reads/writes these as ordinary nested parquet types, so each
  * conversion is a single column expression; the engine's internal
  * representation stays WKB everywhere else.
  */
private[io] object GeoArrowCodec {

  private def f = Wkb.factory
  private def coords(xs: Seq[Double], ys: Seq[Double]): Array[Coordinate] =
    xs.zip(ys).map { case (x, y) => new Coordinate(x, y) }.toArray
  private def ring(xs: Seq[Double], ys: Seq[Double]): LinearRing = {
    val arr = coords(xs, ys)
    f.createLinearRing(if (arr.nonEmpty && !arr.head.equals2D(arr.last)) arr :+ arr.head.copy() else arr)
  }
  private def poly(xss: Seq[Seq[Double]], yss: Seq[Seq[Double]]) =
    if (xss.isEmpty) f.createPolygon()
    else f.createPolygon(ring(xss.head, yss.head),
      xss.tail.zip(yss.tail).map { case (xs, ys) => ring(xs, ys) }.toArray)

  /** Decode a geoarrow-encoded column to WKB. Spark UDFs cannot take
    * struct-row inputs, so the nested struct<x,y> shapes are first split
    * into parallel coordinate arrays with Catalyst `transform` (stays in
    * codegen) and the UDF sees only primitive nested Seqs. */
  def toWkb(encoding: String, col: Column): Column = {
    import org.apache.spark.sql.functions.{transform => tf}
    def xy1(c: Column) = (tf(c, s => s.getField("x")), tf(c, s => s.getField("y")))
    def xy2(c: Column) = (tf(c, r => tf(r, s => s.getField("x"))),
                          tf(c, r => tf(r, s => s.getField("y"))))
    def xy3(c: Column) = (tf(c, p => tf(p, r => tf(r, s => s.getField("x")))),
                          tf(c, p => tf(p, r => tf(r, s => s.getField("y")))))
    encoding.toLowerCase match {
      case "point" =>
        graft.functions.GeoFunctions.st_point(col.getField("x"), col.getField("y"))
      case "linestring" =>
        val (xs, ys) = xy1(col)
        udf((x: Seq[Double], y: Seq[Double]) => if (x == null) null
          else Wkb.write(f.createLineString(coords(x, y)))).apply(xs, ys)
      case "multipoint" =>
        val (xs, ys) = xy1(col)
        udf((x: Seq[Double], y: Seq[Double]) => if (x == null) null
          else Wkb.write(f.createMultiPointFromCoords(coords(x, y)))).apply(xs, ys)
      case "polygon" =>
        val (xs, ys) = xy2(col)
        udf((x: Seq[Seq[Double]], y: Seq[Seq[Double]]) => if (x == null) null
          else Wkb.write(poly(x, y))).apply(xs, ys)
      case "multilinestring" =>
        val (xs, ys) = xy2(col)
        udf((x: Seq[Seq[Double]], y: Seq[Seq[Double]]) => if (x == null) null
          else Wkb.write(f.createMultiLineString(
            x.zip(y).map { case (a, b) => f.createLineString(coords(a, b)) }.toArray))).apply(xs, ys)
      case "multipolygon" =>
        val (xs, ys) = xy3(col)
        udf((x: Seq[Seq[Seq[Double]]], y: Seq[Seq[Seq[Double]]]) => if (x == null) null
          else Wkb.write(f.createMultiPolygon(
            x.zip(y).map { case (a, b) => poly(a, b) }.toArray))).apply(xs, ys)
      case other => throw new UnsupportedOperationException(
        s"geoarrow encoding '$other' not supported (point/linestring/polygon/multi*)")
    }
  }

  // encoder-friendly coordinate struct: field names x/y per the geoarrow spec
  case class Pt(x: Double, y: Double)
  private def pts(g: org.locationtech.jts.geom.Geometry): Seq[Pt] =
    g.getCoordinates.toSeq.map(cc => Pt(cc.x, cc.y))
  private def polyRings(p: org.locationtech.jts.geom.Polygon): Seq[Seq[Pt]] =
    (Seq(p.getExteriorRing) ++ (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
      .map(r => r.getCoordinates.toSeq.map(cc => Pt(cc.x, cc.y)))

  /** Encode a WKB column into the given geoarrow encoding; every geometry
    * must be of the matching type (the caller validates homogeneity). */
  def fromWkb(encoding: String, col: Column): Column = encoding.toLowerCase match {
    case "point" =>
      udf((b: Array[Byte]) => if (b == null) null else { val g = Wkb.read(b); Pt(g.getCoordinate.x, g.getCoordinate.y) }).apply(col)
    case "linestring" | "multipoint" =>
      udf((b: Array[Byte]) => if (b == null) null else pts(Wkb.read(b))).apply(col)
    case "polygon" =>
      udf((b: Array[Byte]) => if (b == null) null
        else polyRings(Wkb.read(b).asInstanceOf[org.locationtech.jts.geom.Polygon])).apply(col)
    case "multilinestring" =>
      udf((b: Array[Byte]) => if (b == null) null
        else { val g = Wkb.read(b)
          (0 until g.getNumGeometries).map(i => pts(g.getGeometryN(i))) }).apply(col)
    case "multipolygon" =>
      udf((b: Array[Byte]) => if (b == null) null
        else { val g = Wkb.read(b)
          (0 until g.getNumGeometries).map(i =>
            polyRings(g.getGeometryN(i).asInstanceOf[org.locationtech.jts.geom.Polygon])) }).apply(col)
    case other => throw new UnsupportedOperationException(
      s"geoarrow encoding '$other' not supported (point/linestring/polygon/multi*)")
  }

  /** The geoarrow encoding name for a JTS geometry type, if supported. */
  def encodingFor(geometryType: String): Option[String] = geometryType match {
    case "Point" => Some("point")
    case "LineString" => Some("linestring")
    case "Polygon" => Some("polygon")
    case "MultiPoint" => Some("multipoint")
    case "MultiLineString" => Some("multilinestring")
    case "MultiPolygon" => Some("multipolygon")
    case _ => None
  }
}
