package graft.functions

import org.locationtech.jts.geom._
import graft.geom.Wkb

/** Minimal GeoJSON geometry writer/parser (RFC 7946). Reference surface:
  * `to_json`/`from_features` (`geodataframe.py:984-1218`). jts-core has no
  * GeoJSON IO, so this is hand-rolled; only geometry objects (not Feature
  * wrappers) plus a Feature/FeatureCollection parse helper.
  */
object GeoJson {
  private val gf = Wkb.factory

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  private def coord(c: Coordinate): String =
    if (!java.lang.Double.isNaN(c.getZ)) s"[${fmt(c.x)},${fmt(c.y)},${fmt(c.getZ)}]"
    else s"[${fmt(c.x)},${fmt(c.y)}]"

  private def ring(r: LineString): String = r.getCoordinates.map(coord).mkString("[", ",", "]")

  def write(g: Geometry): String = g match {
    case p: Point =>
      s"""{"type":"Point","coordinates":${if (p.isEmpty) "[]" else coord(p.getCoordinate)}}"""
    case l: LineString =>
      s"""{"type":"LineString","coordinates":${ring(l)}}"""
    case p: Polygon =>
      val rings = (Seq(p.getExteriorRing) ++ (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
        .map(ring).mkString("[", ",", "]")
      s"""{"type":"Polygon","coordinates":$rings}"""
    case m: MultiPoint =>
      val cs = (0 until m.getNumGeometries).map(i => coord(m.getGeometryN(i).getCoordinate)).mkString("[", ",", "]")
      s"""{"type":"MultiPoint","coordinates":$cs}"""
    case m: MultiLineString =>
      val ls = (0 until m.getNumGeometries).map(i => ring(m.getGeometryN(i).asInstanceOf[LineString])).mkString("[", ",", "]")
      s"""{"type":"MultiLineString","coordinates":$ls}"""
    case m: MultiPolygon =>
      val ps = (0 until m.getNumGeometries).map { i =>
        val p = m.getGeometryN(i).asInstanceOf[Polygon]
        (Seq(p.getExteriorRing) ++ (0 until p.getNumInteriorRing).map(p.getInteriorRingN)).map(ring).mkString("[", ",", "]")
      }.mkString("[", ",", "]")
      s"""{"type":"MultiPolygon","coordinates":$ps}"""
    case c: GeometryCollection =>
      val gs = (0 until c.getNumGeometries).map(i => write(c.getGeometryN(i))).mkString("[", ",", "]")
      s"""{"type":"GeometryCollection","geometries":$gs}"""
  }

  // -- parsing: tiny recursive-descent JSON reader (no external deps) -------
  private final class P(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { ws(); require(i < s.length && s.charAt(i) == c, s"expected '$c' at $i"); i += 1 }
    def peek: Char = { ws(); s.charAt(i) }
    def parseValue(): Any = {
      ws()
      peek match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => parseStr()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _   => parseNum()
      }
    }
    def parseObj(): Map[String, Any] = {
      expect('{'); ws()
      val m = scala.collection.mutable.Map[String, Any]()
      if (peek == '}') { i += 1; return m.toMap }
      var done = false
      while (!done) {
        val k = parseStr(); expect(':'); m(k) = parseValue(); ws()
        if (peek == ',') i += 1 else { expect('}'); done = true }
      }
      m.toMap
    }
    def parseArr(): Vector[Any] = {
      expect('['); ws()
      val b = Vector.newBuilder[Any]
      if (peek == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        b += parseValue(); ws()
        if (peek == ',') i += 1 else { expect(']'); done = true }
      }
      b.result()
    }
    def parseStr(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'b' => sb += '\b'; case 'f' => sb += '\f'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c   => sb += c
          }
        } else sb += s.charAt(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    def parseNum(): Double = {
      ws()
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      s.substring(start, i).toDouble
    }
  }

  def parseJson(s: String): Any = new P(s).parseValue()

  private def toCoord(v: Any): Coordinate = {
    val a = v.asInstanceOf[Vector[Any]].map(_.asInstanceOf[Double])
    if (a.length >= 3) new Coordinate(a(0), a(1), a(2)) else new Coordinate(a(0), a(1))
  }
  private def toCoords(v: Any): Array[Coordinate] =
    v.asInstanceOf[Vector[Any]].map(toCoord).toArray
  private def toPolygon(v: Any): Polygon = {
    val rings = v.asInstanceOf[Vector[Any]].map(r => gf.createLinearRing(toCoords(r)))
    if (rings.isEmpty) gf.createPolygon()
    else gf.createPolygon(rings.head, rings.tail.toArray)
  }

  def fromObj(o: Map[String, Any]): Geometry = {
    val typ = o("type").asInstanceOf[String]
    typ match {
      case "Point" =>
        val c = o("coordinates").asInstanceOf[Vector[Any]]
        if (c.isEmpty) gf.createPoint() else gf.createPoint(toCoord(c))
      case "LineString"      => gf.createLineString(toCoords(o("coordinates")))
      case "Polygon"         => toPolygon(o("coordinates"))
      case "MultiPoint"      => gf.createMultiPointFromCoords(toCoords(o("coordinates")))
      case "MultiLineString" =>
        gf.createMultiLineString(o("coordinates").asInstanceOf[Vector[Any]].map(l => gf.createLineString(toCoords(l))).toArray)
      case "MultiPolygon" =>
        gf.createMultiPolygon(o("coordinates").asInstanceOf[Vector[Any]].map(toPolygon).toArray)
      case "GeometryCollection" =>
        gf.createGeometryCollection(o("geometries").asInstanceOf[Vector[Any]].map(g => fromObj(g.asInstanceOf[Map[String, Any]])).toArray)
      case "Feature" => fromObj(o("geometry").asInstanceOf[Map[String, Any]])
      case other     => throw new IllegalArgumentException(s"unsupported GeoJSON type $other")
    }
  }

  def parse(s: String): Geometry = fromObj(parseJson(s).asInstanceOf[Map[String, Any]])
}
