package graft.io

import graft.api.GeoDataFrame
import graft.geom.Wkb
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** GPX vector driver, mirroring GDAL's GPX driver layer model as the
  * reference reaches it through `read_file(layer=)` (ref io/file.py:197-339):
  * `waypoints` (points), `routes` (one LineString per rte), `tracks` (one
  * MultiLineString per trk), `route_points` and `track_points` (per-vertex
  * points carrying their parent fid/segment indices, GDAL column names).
  * GPX is always EPSG:4326 by spec; coordinates live in `lat`/`lon`
  * ATTRIBUTES (unlike KML/GML text nodes) with `ele` as a child element
  * mapped to Z.
  *
  * Scale posture: identical to the KML/GML drivers — per-FILE parallelism
  * via `binaryFiles`, each task STREAMING its document through StAX with one
  * feature in memory; driver-streamed single-file export plus a
  * per-partition distributed write.
  */
object Gpx {

  val Layers = Seq("waypoints", "routes", "tracks", "route_points", "track_points")

  def read(spark: SparkSession, path: String,
           layer: Option[String] = None,
           bbox: Option[(Double, Double, Double, Double)] = None,
           columns: Option[Seq[String]] = None,
           rows: Option[Int] = None,
           mask: Option[Array[Byte]] = None,
           where: Option[String] = None): GeoDataFrame = {
    val l = layer.getOrElse("waypoints")
    require(Layers.contains(l), s"GPX layer must be one of ${Layers.mkString(", ")}; got $l")
    IoFilters.pruneAndLimit(IoFilters.bboxOrMask(readCore(spark, path, l), bbox, mask),
      columns, rows, where)
  }

  private def readCore(spark: SparkSession, path: String, layer: String): GeoDataFrame = {
    val rdd = spark.sparkContext
      .binaryFiles(path, minPartitions = spark.sparkContext.defaultParallelism)
      .flatMap { case (_, pds) => featureIterator(pds.open(), layer) }
    val ds = spark.createDataset(rdd)(
      Encoders.tuple(Encoders.STRING, Encoders.BINARY)).toDF("__props", "geometry")
    val schema = spark.read.json(ds.select(col("__props")).as(Encoders.STRING)).schema
    val flat =
      if (schema.fields.isEmpty) ds.select(col("geometry"))
      else ds.withColumn("__p", from_json(col("__props"), schema))
        .select(col("__p.*"), col("geometry"))
    GeoDataFrame(flat, "geometry", Map("geometry" -> "EPSG:4326"))
  }

  // ---- StAX pull parse ----------------------------------------------------

  /** Child elements promoted to attribute columns (GDAL GPX field list). */
  private val AttrTags = Set("name", "cmt", "desc", "src", "sym", "type", "time", "number")
  private val NumTags = Set("ele") // typed double

  private[io] def featureIterator(in: java.io.InputStream,
                                  layer: String): Iterator[(String, Array[Byte])] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(in)
    val buf = collection.mutable.Queue.empty[(String, Array[Byte])]
    var trkFid = -1
    var rteFid = -1
    new Iterator[(String, Array[Byte])] {
      private var done = false
      private def advance(): Unit = {
        while (buf.isEmpty && !done) {
          if (!r.hasNext) { done = true; r.close(); in.close() }
          else r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "wpt" if layer == "waypoints" => buf ++= readWpt(r)
              case "trk" if layer == "tracks" || layer == "track_points" =>
                trkFid += 1; buf ++= readTrk(r, layer, trkFid)
              case "rte" if layer == "routes" || layer == "route_points" =>
                rteFid += 1; buf ++= readRte(r, layer, rteFid)
              case _ => ()
            }
            case _ => ()
          }
        }
      }
      def hasNext: Boolean = { advance(); buf.nonEmpty }
      def next(): (String, Array[Byte]) = { advance(); buf.dequeue() }
    }
  }

  /** Positioned on wpt/trkpt/rtept: lat/lon attributes; returns the coord
    * (Z from ele when present) plus the child attribute map. */
  private def readPt(r: XMLStreamReader): (Coordinate, Map[String, String]) = {
    val latS = r.getAttributeValue(null, "lat")
    val lonS = r.getAttributeValue(null, "lon")
    require(latS != null && lonS != null,
      s"malformed GPX: <${r.getLocalName}> without lat/lon attributes")
    val lat = latS.toDouble
    val lon = lonS.toDouble
    val props = collection.mutable.LinkedHashMap.empty[String, String]
    var ele = Double.NaN
    var depth = 1
    while (depth > 0 && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        val n = r.getLocalName
        if (n == "ele") ele = r.getElementText.trim.toDouble
        else if (AttrTags(n)) props(n) = r.getElementText
        else if (n == "extensions") props ++= readExtensions(r)
        else depth += 1
      case XMLStreamConstants.END_ELEMENT => depth -= 1
      case _ => ()
    }
    val c = if (ele.isNaN) new Coordinate(lon, lat) else new Coordinate(lon, lat, ele)
    if (!ele.isNaN) props("ele") = ele.toString
    (c, props.toMap)
  }

  private def readWpt(r: XMLStreamReader): Seq[(String, Array[Byte])] = {
    val (c, props) = readPt(r)
    Seq((toJson(props), Wkb.write(Wkb.factory.createPoint(c))))
  }

  /** trk → MultiLineString of its trkseg runs (tracks layer) or per-vertex
    * points with GDAL's track_fid/track_seg_id/track_seg_point_id. */
  private def readTrk(r: XMLStreamReader, layer: String, fid: Int): Seq[(String, Array[Byte])] = {
    val fac = Wkb.factory
    val props = collection.mutable.LinkedHashMap.empty[String, String]
    val segs = collection.mutable.ArrayBuffer.empty[Array[(Coordinate, Map[String, String])]]
    var depth = 1
    while (depth > 0 && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "trkseg" =>
          val pts = collection.mutable.ArrayBuffer.empty[(Coordinate, Map[String, String])]
          var sdepth = 1
          while (sdepth > 0 && r.hasNext) r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              if (r.getLocalName == "trkpt") pts += readPt(r) else sdepth += 1
            case XMLStreamConstants.END_ELEMENT => sdepth -= 1
            case _ => ()
          }
          segs += pts.toArray
        case n if AttrTags(n) => props(n) = r.getElementText
        case "extensions"     => props ++= readExtensions(r)
        case _ => depth += 1
      }
      case XMLStreamConstants.END_ELEMENT => depth -= 1
      case _ => ()
    }
    if (layer == "tracks") {
      val lines = segs.filter(_.length >= 2)
        .map(s => fac.createLineString(s.map(_._1))).toArray
      Seq((toJson(props), Wkb.write(fac.createMultiLineString(lines))))
    } else
      segs.zipWithIndex.flatMap { case (seg, si) =>
        seg.zipWithIndex.map { case ((c, p), pi) =>
          val m = p ++ Map("track_fid" -> fid.toString, "track_seg_id" -> si.toString,
            "track_seg_point_id" -> pi.toString)
          (toJson(collection.mutable.LinkedHashMap(m.toSeq: _*), intKeys = IdCols),
            Wkb.write(fac.createPoint(c)))
        }
      }.toSeq
  }

  /** rte → LineString of its rtept run (routes layer) or per-vertex points
    * with route_fid/route_point_id. */
  private def readRte(r: XMLStreamReader, layer: String, fid: Int): Seq[(String, Array[Byte])] = {
    val fac = Wkb.factory
    val props = collection.mutable.LinkedHashMap.empty[String, String]
    val pts = collection.mutable.ArrayBuffer.empty[(Coordinate, Map[String, String])]
    var depth = 1
    while (depth > 0 && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "rtept"          => pts += readPt(r)
        case n if AttrTags(n) => props(n) = r.getElementText
        case "extensions"     => props ++= readExtensions(r)
        case _                => depth += 1
      }
      case XMLStreamConstants.END_ELEMENT => depth -= 1
      case _ => ()
    }
    if (layer == "routes")
      Seq((toJson(props), Wkb.write(fac.createLineString(pts.map(_._1).toArray))))
    else
      pts.zipWithIndex.map { case ((c, p), pi) =>
        val m = p ++ Map("route_fid" -> fid.toString, "route_point_id" -> pi.toString)
        (toJson(collection.mutable.LinkedHashMap(m.toSeq: _*), intKeys = IdCols),
          Wkb.write(fac.createPoint(c)))
      }.toSeq
  }

  private val IdCols = Set("track_fid", "track_seg_id", "track_seg_point_id",
    "route_fid", "route_point_id")

  /** GDAL's GPX_USE_EXTENSIONS surface: arbitrary columns round-trip inside
    * `<extensions>` as namespaced child elements. Positioned on extensions;
    * consumes through its end, returning (localName → text). */
  private def readExtensions(r: XMLStreamReader): Seq[(String, String)] = {
    val out = collection.mutable.ArrayBuffer.empty[(String, String)]
    var open = true
    while (open && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        val name = r.getLocalName
        val sb = new StringBuilder
        var d = 1
        while (d > 0 && r.hasNext) r.next() match {
          case XMLStreamConstants.START_ELEMENT => d += 1
          case XMLStreamConstants.END_ELEMENT   => d -= 1
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (d == 1) sb ++= r.getText
          case _ => ()
        }
        out += (name -> sb.result().trim)
      case XMLStreamConstants.END_ELEMENT => open = false // </extensions>
      case _ => ()
    }
    out.toSeq
  }

  private def toJson(props: collection.mutable.LinkedHashMap[String, String],
                     intKeys: Set[String] = Set.empty): String =
    props.map { case (k, v) =>
      val rendered =
        if (intKeys(k)) v
        else if (k == "ele") v // typed double
        else IoFilters.jsonString(v)
      IoFilters.jsonString(k) + ":" + rendered
    }.mkString("{", ",", "}")

  private def toJson(props: Map[String, String]): String =
    toJson(collection.mutable.LinkedHashMap(props.toSeq: _*))

  // ---- write --------------------------------------------------------------

  private def xmlEscape(s: String): String = s.flatMap {
    case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
    case '"' => "&quot;"; case c => c.toString
  }

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  /** Point rows → wpt elements; LineString rows → rte elements (one rtept
    * per vertex) and MultiLineString rows → trk elements (one trkseg per
    * part) — the same geometry→layer mapping as GDAL's GPX writer, so
    * LineStrings round-trip through the `routes` layer and MultiLineStrings
    * through `tracks`. Attribute columns whose names are GPX child tags are
    * emitted as such; any OTHER column rides in `<extensions>` (GDAL's
    * GPX_USE_EXTENSIONS surface) so arbitrary frames round-trip. */
  /** GPX 1.1 xsd child order, one canonical sequence consistent with BOTH
    * wptType (… time … name cmt desc src … sym type …) and rte/trkType
    * (name cmt desc src … number type …) — frame column order must not leak
    * into the document or strict validators reject it. */
  private val TagOrder: Map[String, Int] =
    Seq("time", "name", "cmt", "desc", "src", "sym", "number", "type").zipWithIndex.toMap

  private[io] def rowXml(g: Geometry, attrs: Seq[(String, String)]): String = {
    val known = attrs.collect {
      case (k, v) if AttrTags(k) && v != null => k -> s"<$k>${xmlEscape(v)}</$k>"
    }.sortBy(kv => TagOrder.getOrElse(kv._1, Int.MaxValue)).map(_._2).mkString
    val extra = attrs.collect {
      case (k, v) if !AttrTags(k) && k != "ele" && v != null =>
        val kn = Gml.xmlName(k)
        s"<ogr:$kn>${xmlEscape(v)}</ogr:$kn>"
    }.mkString
    val children = known + (if (extra.isEmpty) "" else s"<extensions>$extra</extensions>")
    def ptAttrs(c: Coordinate): String =
      s"""lat="${fmt(c.y)}" lon="${fmt(c.x)}""""
    def eleChild(c: Coordinate): String =
      if (java.lang.Double.isNaN(c.getZ)) "" else s"<ele>${fmt(c.getZ)}</ele>"
    g match {
      case p: Point =>
        s"<wpt ${ptAttrs(p.getCoordinate)}>${eleChild(p.getCoordinate)}$children</wpt>"
      case l: LineString =>
        val seg = l.getCoordinates.map(c => s"<rtept ${ptAttrs(c)}>${eleChild(c)}</rtept>").mkString
        s"<rte>$children$seg</rte>"
      case ml: MultiLineString =>
        val segs = (0 until ml.getNumGeometries).map { i =>
          val seg = ml.getGeometryN(i).getCoordinates
            .map(c => s"<trkpt ${ptAttrs(c)}>${eleChild(c)}</trkpt>").mkString
          s"<trkseg>$seg</trkseg>"
        }.mkString
        s"<trk>$children$segs</trk>"
      case other => throw new UnsupportedOperationException(
        s"GPX stores points and line tracks; got ${other.getGeometryType} " +
          "(polygons have no GPX representation — use GeoJSON/GeoParquet)")
    }
  }

  private def featureLines(gdf: GeoDataFrame): DataFrame = {
    val g = gdf.geometryCol
    val attrNames = gdf.df.schema.fields.map(_.name).filter(_ != g).toSeq
    val render = udf((b: Array[Byte], attrs: Map[String, String]) =>
      if (b == null) "" else rowXml(Wkb.read(b), attrNames.map(n => n -> attrs.getOrElse(n, null))))
    val attrMap = map(attrNames.flatMap(n => Seq(lit(n), col(n).cast("string"))): _*)
    gdf.df.select(render(col(g), attrMap).as("value"))
  }

  private val documentHeader: String =
    """<?xml version="1.0" encoding="UTF-8"?>""" + "\n" +
      """<gpx version="1.1" creator="graft" xmlns="http://www.topografix.com/GPX/1/1" xmlns:ogr="http://osgeo.org/gdal">""" + "\n"

  private val documentFooter = "</gpx>\n"

  /** Single-document export; rows stream through the driver one partition
    * at a time. */
  def write(gdf: GeoDataFrame, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(gdf.df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
    try {
      out.write(documentHeader.getBytes("UTF-8"))
      val it = featureLines(gdf).toLocalIterator()
      while (it.hasNext) {
        val s = it.next().getString(0)
        if (s.nonEmpty) { out.write(s.getBytes("UTF-8")); out.write('\n') }
      }
      out.write(documentFooter.getBytes("UTF-8"))
    } finally out.close()
  }

  /** Distributed write — one complete GPX document per partition. */
  def writePartitioned(gdf: GeoDataFrame, dir: String): Unit = {
    val spark = gdf.df.sparkSession
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fsDir = new org.apache.hadoop.fs.Path(dir)
    fsDir.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(fsDir)
    val header = documentHeader
    featureLines(gdf).rdd.mapPartitionsWithIndex { (pi, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val p = new org.apache.hadoop.fs.Path(f"$dir%s/part-$pi%05d.gpx")
        val fs = p.getFileSystem(serConf.value)
        val out = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
        try {
          out.write(header.getBytes("UTF-8"))
          it.foreach { row =>
            val s = row.getString(0)
            if (s.nonEmpty) { out.write(s.getBytes("UTF-8")); out.write('\n') }
          }
          out.write(documentFooter.getBytes("UTF-8"))
        } finally out.close()
        Iterator.single(1)
      }
    }.count()
  }
}
