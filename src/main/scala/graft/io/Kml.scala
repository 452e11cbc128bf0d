package graft.io

import graft.api.GeoDataFrame
import graft.geom.Wkb
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** KML vector driver, mirroring GDAL's LIBKML driver as the reference
  * reaches it through `read_file`/`to_file` (ref io/file.py:197-339).
  * Placemark name/description and `ExtendedData` (both `Data`/`value`
  * pairs and typed `Schema`/`SimpleData`) become attribute columns; all
  * KML geometry families (Point, LineString, LinearRing, Polygon with
  * holes, nested MultiGeometry) map to JTS. KML is always EPSG:4326 by
  * spec.
  *
  * Scale posture: a KML document is one XML tree — not splittable — so
  * parallelism is per FILE (`binaryFiles`, same as the GeoJSON
  * FeatureCollection path): each task STREAMS its document through a StAX
  * pull parser holding one placemark in memory, never the document. The
  * single-`.kml` export streams through the driver partition-by-partition;
  * the distributed write emits one document per partition.
  */
object Kml {

  def read(spark: SparkSession, path: String,
           bbox: Option[(Double, Double, Double, Double)] = None,
           columns: Option[Seq[String]] = None,
           rows: Option[Int] = None,
           mask: Option[Array[Byte]] = None,
           where: Option[String] = None): GeoDataFrame =
    IoFilters.pruneAndLimit(IoFilters.bboxOrMask(readCore(spark, path), bbox, mask),
      columns, rows, where)

  private def readCore(spark: SparkSession, path: String): GeoDataFrame = {
    val rdd = spark.sparkContext
      .binaryFiles(path, minPartitions = spark.sparkContext.defaultParallelism)
      .flatMap { case (_, pds) => placemarkIterator(pds.open()) }
    val ds = spark.createDataset(rdd)(
      Encoders.tuple(Encoders.STRING, Encoders.BINARY)).toDF("__props", "geometry")
    // properties arrive as per-row JSON (typed by Schema declarations when
    // the document carries them); infer the union schema once, then flatten
    // in the same plan — identical shape to the GeoJSON reader
    val schema = spark.read.json(ds.select(col("__props")).as(Encoders.STRING)).schema
    val flat =
      if (schema.fields.isEmpty) ds.select(col("geometry"))
      else ds.withColumn("__p", from_json(col("__props"), schema))
        .select(col("__p.*"), col("geometry"))
    GeoDataFrame(flat, "geometry", Map("geometry" -> "EPSG:4326"))
  }

  // ---- StAX pull parse: one placemark at a time ---------------------------

  /** (propsJson, wkb) per Placemark. Streams; never holds the document. */
  private[io] def placemarkIterator(in: java.io.InputStream): Iterator[(String, Array[Byte])] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(in)
    // Schema/SimpleField declarations type the SimpleData values (GDAL
    // LIBKML behavior); Data/value pairs stay strings
    val fieldTypes = collection.mutable.Map.empty[String, String]
    new Iterator[(String, Array[Byte])] {
      private var nextRow: (String, Array[Byte]) = null
      private var done = false
      private def advance(): Unit = {
        while (nextRow == null && !done) {
          if (!r.hasNext) { done = true; r.close(); in.close() }
          else r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "SimpleField" =>
                val n = Option(r.getAttributeValue(null, "name"))
                val t = Option(r.getAttributeValue(null, "type"))
                for (nn <- n; tt <- t) fieldTypes(nn) = tt
              case "Placemark" => nextRow = readPlacemark(r, fieldTypes.toMap)
              case _ => ()
            }
            case _ => ()
          }
        }
      }
      def hasNext: Boolean = { advance(); nextRow != null }
      def next(): (String, Array[Byte]) = {
        advance(); val v = nextRow; nextRow = null; v
      }
    }
  }

  /** Reader is positioned ON the Placemark start element; consumes through
    * its matching end. */
  private def readPlacemark(r: XMLStreamReader, fieldTypes: Map[String, String]): (String, Array[Byte]) = {
    val props = collection.mutable.LinkedHashMap.empty[String, String]
    var geom: Geometry = null
    var depth = 1
    while (depth > 0 && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        r.getLocalName match {
          case "name"        => props("name") = r.getElementText
          case "description" => props("description") = r.getElementText
          case "Data" =>
            val n = Option(r.getAttributeValue(null, "name")).getOrElse("")
            props(n) = readDataValue(r)
          case "SimpleData" =>
            val n = Option(r.getAttributeValue(null, "name")).getOrElse("")
            props(n) = r.getElementText
          case "Point" | "LineString" | "LinearRing" | "Polygon" | "MultiGeometry" =>
            geom = readGeometry(r, r.getLocalName)
          case _ => depth += 1
        }
      case XMLStreamConstants.END_ELEMENT => depth -= 1
      case _ => ()
    }
    (propsToJson(props, fieldTypes), if (geom == null) null else Wkb.write(geom))
  }

  /** `Data` wraps its text in a `value` child. Positioned on Data; consumes
    * through its end. */
  private def readDataValue(r: XMLStreamReader): String = {
    var v = ""
    var depth = 1
    while (depth > 0 && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        if (r.getLocalName == "value") v = r.getElementText else depth += 1
      case XMLStreamConstants.END_ELEMENT => depth -= 1
      case _ => ()
    }
    v
  }

  private def propsToJson(props: collection.mutable.LinkedHashMap[String, String],
                          fieldTypes: Map[String, String]): String = {
    def numericOk(s: String): Boolean =
      s.nonEmpty && s.matches("[-+]?(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?")
    val parts = props.map { case (k, v) =>
      val rendered = fieldTypes.get(k) match {
        case Some("int") | Some("uint") | Some("short") | Some("ushort") if numericOk(v) => v
        case Some("float") | Some("double") if numericOk(v) =>
          if (v.contains('.') || v.contains('e') || v.contains('E')) v else v + ".0"
        case Some("bool") if v == "true" || v == "false" => v
        case _ => IoFilters.jsonString(v)
      }
      IoFilters.jsonString(k) + ":" + rendered
    }
    parts.mkString("{", ",", "}")
  }

  // ---- KML geometry ⇄ JTS -------------------------------------------------

  /** Positioned on the geometry start element `tag`; consumes through its
    * end and returns the JTS geometry. */
  private def readGeometry(r: XMLStreamReader, tag: String): Geometry = {
    val fac = Wkb.factory
    tag match {
      case "Point"      => fac.createPoint(readCoordinates(r).headOption.orNull)
      case "LineString" => fac.createLineString(readCoordinates(r).toArray)
      case "LinearRing" => fac.createLinearRing(closeRing(readCoordinates(r)).toArray)
      case "Polygon" =>
        var outer: LinearRing = null
        val holes = collection.mutable.ArrayBuffer.empty[LinearRing]
        var depth = 1
        var inOuter = false
        while (depth > 0 && r.hasNext) r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "outerBoundaryIs" => inOuter = true; depth += 1
            case "innerBoundaryIs" => inOuter = false; depth += 1
            case "LinearRing" =>
              val ring = fac.createLinearRing(closeRing(readCoordinates(r)).toArray)
              if (outer == null && inOuter) outer = ring else holes += ring
            case _ => depth += 1
          }
          case XMLStreamConstants.END_ELEMENT => depth -= 1
          case _ => ()
        }
        fac.createPolygon(outer, holes.toArray)
      case "MultiGeometry" =>
        val parts = collection.mutable.ArrayBuffer.empty[Geometry]
        var depth = 1
        while (depth > 0 && r.hasNext) r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case t @ ("Point" | "LineString" | "LinearRing" | "Polygon" | "MultiGeometry") =>
              parts += readGeometry(r, t)
            case _ => depth += 1
          }
          case XMLStreamConstants.END_ELEMENT => depth -= 1
          case _ => ()
        }
        // homogeneous members collapse to the typed Multi*, like GDAL
        val ps = parts.toArray
        if (ps.nonEmpty && ps.forall(_.isInstanceOf[Point]))
          fac.createMultiPoint(ps.map(_.asInstanceOf[Point]))
        else if (ps.nonEmpty && ps.forall(_.isInstanceOf[LineString]))
          fac.createMultiLineString(ps.map(_.asInstanceOf[LineString]))
        else if (ps.nonEmpty && ps.forall(_.isInstanceOf[Polygon]))
          fac.createMultiPolygon(ps.map(_.asInstanceOf[Polygon]))
        else fac.createGeometryCollection(ps)
    }
  }

  /** Consumes through the end of the CURRENT element, returning the coords
    * from its `coordinates` child: "lon,lat[,alt]" whitespace-separated. */
  private def readCoordinates(r: XMLStreamReader): Seq[Coordinate] = {
    var text = ""
    var depth = 1
    while (depth > 0 && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        if (r.getLocalName == "coordinates") text = r.getElementText else depth += 1
      case XMLStreamConstants.END_ELEMENT => depth -= 1
      case _ => ()
    }
    text.trim.split("\\s+").toSeq.filter(_.nonEmpty).map { tok =>
      val p = tok.split(",")
      if (p.length >= 3) new Coordinate(p(0).toDouble, p(1).toDouble, p(2).toDouble)
      else new Coordinate(p(0).toDouble, p(1).toDouble)
    }
  }

  private def closeRing(cs: Seq[Coordinate]): Seq[Coordinate] =
    if (cs.length >= 3 && cs.head.equals2D(cs.last)) cs
    else if (cs.length >= 3) cs :+ cs.head.copy()
    else cs

  // ---- write --------------------------------------------------------------

  private def xmlEscape(s: String): String = s.flatMap {
    case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
    case '"' => "&quot;"; case c => c.toString
  }

  private[io] def geomToKml(g: Geometry): String = g match {
    case p: Point      => s"<Point><coordinates>${coordText(p.getCoordinates)}</coordinates></Point>"
    case r: LinearRing => s"<LinearRing><coordinates>${coordText(r.getCoordinates)}</coordinates></LinearRing>"
    case l: LineString => s"<LineString><coordinates>${coordText(l.getCoordinates)}</coordinates></LineString>"
    case p: Polygon =>
      val outer = s"<outerBoundaryIs><LinearRing><coordinates>${coordText(p.getExteriorRing.getCoordinates)}</coordinates></LinearRing></outerBoundaryIs>"
      val holes = (0 until p.getNumInteriorRing).map(i =>
        s"<innerBoundaryIs><LinearRing><coordinates>${coordText(p.getInteriorRingN(i).getCoordinates)}</coordinates></LinearRing></innerBoundaryIs>").mkString
      s"<Polygon>$outer$holes</Polygon>"
    case gc: GeometryCollection =>
      val parts = (0 until gc.getNumGeometries).map(i => geomToKml(gc.getGeometryN(i))).mkString
      s"<MultiGeometry>$parts</MultiGeometry>"
  }

  private def coordText(cs: Array[Coordinate]): String = cs.map { c =>
    val base = fmt(c.x) + "," + fmt(c.y)
    if (java.lang.Double.isNaN(c.getZ)) base else base + "," + fmt(c.getZ)
  }.mkString(" ")

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  /** Typed Schema declaration (GDAL LIBKML form) so a round-trip read
    * restores long/double/bool columns. */
  private def kmlFieldType(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => "int"
    case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType => "double"
    case org.apache.spark.sql.types.BooleanType => "bool"
    case _ => "string"
  }

  /** One `<Placemark>` XML string per row, rendered on executors. */
  private def placemarkLines(gdf: GeoDataFrame): DataFrame = {
    val g = gdf.geometryCol
    val attrs = gdf.df.schema.fields.filter(_.name != g)
    val renderGeom = udf((b: Array[Byte]) =>
      if (b == null) "" else geomToKml(Wkb.read(b)))
    val attrXml = attrs.map { f =>
      val nameEsc = xmlEscape(f.name)
      when(col(f.name).isNull, lit(""))
        .otherwise(concat(lit(s"""<SimpleData name="$nameEsc">"""),
          // XML text escape of the value
          regexp_replace(regexp_replace(regexp_replace(col(f.name).cast("string"),
            "&", "&amp;"), "<", "&lt;"), ">", "&gt;"),
          lit("</SimpleData>")))
    }
    val extended =
      if (attrs.isEmpty) lit("")
      else concat(lit("""<ExtendedData><SchemaData schemaUrl="#s">"""),
        concat(attrXml: _*), lit("</SchemaData></ExtendedData>"))
    gdf.df.select(concat(lit("<Placemark>"), extended,
      renderGeom(col(g)), lit("</Placemark>")).as("value"))
  }

  private def documentHeader(gdf: GeoDataFrame): String = {
    val g = gdf.geometryCol
    val fields = gdf.df.schema.fields.filter(_.name != g).map(f =>
      s"""<SimpleField name="${xmlEscape(f.name)}" type="${kmlFieldType(f.dataType)}"/>""").mkString
    """<?xml version="1.0" encoding="UTF-8"?>""" + "\n" +
      """<kml xmlns="http://www.opengis.net/kml/2.2"><Document>""" + "\n" +
      s"""<Schema name="s" id="s">$fields</Schema>""" + "\n"
  }

  private val documentFooter = "</Document></kml>\n"

  /** Single-document export; rows stream through the driver one partition
    * at a time (toLocalIterator), never all at once. */
  def write(gdf: GeoDataFrame, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(gdf.df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
    try {
      out.write(documentHeader(gdf).getBytes("UTF-8"))
      val it = placemarkLines(gdf).toLocalIterator()
      while (it.hasNext) { out.write(it.next().getString(0).getBytes("UTF-8")); out.write('\n') }
      out.write(documentFooter.getBytes("UTF-8"))
    } finally out.close()
  }

  /** Distributed write — one complete KML document per partition written
    * directly from executors, no driver involvement (same shape as
    * `Shapefile.writePartitioned`). */
  def writePartitioned(gdf: GeoDataFrame, dir: String): Unit = {
    val spark = gdf.df.sparkSession
    val header = documentHeader(gdf)
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fsDir = new org.apache.hadoop.fs.Path(dir)
    fsDir.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(fsDir)
    placemarkLines(gdf).rdd.mapPartitionsWithIndex { (pi, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val p = new org.apache.hadoop.fs.Path(f"$dir%s/part-$pi%05d.kml")
        val fs = p.getFileSystem(serConf.value)
        val out = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
        try {
          out.write(header.getBytes("UTF-8"))
          it.foreach { row => out.write(row.getString(0).getBytes("UTF-8")); out.write('\n') }
          out.write(documentFooter.getBytes("UTF-8"))
        } finally out.close()
        Iterator.single(1)
      }
    }.count()
  }
}
