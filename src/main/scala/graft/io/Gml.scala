package graft.io

import graft.api.GeoDataFrame
import graft.geom.Wkb
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** GML vector driver, mirroring GDAL's GML driver as the reference reaches
  * it through `read_file`/`to_file` (ref io/file.py:197-339). Reads both
  * GML 2 (`coordinates`, `outerBoundaryIs`) and GML 3 (`pos`/`posList`,
  * `exterior`, `MultiCurve`/`MultiSurface`) geometry encodings inside any
  * `FeatureCollection`-shaped document; attribute types come from the GDAL
  * convention's companion `.xsd` when present, else strings. The writer
  * emits ogr-namespace GML 3 with `posList` plus the companion `.xsd`, so
  * a round trip restores long/double/bool columns — the same contract as
  * GDAL's writer pair.
  *
  * Scale posture: identical to the KML driver — a GML document is one XML
  * tree, so parallelism is per FILE (`binaryFiles`); each task STREAMS its
  * document through a StAX pull parser holding one feature in memory. The
  * single-document export streams through the driver partition-by-
  * partition; the distributed write emits one document per partition.
  */
object Gml {

  def read(spark: SparkSession, path: String,
           bbox: Option[(Double, Double, Double, Double)] = None,
           columns: Option[Seq[String]] = None,
           rows: Option[Int] = None,
           mask: Option[Array[Byte]] = None,
           where: Option[String] = None): GeoDataFrame =
    IoFilters.pruneAndLimit(IoFilters.bboxOrMask(readCore(spark, path), bbox, mask),
      columns, rows, where)

  private def readCore(spark: SparkSession, path: String): GeoDataFrame = {
    val fieldTypes = readXsdTypes(spark, path)
    val crs = sniffCrs(spark, path)
    val rdd = spark.sparkContext
      .binaryFiles(path, minPartitions = spark.sparkContext.defaultParallelism)
      .flatMap { case (_, pds) => featureIterator(pds.open(), fieldTypes) }
    val ds = spark.createDataset(rdd)(
      Encoders.tuple(Encoders.STRING, Encoders.BINARY)).toDF("__props", "geometry")
    val schema = spark.read.json(ds.select(col("__props")).as(Encoders.STRING)).schema
    val flat =
      if (schema.fields.isEmpty) ds.select(col("geometry"))
      else ds.withColumn("__p", from_json(col("__props"), schema))
        .select(col("__p.*"), col("geometry"))
    GeoDataFrame(flat, "geometry", Map("geometry" -> crs))
  }

  /** GDAL convention: `foo.gml` types live in `foo.xsd` next to it. Only
    * `xs:element name=... type=...` pairs are needed. */
  private def readXsdTypes(spark: SparkSession, path: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Resolve globs/directories first (same globStatus discipline as
    // sniffCrs): for `/dir/*.gml` the literal string rewrite would probe the
    // non-path `/dir/*.xsd` and silently fall back to all-string typing,
    // while the directory form found its schema — the two spellings must
    // see the same .xsd companions.
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val files = matched.flatMap(st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile) else Array(st))
    val gmls = files.map(_.getPath).sortBy(_.getName)
      .filter(_.getName.toLowerCase.endsWith(".gml"))
    val candidates =
      gmls.map(g => new org.apache.hadoop.fs.Path(g.getParent,
        g.getName.replaceAll("(?i)\\.gml$", "") + ".xsd")) ++
      (gmls.map(_.getParent).distinct ++
        matched.filter(_.isDirectory).map(_.getPath)).map(d =>
        new org.apache.hadoop.fs.Path(d, "schema.xsd")) ++
      Seq(new org.apache.hadoop.fs.Path(path.replaceAll("(?i)\\.gml$", "") + ".xsd"),
        new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "/schema.xsd"))
    // ALL existing companions are merged, not just the first name-sorted one:
    // with heterogeneous per-file schemas under a glob, single-pick silently
    // stamped one file's types on every file. Conflicts widen (int+double →
    // double, anything else → string) so no file's values can violate the
    // merged type and null rows in from_json.
    val existing = candidates.distinct
      .filter(c => try fs.exists(c) catch { case _: Throwable => false })
    def widen(a: String, b: String): String =
      if (a == b) a
      else if (Set(a, b) == Set("int", "double")) "double"
      else "string"
    existing.foldLeft(Map.empty[String, String]) { (acc, xsdPath) =>
      val in = fs.open(xsdPath)
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val el = """<xs:element[^>]*name="([^"]+)"[^>]*type="xs:(\w+)"""".r
      el.findAllMatchIn(text).foldLeft(acc) { (m0, m) =>
        val t = m.group(2) match {
          case "int" | "long" | "integer" | "short" | "byte" => "int"
          case "double" | "float" | "decimal"                => "double"
          case "boolean"                                     => "bool"
          case _                                             => "string"
        }
        m0.updated(m.group(1), m0.get(m.group(1)).map(widen(_, t)).getOrElse(t))
      }
    }
  }

  /** CRS from the first `srsName` in the document head (the writer stamps
    * every geometry; external docs stamp at least the envelope). */
  private def sniffCrs(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus handles plain files, directories, AND glob patterns
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val files = matched.flatMap(st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile) else Array(st))
    val first = files.map(_.getPath).sortBy(_.getName).headOption.getOrElse(p)
    val in = fs.open(first)
    val head = try {
      val buf = new Array[Byte](64 * 1024)
      val n = math.max(0, in.read(buf))
      new String(buf, 0, n, "UTF-8")
    } finally in.close()
    val srs = """srsName="[^"]*?(\d+)"""".r
    srs.findFirstMatchIn(head).map(m => "EPSG:" + m.group(1)).getOrElse("EPSG:4326")
  }

  // ---- StAX pull parse: one feature at a time -----------------------------

  private val GeomTags = Set("Point", "LineString", "LinearRing", "Curve",
    "Polygon", "Surface", "MultiPoint", "MultiLineString", "MultiCurve",
    "MultiPolygon", "MultiSurface", "MultiGeometry", "GeometryCollection")

  /** (propsJson, wkb) per feature member. Streams; never holds the doc. */
  private[io] def featureIterator(in: java.io.InputStream,
                                  fieldTypes: Map[String, String]): Iterator[(String, Array[Byte])] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(in)
    new Iterator[(String, Array[Byte])] {
      private var nextRow: (String, Array[Byte]) = null
      private var done = false
      // inside featureMembers (GML 3.1 inline collection) every child
      // element is a feature; inside featureMember/member exactly one is
      private var inMembers = false
      private var pendingMember = false
      private def advance(): Unit = {
        while (nextRow == null && !done) {
          if (!r.hasNext) { done = true; r.close(); in.close() }
          else r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              val n = r.getLocalName
              if (pendingMember) { pendingMember = false; nextRow = readFeature(r, fieldTypes) }
              else if (inMembers) nextRow = readFeature(r, fieldTypes)
              else if (n == "featureMember" || n == "member") pendingMember = true
              else if (n == "featureMembers") inMembers = true
            case XMLStreamConstants.END_ELEMENT =>
              if (r.getLocalName == "featureMembers") inMembers = false
              pendingMember = false
            case _ => ()
          }
        }
      }
      def hasNext: Boolean = { advance(); nextRow != null }
      def next(): (String, Array[Byte]) = { advance(); val v = nextRow; nextRow = null; v }
    }
  }

  /** Positioned ON the feature element; consumes through its end. Each child
    * is a property; a property whose subtree contains a GML geometry element
    * becomes the geometry column. */
  private def readFeature(r: XMLStreamReader, fieldTypes: Map[String, String]): (String, Array[Byte]) = {
    val props = collection.mutable.LinkedHashMap.empty[String, String]
    var geom: Geometry = null
    var depth = 1
    while (depth > 0 && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        val n = r.getLocalName
        if (GeomTags(n)) geom = readGeometry(r, n)
        else if (n == "boundedBy") skipSubtree(r)
        else {
          // a simple or geometry-bearing property element
          val sb = new StringBuilder
          var pdepth = 1
          var sawGeom = false
          while (pdepth > 0 && r.hasNext) r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              val cn = r.getLocalName
              if (GeomTags(cn)) { geom = readGeometry(r, cn); sawGeom = true }
              else pdepth += 1
            case XMLStreamConstants.END_ELEMENT => pdepth -= 1
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
              if (pdepth == 1) sb ++= r.getText
            case _ => ()
          }
          if (!sawGeom) props(n) = sb.result().trim
        }
      case XMLStreamConstants.END_ELEMENT => depth -= 1
      case _ => ()
    }
    (propsToJson(props, fieldTypes), if (geom == null) null else Wkb.write(geom))
  }

  private def skipSubtree(r: XMLStreamReader): Unit = {
    var depth = 1
    while (depth > 0 && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => depth += 1
      case XMLStreamConstants.END_ELEMENT   => depth -= 1
      case _                                => ()
    }
  }

  private def propsToJson(props: collection.mutable.LinkedHashMap[String, String],
                          fieldTypes: Map[String, String]): String = {
    // strict JSON-number grammar: an invalid number in rendered JSON nulls
    // out the WHOLE row in from_json
    def numericOk(s: String): Boolean =
      s.matches("-?(0|[1-9]\\d*)(\\.\\d+)?([eE][-+]?\\d+)?")
    // GDAL coerces tolerable spellings in xsd-numeric fields ('+5'→5,
    // '007'→7, '5.'→5, '.5'→0.5); quoting them instead would downgrade the
    // whole inferred column to string. Normalize first, quote only what
    // still fails the strict grammar.
    def normalizeNum(s: String): String = {
      var t = s.trim
      val neg = t.startsWith("-")
      if (t.startsWith("+") || t.startsWith("-")) t = t.substring(1)
      // a second sign ('+-5') is not a GDAL-tolerable spelling — return the
      // raw value so numericOk rejects it and it stays a quoted string
      if (t.startsWith("+") || t.startsWith("-")) return s
      t = t.replaceFirst("^0+(?=\\d)", "")
      if (t.startsWith(".")) t = "0" + t
      if (t.endsWith(".")) t = t.dropRight(1)
      (if (neg) "-" else "") + t
    }
    val parts = props.map { case (k, v) =>
      lazy val norm = normalizeNum(v)
      val rendered = fieldTypes.get(k) match {
        case Some("int") if numericOk(norm) => norm
        case Some("double") if numericOk(norm) =>
          if (norm.contains('.') || norm.contains('e') || norm.contains('E')) norm else norm + ".0"
        case Some("bool") if v == "true" || v == "false" => v
        case _ => IoFilters.jsonString(v)
      }
      IoFilters.jsonString(k) + ":" + rendered
    }
    parts.mkString("{", ",", "}")
  }

  // ---- GML geometry ⇄ JTS -------------------------------------------------

  /** Positioned on the geometry start element `tag`; consumes through its
    * end. Handles both GML 2 and GML 3 coordinate encodings. */
  private def readGeometry(r: XMLStreamReader, tag: String): Geometry = {
    val fac = Wkb.factory
    tag match {
      case "Point"      => fac.createPoint(readCoordsUntilEnd(r).headOption.orNull)
      case "LineString" | "Curve" => fac.createLineString(readCoordsUntilEnd(r).toArray)
      case "LinearRing" => fac.createLinearRing(closeRing(readCoordsUntilEnd(r)).toArray)
      case "Polygon" | "Surface" => readPolygon(r)
      case _            => readMulti(r, tag) // Multi* / GeometryCollection
    }
  }

  /** Collects `pos`/`posList`/`coordinates` content anywhere under the
    * current element (Curve segments concatenate). */
  private def readCoordsUntilEnd(r: XMLStreamReader): Seq[Coordinate] = {
    val out = collection.mutable.ArrayBuffer.empty[Coordinate]
    var depth = 1
    while (depth > 0 && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "pos" | "posList" =>
          val isPos = r.getLocalName == "pos"
          val attr = Option(r.getAttributeValue(null, "srsDimension")).map(_.toInt)
          val text = r.getElementText
          // a bare <gml:pos> holds exactly ONE coordinate, so its dimension
          // is its number count (GDAL reads it the same way); posList without
          // srsDimension stays 2-D per the GDAL default
          val dim = attr.getOrElse(
            if (isPos && text.trim.split("\\s+").count(_.nonEmpty) >= 3) 3 else 2)
          out ++= parsePosList(text, dim)
        case "coordinates" =>
          val cs = Option(r.getAttributeValue(null, "cs")).getOrElse(",")
          out ++= parseGml2Coordinates(r.getElementText, cs)
        case _ => depth += 1
      }
      case XMLStreamConstants.END_ELEMENT => depth -= 1
      case _ => ()
    }
    out.toSeq
  }

  /** GML 3: whitespace-separated doubles grouped by srsDimension. */
  private def parsePosList(text: String, dim: Int): Seq[Coordinate] = {
    val nums = text.trim.split("\\s+").filter(_.nonEmpty).map(_.toDouble)
    nums.grouped(dim).filter(_.length == dim).map { g =>
      if (dim >= 3) new Coordinate(g(0), g(1), g(2)) else new Coordinate(g(0), g(1))
    }.toSeq
  }

  /** GML 2: tuples separated by whitespace, ordinates by `cs` (default ","). */
  private def parseGml2Coordinates(text: String, cs: String): Seq[Coordinate] = {
    text.trim.split("\\s+").toSeq.filter(_.nonEmpty).map { tok =>
      val p = tok.split(java.util.regex.Pattern.quote(cs))
      if (p.length >= 3) new Coordinate(p(0).toDouble, p(1).toDouble, p(2).toDouble)
      else new Coordinate(p(0).toDouble, p(1).toDouble)
    }
  }

  private def readPolygon(r: XMLStreamReader): Geometry = {
    val fac = Wkb.factory
    var outer: LinearRing = null
    val holes = collection.mutable.ArrayBuffer.empty[LinearRing]
    var inOuter = true // GML2 outerBoundaryIs / GML3 exterior, default outer
    var depth = 1
    while (depth > 0 && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "exterior" | "outerBoundaryIs" => inOuter = true; depth += 1
        case "interior" | "innerBoundaryIs" => inOuter = false; depth += 1
        case "LinearRing" =>
          val ring = fac.createLinearRing(closeRing(readCoordsUntilEnd(r)).toArray)
          if (outer == null && inOuter) outer = ring else holes += ring
        case _ => depth += 1
      }
      case XMLStreamConstants.END_ELEMENT => depth -= 1
      case _ => ()
    }
    fac.createPolygon(outer, holes.toArray)
  }

  /** Generic member scan: any geometry element under the Multi* container
    * is a part; collapse to the typed Multi* when homogeneous. */
  private def readMulti(r: XMLStreamReader, tag: String): Geometry = {
    val fac = Wkb.factory
    val parts = collection.mutable.ArrayBuffer.empty[Geometry]
    var depth = 1
    while (depth > 0 && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        val n = r.getLocalName
        if (GeomTags(n)) parts += readGeometry(r, n) else depth += 1
      case XMLStreamConstants.END_ELEMENT => depth -= 1
      case _ => ()
    }
    val ps = parts.toArray
    if (ps.nonEmpty && ps.forall(_.isInstanceOf[Point]))
      fac.createMultiPoint(ps.map(_.asInstanceOf[Point]))
    else if (ps.nonEmpty && ps.forall(_.isInstanceOf[LineString]))
      fac.createMultiLineString(ps.map(_.asInstanceOf[LineString]))
    else if (ps.nonEmpty && ps.forall(_.isInstanceOf[Polygon]))
      fac.createMultiPolygon(ps.map(_.asInstanceOf[Polygon]))
    else fac.createGeometryCollection(ps)
  }

  private def closeRing(cs: Seq[Coordinate]): Seq[Coordinate] =
    if (cs.length >= 3 && cs.head.equals2D(cs.last)) cs
    else if (cs.length >= 3) cs :+ cs.head.copy()
    else cs

  // ---- write --------------------------------------------------------------

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  private def posText(cs: Array[Coordinate]): String = cs.map { c =>
    val base = fmt(c.x) + " " + fmt(c.y)
    if (java.lang.Double.isNaN(c.getZ)) base else base + " " + fmt(c.getZ)
  }.mkString(" ")

  /** ` srsDimension="3"` when the linework carries Z — without it a reader
    * (ours included, before round 10) groups the posList numbers in pairs
    * and silently drops every third ordinate on the round-trip. */
  private def dimAttr(cs: Array[Coordinate]): String =
    if (cs.exists(c => !java.lang.Double.isNaN(c.getZ))) " srsDimension=\"3\"" else ""

  private[io] def geomToGml(g: Geometry, srs: String = ""): String = g match {
    case p: Point =>
      s"<gml:Point$srs><gml:pos${dimAttr(p.getCoordinates)}>${posText(p.getCoordinates)}</gml:pos></gml:Point>"
    case rg: LinearRing =>
      s"<gml:LinearRing><gml:posList${dimAttr(rg.getCoordinates)}>${posText(rg.getCoordinates)}</gml:posList></gml:LinearRing>"
    case l: LineString =>
      s"<gml:LineString$srs><gml:posList${dimAttr(l.getCoordinates)}>${posText(l.getCoordinates)}</gml:posList></gml:LineString>"
    case p: Polygon =>
      val outer = s"<gml:exterior>${geomToGml(p.getExteriorRing)}</gml:exterior>"
      val holes = (0 until p.getNumInteriorRing)
        .map(i => s"<gml:interior>${geomToGml(p.getInteriorRingN(i))}</gml:interior>").mkString
      s"<gml:Polygon$srs>$outer$holes</gml:Polygon>"
    case mp: MultiPoint =>
      val ms = (0 until mp.getNumGeometries)
        .map(i => s"<gml:pointMember>${geomToGml(mp.getGeometryN(i))}</gml:pointMember>").mkString
      s"<gml:MultiPoint$srs>$ms</gml:MultiPoint>"
    case ml: MultiLineString =>
      val ms = (0 until ml.getNumGeometries)
        .map(i => s"<gml:curveMember>${geomToGml(ml.getGeometryN(i))}</gml:curveMember>").mkString
      s"<gml:MultiCurve$srs>$ms</gml:MultiCurve>"
    case mp: MultiPolygon =>
      val ms = (0 until mp.getNumGeometries)
        .map(i => s"<gml:surfaceMember>${geomToGml(mp.getGeometryN(i))}</gml:surfaceMember>").mkString
      s"<gml:MultiSurface$srs>$ms</gml:MultiSurface>"
    case gc: GeometryCollection =>
      val ms = (0 until gc.getNumGeometries)
        .map(i => s"<gml:geometryMember>${geomToGml(gc.getGeometryN(i))}</gml:geometryMember>").mkString
      s"<gml:MultiGeometry$srs>$ms</gml:MultiGeometry>"
  }

  private def xmlEscape(s: String): String = s.flatMap {
    case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
    case '"' => "&quot;"; case c => c.toString
  }

  /** Column names become XML ELEMENT names — launder to NCName form the way
    * GDAL does (invalid chars → '_', leading non-letter prefixed). */
  private[io] def xmlName(s: String): String = {
    val cleaned = s.replaceAll("[^A-Za-z0-9_.-]", "_")
    if (cleaned.isEmpty || (!cleaned.head.isLetter && cleaned.head != '_')) "_" + cleaned
    else cleaned
  }

  private def xsdType(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.LongType    => "xs:long"
    case org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.ByteType    => "xs:int"
    case org.apache.spark.sql.types.DoubleType  => "xs:double"
    case org.apache.spark.sql.types.FloatType   => "xs:float"
    case org.apache.spark.sql.types.BooleanType => "xs:boolean"
    case _                                      => "xs:string"
  }

  /** One `<gml:featureMember>` XML string per row, rendered on executors. */
  private def featureLines(gdf: GeoDataFrame): DataFrame = {
    val g = gdf.geometryCol
    val srs = gdf.crs.get(g).orElse(gdf.crs.headOption.map(_._2))
      .map(c => s""" srsName="${xmlEscape(c)}"""").getOrElse("")
    val attrs = gdf.df.schema.fields.filter(_.name != g)
    val renderGeom = udf((b: Array[Byte]) =>
      if (b == null) "" else geomToGml(Wkb.read(b), srs))
    val attrXml = attrs.map { f =>
      val nameEsc = xmlName(f.name)
      when(col(f.name).isNull, lit(""))
        .otherwise(concat(lit(s"<ogr:$nameEsc>"),
          regexp_replace(regexp_replace(regexp_replace(col(f.name).cast("string"),
            "&", "&amp;"), "<", "&lt;"), ">", "&gt;"),
          lit(s"</ogr:$nameEsc>")))
    }
    val attrsCol = if (attrs.isEmpty) lit("") else concat(attrXml: _*)
    gdf.df.select(concat(lit("<gml:featureMember><ogr:feature><ogr:geometryProperty>"),
      renderGeom(col(g)), lit("</ogr:geometryProperty>"), attrsCol,
      lit("</ogr:feature></gml:featureMember>")).as("value"))
  }

  private val documentHeader: String =
    """<?xml version="1.0" encoding="UTF-8"?>""" + "\n" +
      """<ogr:FeatureCollection xmlns:ogr="http://ogr.maptools.org/" xmlns:gml="http://www.opengis.net/gml">""" + "\n"

  private val documentFooter = "</ogr:FeatureCollection>\n"

  private def writeXsd(gdf: GeoDataFrame, gmlPath: String): Unit = {
    val g = gdf.geometryCol
    val fields = gdf.df.schema.fields.filter(_.name != g).map(f =>
      s"""<xs:element name="${xmlName(f.name)}" type="${xsdType(f.dataType)}"/>""").mkString("\n")
    val xsd = """<?xml version="1.0" encoding="UTF-8"?>""" + "\n" +
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema" xmlns:ogr="http://ogr.maptools.org/" targetNamespace="http://ogr.maptools.org/">""" +
      "\n" + fields + "\n</xs:schema>\n"
    val p = new org.apache.hadoop.fs.Path(gmlPath.replaceAll("(?i)\\.gml$", "") + ".xsd")
    val fs = p.getFileSystem(gdf.df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(xsd.getBytes("UTF-8")) finally out.close()
  }

  /** Single-document export; rows stream through the driver one partition
    * at a time (toLocalIterator), never all at once. Writes the companion
    * `.xsd` so the round trip restores attribute types. */
  def write(gdf: GeoDataFrame, path: String): Unit = {
    writeXsd(gdf, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(gdf.df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
    try {
      out.write(documentHeader.getBytes("UTF-8"))
      val it = featureLines(gdf).toLocalIterator()
      while (it.hasNext) { out.write(it.next().getString(0).getBytes("UTF-8")); out.write('\n') }
      out.write(documentFooter.getBytes("UTF-8"))
    } finally out.close()
  }

  /** Distributed write — one complete GML document per partition written
    * directly from executors (same shape as `Kml.writePartitioned`); the
    * companion `.xsd` lands once beside the directory. */
  def writePartitioned(gdf: GeoDataFrame, dir: String): Unit = {
    val spark = gdf.df.sparkSession
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fsDir = new org.apache.hadoop.fs.Path(dir)
    fsDir.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(fsDir)
    writeXsd(gdf, s"$dir/schema.gml") // lands as <dir>/schema.xsd
    val header = documentHeader
    featureLines(gdf).rdd.mapPartitionsWithIndex { (pi, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val p = new org.apache.hadoop.fs.Path(f"$dir%s/part-$pi%05d.gml")
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
