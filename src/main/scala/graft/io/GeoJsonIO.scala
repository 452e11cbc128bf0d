package graft.io

import graft.api.GeoDataFrame
import graft.functions.GeoFunctions._
import graft.functions.GeoJson
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoJSON file IO (reference `read_file`/`to_file` for the GeoJSON driver,
  * `io/file.py:197-339/614-794`).
  *
  * Format: newline-delimited GeoJSON Features (one feature per line —
  * streaming/splittable, the cloud-native "GeoJSONSeq" OGR driver), and a
  * whole-file FeatureCollection reader for small interchange files.
  * Properties are read through Spark's JSON schema inference; geometry is
  * decoded from the `geometry` member into WKB.
  */
object GeoJsonIO {

  /** [[read]] with `read_file`-style pushdown args (ref io/file.py:197-339):
    * `bbox` keeps features intersecting it, `columns` prunes properties
    * (geometry kept), `rows` caps the count. */
  def read(spark: SparkSession, path: String,
           bbox: Option[(Double, Double, Double, Double)],
           columns: Option[Seq[String]] = None,
           rows: Option[Int] = None): GeoDataFrame = {
    val base = read(spark, path)
    val bboxed = bbox.map { case (x0, y0, x1, y1) =>
      base.copy(df = base.df.filter(st_intersects(col(base.geometryCol),
        lit(graft.geom.Wkb.write(graft.geom.GeomOps.makeBox(x0, y0, x1, y1))))))
    }.getOrElse(base)
    val pruned = columns.map { cs =>
      val keep = (cs :+ bboxed.geometryCol).distinct.filter(bboxed.df.columns.contains)
      bboxed.copy(df = bboxed.df.select(keep.map(col): _*))
    }.getOrElse(bboxed)
    rows.map(n => pruned.copy(df = pruned.df.limit(n))).getOrElse(pruned)
  }

  /** Read newline-delimited features (or a single FeatureCollection file). */
  def read(spark: SparkSession, path: String): GeoDataFrame = {
    val txt = spark.read.text(path)
    val first = txt.limit(1).collect().headOption.map(_.getString(0).trim).getOrElse("")
    val lines: DataFrame =
      if (first.startsWith("{") && first.contains("\"FeatureCollection\"")) {
        // whole-file collection: split features on the driver (small files)
        val all = txt.collect().map(_.getString(0)).mkString("\n")
        val features = GeoJson.parseJson(all) match {
          case m: Map[String @unchecked, Any @unchecked] =>
            m.get("features") match {
              case Some(fs: Vector[Any @unchecked]) => fs.map(writeJson)
              case _                                => Vector.empty[String]
            }
          case _ => Vector.empty[String]
        }
        import spark.implicits._
        features.toDF("value")
      } else txt.filter(trim(col("value")) =!= "")

    // one plan: properties via from_json (schema inferred once), geometry
    // decoded from the raw line — rows stay aligned by construction
    val featureSchema = spark.read.json(
      lines.select(col("value")).as(org.apache.spark.sql.Encoders.STRING)).schema
    val parsed = lines
      .withColumn("__f", from_json(col("value"), featureSchema))
      .withColumn("geometry", stGeomFromGeoJsonU(col("value")))
    val hasProps = featureSchema.fields.exists(f => f.name == "properties" &&
      f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val flat =
      if (hasProps) parsed.select(col("__f.properties.*"), col("geometry"))
      else parsed.drop("__f", "value")
    GeoDataFrame(flat, "geometry", Map("geometry" -> "OGC:CRS84"))
  }

  private def writeJson(v: Any): String = v match {
    case m: Map[String @unchecked, Any @unchecked] =>
      m.map { case (k, x) => "\"" + k + "\":" + writeJson(x) }.mkString("{", ",", "}")
    case xs: Vector[Any @unchecked] => xs.map(writeJson).mkString("[", ",", "]")
    case s: String                  => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case null                       => "null"
    case d: Double                  => if (d == d.toLong.toDouble) d.toLong.toString else d.toString
    case other                      => other.toString
  }

  /** Write as newline-delimited GeoJSON features. */
  def write(gdf: GeoDataFrame, path: String): Unit = {
    val g = gdf.geometryCol
    val dataCols = gdf.df.columns.filter(_ != g)
    val propsJson = to_json(struct(dataCols.map(col): _*))
    gdf.df.select(concat(
      lit("""{"type":"Feature","properties":"""), propsJson,
      lit(""","geometry":"""), stAsGeoJsonU(col(g)), lit("}")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
