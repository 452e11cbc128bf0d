package graft.io

import graft.api.GeoDataFrame
import graft.functions.GeoFunctions.{st_astext, st_geomfromwkt, st_point}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV vector driver, mirroring GDAL's CSV driver as the reference reaches
  * it through `read_file`/`to_file` (ref io/file.py:197-339: OGR picks the
  * CSV driver from the extension; geometry comes from a WKT-bearing column
  * — GEOM_POSSIBLE_NAMES — or an X/Y column pair — X_POSSIBLE_NAMES /
  * Y_POSSIBLE_NAMES).
  *
  * Scale posture: `spark.read.csv` is a splittable text source — a 100 TB
  * CSV dataset scans block-parallel with filters applied before any
  * shuffle, and the distributed write is one part file per partition with
  * no driver involvement. The single-`.csv` export path streams through
  * the driver one partition at a time (toLocalIterator), never
  * materializing the frame.
  */
object CsvWkt {

  /** GDAL's GEOM_POSSIBLE_NAMES / X_POSSIBLE_NAMES / Y_POSSIBLE_NAMES
    * defaults (case-insensitive). */
  private val geomNames = Seq("wkt", "geometry", "geom", "the_geom")
  private val xNames    = Seq("x", "lon", "long", "longitude")
  private val yNames    = Seq("y", "lat", "latitude")

  /** Read CSV with header; geometry parsed from `geometryColumn` (or the
    * first GEOM_POSSIBLE_NAMES match), else built from an X/Y pair. Type
    * inference samples the data like GDAL's autodetect; attribute `where`
    * and the bbox/mask intersects filters run right after parse, before
    * any shuffle. */
  def read(spark: SparkSession, path: String,
           geometryColumn: Option[String] = None,
           bbox: Option[(Double, Double, Double, Double)] = None,
           columns: Option[Seq[String]] = None,
           rows: Option[Int] = None,
           mask: Option[Array[Byte]] = None,
           where: Option[String] = None): GeoDataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true")
      .option("mode", "PERMISSIVE").csv(path)
    def find(cands: Seq[String]): Option[String] =
      raw.columns.find(c => cands.contains(c.toLowerCase))
    val base = geometryColumn.orElse(find(geomNames)) match {
      case Some(gc) =>
        // parse in place when the source column is already named
        // "geometry"; otherwise materialize `geometry` and drop the text
        val parsed = st_geomfromwkt(col(gc).cast("string"))
        val df =
          if (gc == "geometry") raw.withColumn("geometry", parsed)
          else raw.withColumn("geometry", parsed).drop(gc)
        GeoDataFrame(df)
      case None => (find(xNames), find(yNames)) match {
        case (Some(xc), Some(yc)) =>
          GeoDataFrame(raw.withColumn("geometry",
            st_point(col(xc).cast("double"), col(yc).cast("double"))))
        case _ => throw new IllegalArgumentException(
          s"CSV ${path}: no geometry column (tried ${geomNames.mkString("/")}) " +
            s"and no X/Y pair (tried ${xNames.mkString("/")} × ${yNames.mkString("/")}); " +
            "pass geometryColumn=")
      }
    }
    IoFilters.pruneAndLimit(IoFilters.bboxOrMask(base, bbox, mask), columns, rows, where)
  }

  /** Geometry rendered as a `WKT` column, like the GDAL CSV driver's
    * GEOMETRY=AS_WKT output. */
  private def asCsvDf(gdf: GeoDataFrame): DataFrame = {
    val g = gdf.geometryCol
    val attrs = gdf.df.columns.filter(_ != g)
    gdf.df.select(st_astext(col(g)).as("WKT") +: attrs.map(col): _*)
  }

  /** Single-file export: header + properly quoted rows streamed through
    * the driver partition-by-partition. */
  def write(gdf: GeoDataFrame, path: String): Unit = {
    val out0 = asCsvDf(gdf)
    val header = out0.columns.map { c =>
      if (c.exists(ch => ch == ',' || ch == '"' || ch == '\n'))
        "\"" + c.replace("\"", "\"\"") + "\"" else c
    }.mkString(",")
    // to_csv gives spark-native quoting/escaping of each row
    val lines = out0.select(to_csv(struct(out0.columns.map(col): _*)).as("value"))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(gdf.df.sparkSession.sparkContext.hadoopConfiguration)
    val os = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
    try {
      os.write((header + "\n").getBytes("UTF-8"))
      val it = lines.toLocalIterator()
      while (it.hasNext) os.write((it.next().getString(0) + "\n").getBytes("UTF-8"))
    } finally os.close()
  }

  /** Distributed write — one headered part file per partition, no driver
    * involvement (the form a 100 TB export takes). */
  def writePartitioned(gdf: GeoDataFrame, dir: String): Unit =
    asCsvDf(gdf).write.mode("overwrite").option("header", "true").csv(dir)
}
