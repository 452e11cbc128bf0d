package graft.io

import graft.api.GeoDataFrame
import org.apache.spark.sql.SparkSession

/** Format-dispatching entry points mirroring the reference's single
  * `read_file` / `to_file` surface (`io/file.py:197-339/614-794`, where OGR
  * picks the driver from the extension). Every underlying reader keeps its
  * own scale posture (file-level parallelism, bbox/mask pushdown, metadata
  * read on the driver only).
  */
object GeoIO {

  /** Driver inferred from the extension: .shp/.zip (Shapefile),
    * .fgb (FlatGeobuf), .geojson/.json/.ndjson (GeoJSON), .gpkg
    * (GeoPackage), .csv (WKT or X/Y columns), .kml, .gml, .gpx, .mif/.mid (MapInfo), .feather/.arrow
    * (Arrow IPC), .parquet or a parquet directory (GeoParquet). `layer`
    * applies to GPKG (table name) and GPX (waypoints/routes/tracks/
    * route_points/track_points). `where` is an
    * ANSI SQL boolean over the attribute columns, applied before `rows`
    * slices (ref io/file.py:197-239 OGR SQL restriction). */
  def readFile(spark: SparkSession, path: String,
               layer: Option[String] = None,
               bbox: Option[(Double, Double, Double, Double)] = None,
               mask: Option[Array[Byte]] = None,
               columns: Option[Seq[String]] = None,
               rows: Option[Int] = None,
               where: Option[String] = None): GeoDataFrame = {
    val l = path.toLowerCase.stripSuffix("/")
    def prune(g: GeoDataFrame): GeoDataFrame = IoFilters.pruneAndLimit(g, columns, rows, where)
    if (l.endsWith(".shp") || l.endsWith(".zip"))
      Shapefile.read(spark, path, bbox, columns, rows, mask, where)
    else if (l.endsWith(".fgb"))
      FlatGeobuf.read(spark, path, bbox, columns, rows, mask, where)
    else if (l.endsWith(".geojson") || l.endsWith(".json") || l.endsWith(".ndjson"))
      GeoJsonIO.read(spark, path, bbox, columns, rows, mask, where)
    else if (l.endsWith(".gpkg"))
      Gpkg.read(spark, path, layer, bbox, columns, rows, mask, where)
    else if (l.endsWith(".csv"))
      CsvWkt.read(spark, path, None, bbox, columns, rows, mask, where)
    else if (l.endsWith(".kml"))
      Kml.read(spark, path, bbox, columns, rows, mask, where)
    else if (l.endsWith(".gml"))
      Gml.read(spark, path, bbox, columns, rows, mask, where)
    else if (l.endsWith(".gpx"))
      Gpx.read(spark, path, layer, bbox, columns, rows, mask, where)
    else if (l.endsWith(".mif") || l.endsWith(".mid"))
      MapInfoMif.read(spark, path.replaceAll("(?i)\\.mid$", ".mif"), bbox, columns, rows, mask, where)
    else if (l.endsWith(".dxf"))
      Dxf.read(spark, path, layer, bbox, columns, rows, mask, where)
    else if (l.endsWith(".feather") || l.endsWith(".arrow"))
      prune(Feather.read(spark, path, columns, bbox, mask))
    else {
      // GeoParquet: prefer the covering-bbox scan prefilter paths
      val base = (bbox, mask) match {
        case (Some((x0, y0, x1, y1)), None) => GeoParquet.readBbox(spark, path, x0, y0, x1, y1)
        case (None, Some(m))                => GeoParquet.readMask(spark, path, m)
        case (None, None)                   => GeoParquet.read(spark, path)
        case _ => throw new IllegalArgumentException(
          "bbox and mask cannot both be given (ref io/file.py:197-239)")
      }
      prune(base)
    }
  }

  /** Driver inferred from the extension; GeoParquet for directories. */
  def toFile(gdf: GeoDataFrame, path: String, mode: String = "w"): Unit = {
    val l = path.toLowerCase
    require(mode == "w" || mode == "a", s"mode must be 'w' or 'a', got '$mode'")
    if (mode == "a") {
      // reference to_file(mode="a") (io/file.py:614-794): append where the
      // container can take new features; loud error where it cannot
      // (single-document exports would need a full rewrite to stay valid)
      if (l.endsWith(".gpkg")) Gpkg.append(gdf, path)
      else if (l.endsWith(".geojson") || l.endsWith(".json") || l.endsWith(".ndjson"))
        GeoJsonIO.write(gdf, path, append = true)
      else if (!l.matches(".*\\.(shp|fgb|feather|arrow|csv|kml|gml|gpx|mif|mid|dxf)$"))
        GeoParquet.write(gdf, path, mode = "append")
      else throw new UnsupportedOperationException(
        s"append mode is not supported for this format ($path): Shapefile/" +
          "FlatGeobuf/Feather/CSV/KML/GML/GPX/MIF/DXF are single-document " +
          "exports; append to GPKG, line-delimited GeoJSON, or GeoParquet")
    }
    else if (l.endsWith(".shp")) Shapefile.write(gdf, path)
    else if (l.endsWith(".fgb")) FlatGeobuf.write(gdf, path)
    else if (l.endsWith(".geojson") || l.endsWith(".json") || l.endsWith(".ndjson"))
      GeoJsonIO.write(gdf, path)
    else if (l.endsWith(".feather") || l.endsWith(".arrow")) Feather.write(gdf, path)
    else if (l.endsWith(".gpkg")) Gpkg.write(gdf, path)
    else if (l.endsWith(".csv")) CsvWkt.write(gdf, path)
    else if (l.endsWith(".kml")) Kml.write(gdf, path)
    else if (l.endsWith(".gml")) Gml.write(gdf, path)
    else if (l.endsWith(".gpx")) Gpx.write(gdf, path)
    else if (l.endsWith(".mif") || l.endsWith(".mid")) MapInfoMif.write(gdf, path)
    else if (l.endsWith(".dxf")) Dxf.write(gdf, path)
    else GeoParquet.write(gdf, path)
  }

  /** Feature layers of a container format (ref list_layers, io/file.py:867). */
  def listLayers(spark: SparkSession, path: String): Seq[(String, String)] =
    if (path.toLowerCase.endsWith(".gpkg")) Gpkg.listLayers(spark, path)
    else if (path.toLowerCase.endsWith(".gpx"))
      Gpx.Layers.map(l => l -> (if (l == "waypoints" || l.endsWith("_points")) "Point"
                                else if (l == "routes") "LineString" else "MultiLineString"))
    else if (path.toLowerCase.endsWith(".dxf")) Dxf.listLayers(spark, path)
    else throw new UnsupportedOperationException(
      "list_layers: only GPKG, GPX and DXF containers carry multiple layers in this engine")
}
