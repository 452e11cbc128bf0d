package graft.ops

import org.apache.spark.sql.DataFrame

/** Geocoding surface (reference `tools/geocoding.py:25/69`). The reference
  * calls external geopy web services; this engine runs zero-egress, so the
  * API exists (discoverable, typed) and raises — mirroring SURVEY §2.11's
  * decision. A provider could be plugged in by implementing [[Geocoder]]
  * and calling [[geocode]]/[[reverseGeocode]] with it. */
object Geocoding {

  trait Geocoder extends Serializable {
    /** address → (lon, lat) */
    def forward(address: String): Option[(Double, Double)]
    /** (lon, lat) → address */
    def reverse(lon: Double, lat: Double): Option[String]
  }

  def geocode(df: DataFrame, addressCol: String, provider: Option[Geocoder] = None): DataFrame =
    provider match {
      case None => throw new UnsupportedOperationException(
        "geocode requires an external service; this environment is zero-egress " +
          "(ref tools/geocoding.py). Provide a Geocoding.Geocoder implementation.")
      case Some(p) =>
        import org.apache.spark.sql.functions._
        import graft.functions.GeoFunctions.st_point
        val u = udf((a: String) => if (a == null) None else p.forward(a))
        df.withColumn("__g", u(col(addressCol)))
          .withColumn("geometry", st_point(col("__g._1"), col("__g._2")))
          .drop("__g")
    }

  def reverseGeocode(df: DataFrame, geomCol: String, provider: Option[Geocoder] = None): DataFrame =
    provider match {
      case None => throw new UnsupportedOperationException(
        "reverse_geocode requires an external service; this environment is zero-egress " +
          "(ref tools/geocoding.py). Provide a Geocoding.Geocoder implementation.")
      case Some(p) =>
        import org.apache.spark.sql.functions._
        import graft.functions.GeoFunctions.{st_x, st_y}
        val u = udf((lon: Double, lat: Double) => p.reverse(lon, lat))
        df.withColumn("address", u(st_x(col(geomCol)), st_y(col(geomCol))))
    }
}
