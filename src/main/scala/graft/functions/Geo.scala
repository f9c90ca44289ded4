package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo operations over the reference's `geo_point` shape — the
  * `{lat, lon}` double struct EsMapping produces (reference
  * dump-es-parquet:46). Pure column arithmetic: codegen'd, oracle-
  * reproducible, and cheap enough to evaluate per row at any scale.
  */
object Geo {

  val EarthRadiusKm: Double = 6371.0088 // IUGG mean radius

  /** Build a geo_point struct from scalar coordinates. */
  def point(lat: Column, lon: Column): Column =
    struct(lat.cast("double").as("lat"), lon.cast("double").as("lon"))

  /** Great-circle distance in km between two geo_points (haversine). */
  def haversineKm(a: Column, b: Column): Column = {
    def rad(c: Column) = radians(c)
    val dLat = rad(b.getField("lat")) - rad(a.getField("lat"))
    val dLon = rad(b.getField("lon")) - rad(a.getField("lon"))
    val h = pow(sin(dLat / 2), 2) +
      cos(rad(a.getField("lat"))) * cos(rad(b.getField("lat"))) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(h))
  }

  /** Bounding-box containment — the cheap pre-filter before exact
    * distance, and the predicate a geo-partitioned layout prunes on. */
  def inBox(p: Column, minLat: Double, maxLat: Double,
            minLon: Double, maxLon: Double): Column = {
    val lat = p.getField("lat")
    val lon = p.getField("lon")
    lat >= minLat && lat <= maxLat && lon >= minLon && lon <= maxLon
  }
}
