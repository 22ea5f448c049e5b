package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar functions (reference `src/encode.py:371-400`):
  * haversine distance and unit-sphere cartesian conversion. Pure column
  * math — codegen'd, no UDFs.
  */
object Geo {
  val EarthRadiusKm = 6371.0

  /** Great-circle distance in km (reference `_haversine_distance`,
    * src/encode.py:371-388; spherical R=6371). */
  def haversine(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Unit-sphere cartesian components (reference `_geospatial_to_cartesian`,
    * src/encode.py:390-400): (cos lat·cos lon, cos lat·sin lon, sin lat). */
  def cartesianX(lon: Column, lat: Column): Column = cos(radians(lat)) * cos(radians(lon))
  def cartesianY(lon: Column, lat: Column): Column = cos(radians(lat)) * sin(radians(lon))
  def cartesianZ(lon: Column, lat: Column): Column = sin(radians(lat))

  /** 3-element cartesian array, null-safe (null location → zeros, matching
    * the reference's NaN → zero-block convention, src/encode.py:76-84). */
  def cartesian(lon: Column, lat: Column): Column =
    when(lon.isNull || lat.isNull, array(lit(0.0), lit(0.0), lit(0.0)))
      .otherwise(array(cartesianX(lon, lat), cartesianY(lon, lat), cartesianZ(lon, lat)))
}
