package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial column functions for the reference's coordinate columns
  * (station lat/lon, SURVEY §1.2).
  */
object GeoFunctions {

  /** Haversine great-circle distance in kilometers between two
    * (lat, lon) degree pairs. Pure column arithmetic (codegen'd).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = lit(6371.0088) // mean Earth radius, km
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2) * r * asin(sqrt(a))
  }

  /** Coordinate sanity predicate (reference quality invariant:
    * tests/test_glue_transformation.py:208-234).
    */
  def validCoords(lat: Column, lon: Column): Column =
    lat.between(-90, 90) && lon.between(-180, 180)
}
