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
    // near-antipodal pairs can round `a` to 1 + few-ulp; unclamped,
    // asin(sqrt(a)) would be NaN and any distance predicate silently
    // false — clamp is a no-op everywhere else
    lit(2) * r * asin(sqrt(least(lit(1.0), a)))
  }

  /** Coordinate sanity predicate (reference quality invariant:
    * tests/test_glue_transformation.py:208-234).
    */
  def validCoords(lat: Column, lon: Column): Column =
    lat.between(-90, 90) && lon.between(-180, 180)

  /** Radius join via grid bucketing: pairs (a, b) with
    * haversine(a, b) ≤ radiusKm, found through an EQUI-join on grid
    * cells (probe side visits its 3×3 neighborhood; index side sits in
    * exactly one cell, so each qualifying pair is emitted once — no
    * dedup pass, no cross join).
    *
    * Coverage contract: `cellDeg` must be ≥ the radius expressed in
    * degrees at the highest |latitude| present — lon degrees shrink by
    * cos(lat), so callers bound their domain (e.g. |lat| ≤ 60 with
    * cellDeg = 4 covers 200 km) or pick cellDeg for the worst band.
    * Inputs' column names must be disjoint; lat/lon in degrees.
    *
    * Scale: shuffle keys are integer cell ids; probe fan-out is a
    * constant 9; the trig verify runs post-join as codegen'd math.
    */
  def withinRadiusGridJoin(a: org.apache.spark.sql.DataFrame,
                           aLat: String, aLon: String,
                           b: org.apache.spark.sql.DataFrame,
                           bLat: String, bLon: String,
                           radiusKm: Double, cellDeg: Double)
      : org.apache.spark.sql.DataFrame = {
    // longitude wraps at ±180 (the haversine itself is wrap-safe, the
    // GRID must be too): lon cells live modulo nLon so a probe at the
    // antimeridian reaches its true neighbor on the other side.
    // UNIFORM cells via floor (width 360/nLon ≥ cellDeg): ceil would
    // make the SEAM cell narrower than cellDeg whenever 360 % cellDeg
    // ≠ 0, letting a pair inside the coverage contract sit 2 cells
    // apart across the seam and silently escape the 3×3 probe
    val nLon = math.floor(360.0 / cellDeg).toLong
    // nLon < 3 would alias the +1/-1 probes onto the same cell and
    // emit pairs twice — cellDeg must leave at least 3 lon cells
    require(nLon >= 3, s"cellDeg=$cellDeg leaves only $nLon lon cells (need >= 3)")
    val lonWidth = 360.0 / nLon
    def latCell(c: Column) = floor(c / cellDeg).cast("long")
    def lonCell(c: Column) =
      pmod(floor((c + 180.0) / lonWidth).cast("long"), lit(nLon))
    val probes = a
      .withColumn("__dlat", explode(sequence(lit(-1), lit(1))))
      .withColumn("__dlon", explode(sequence(lit(-1), lit(1))))
      .withColumn("__ca", latCell(col(aLat)) + col("__dlat"))
      .withColumn("__co", pmod(lonCell(col(aLon)) + col("__dlon"), lit(nLon)))
      .drop("__dlat", "__dlon")
    val indexed = b
      .withColumn("__ca", latCell(col(bLat)))
      .withColumn("__co", lonCell(col(bLon)))
    probes.join(indexed, Seq("__ca", "__co"))
      .filter(haversineKm(col(aLat), col(aLon), col(bLat), col(bLon)) <= radiusKm)
      .drop("__ca", "__co")
  }
}
