package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar functions (r2 VERDICT item 9 — the reconstructed
  * RVI map/trace capability's distance primitive). Composed from
  * codegen'd built-ins, so the expression stays inside whole-stage
  * codegen; no UDF, no custom Expression needed for scalar trig.
  *
  * The driver fixtures carry no lat/lon columns, so no declared query
  * can oracle-check this (documented fixture limitation, SURVEY.md §2);
  * GeoSpec verifies against published great-circle distances and the
  * spherical-geometry invariants instead.
  */
object Geo {

  /** IUGG mean Earth radius, km. */
  val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between (lat1, lon1) and (lat2, lon2)
    * in degrees, via the haversine formula:
    * 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))). The argument is
    * clamped to 1.0 — float rounding near antipodes can push it a ulp
    * over, and asin would return NaN.
    */
  def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val hLat = sin(radians(lat2 - lat1) / 2)
    val hLon = sin(radians(lon2 - lon1) / 2)
    val a = hLat * hLat +
      cos(radians(lat1)) * cos(radians(lat2)) * hLon * hLon
    lit(2 * EarthRadiusKm) * asin(sqrt(least(a, lit(1.0))))
  }
}
