package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Add, Asin, Cos, Divide,
  Expression, Least, Literal, Multiply, Sin, Sqrt, Subtract, ToRadians}
import org.apache.spark.sql.graft.bridge

/** Geospatial scalar functions (r2 VERDICT item 9 — the reconstructed
  * RVI map/trace capability's distance primitive). Composed from
  * codegen'd built-in Catalyst expressions, so the whole formula stays
  * inside whole-stage codegen; no UDF, no custom Expression needed for
  * scalar trig. One expression-level definition serves both the Column
  * API and the `haversine_km` SQL function registered by
  * [[graft.GraftExtensions]] (a Column-composed tree cannot be returned
  * from a SQL function builder — its ColumnNode wrappers never resolve).
  *
  * The driver fixtures carry no lat/lon columns, so no declared query
  * can oracle-check this (documented fixture limitation, SURVEY.md §2);
  * GeoSpec verifies against published great-circle distances and the
  * spherical-geometry invariants instead.
  */
object Geo {

  /** IUGG mean Earth radius, km. */
  val EarthRadiusKm = 6371.0088

  /** Expression-level haversine: 2R·asin(√(sin²(Δφ/2) +
    * cosφ₁·cosφ₂·sin²(Δλ/2))), inputs in degrees. The argument is
    * clamped to 1.0 — float rounding near antipodes can push it a ulp
    * over, and asin would return NaN. Integer inputs coerce to double
    * through the analyzer's standard implicit casts.
    */
  def haversineKmExpr(lat1: Expression, lon1: Expression,
      lat2: Expression, lon2: Expression): Expression = {
    val two = Literal(2.0)
    val hLat = Sin(Divide(ToRadians(Subtract(lat2, lat1)), two))
    val hLon = Sin(Divide(ToRadians(Subtract(lon2, lon1)), two))
    val a = Add(Multiply(hLat, hLat),
      Multiply(Multiply(Cos(ToRadians(lat1)), Cos(ToRadians(lat2))),
        Multiply(hLon, hLon)))
    Multiply(Literal(2 * EarthRadiusKm), Asin(Sqrt(Least(Seq(a, Literal(1.0))))))
  }

  /** Great-circle distance in km between (lat1, lon1) and (lat2, lon2)
    * in degrees — Column entry point over [[haversineKmExpr]].
    */
  def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column =
    bridge.column(haversineKmExpr(bridge.expression(lat1),
      bridge.expression(lon1), bridge.expression(lat2),
      bridge.expression(lon2)))
}
