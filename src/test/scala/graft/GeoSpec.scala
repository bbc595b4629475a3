package graft

import org.apache.spark.sql.functions._
import graft.functions.Geo

/** Haversine checks: published great-circle distances (1% tolerance —
  * the spherical model itself deviates ~0.3% from the ellipsoid) plus
  * the exact spherical invariants.
  */
class GeoSpec extends SparkSpec {

  private def km(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    import spark.implicits._
    Seq((lat1, lon1, lat2, lon2)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .head().getDouble(0)
  }

  test("known distances within 1%") {
    val berlinParis = km(52.5200, 13.4050, 48.8566, 2.3522)
    assert(math.abs(berlinParis - 878) / 878 < 0.01, s"Berlin-Paris: $berlinParis")
    // one degree of longitude on the equator = 2πR/360
    val oneDeg = km(0, 0, 0, 1)
    assert(math.abs(oneDeg - 111.195) < 0.01, s"1° equator: $oneDeg")
    // pole to equator = quarter great circle = πR/2
    val quarter = km(90, 0, 0, 0)
    assert(math.abs(quarter - math.Pi * Geo.EarthRadiusKm / 2) < 1e-6)
  }

  test("invariants: zero on identity, symmetric, antipodal = πR, no NaN") {
    assert(km(52.52, 13.405, 52.52, 13.405) == 0.0)
    assert(km(10, 20, -30, 40) == km(-30, 40, 10, 20))
    val anti = km(45, 10, -45, -170)
    assert(math.abs(anti - math.Pi * Geo.EarthRadiusKm) < 1e-6)
    // longitude wrap: ±180 is the same meridian
    assert(math.abs(km(0, 180, 0, -180)) < 1e-9)
  }
}
