package graft

import org.apache.spark.sql.functions._

/** Spatial group: grid-join losslessness vs the naive cross product,
  * nearest-POI agreement with a window-ranked brute force, trip
  * invariants, and the no-cartesian plan property of the grid join.
  */
class SpatialSpec extends SparkSpec {

  test("geo_grid_join equals the naive cross-join radius filter") {
    // brute force in-engine: cross join + filter, no grid
    val ev = q("geo_grid_join").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pts = Tables.events(spark, sfDir).select(
      col("event_id"),
      (operators.TextDedup.hash56(concat(lit("x:"), col("event_id").cast("string"))) % 1000000L).as("px"),
      (operators.TextDedup.hash56(concat(lit("y:"), col("event_id").cast("string"))) % 1000000L).as("py"))
    val ps = Tables.table(spark, sfDir, "nation").select(
      col("n_nationkey").cast("long").as("poi_id"),
      (operators.TextDedup.hash56(concat(lit("x:poi:"), col("n_nationkey").cast("string"))) % 1000000L).as("qx"),
      (operators.TextDedup.hash56(concat(lit("y:poi:"), col("n_nationkey").cast("string"))) % 1000000L).as("qy"))
    val brute = pts.crossJoin(ps)
      .withColumn("d2", (col("px") - col("qx")) * (col("px") - col("qx"))
        + (col("py") - col("qy")) * (col("py") - col("qy")))
      .filter(col("d2") <= 60000L * 60000L)
      .select(col("event_id"), col("poi_id"),
        (floor(sqrt(col("d2").cast("double")) * 100 + 0.5) / 100).cast("double").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ev == brute, s"grid join lost/invented pairs: ${ev.size} vs ${brute.size}")
    assert(ev.nonEmpty, "degenerate: no pairs within radius at sf0.001")
  }

  test("geo_nearest_poi: one row per event, dist consistent with grid join hits") {
    val n = q("geo_nearest_poi")
    val nEvents = Tables.events(spark, sfDir).count()
    assert(n.count() == nEvents)
    // any event with a grid-join hit must have nearest dist <= that hit
    val hits = q("geo_grid_join").groupBy("event_id")
      .agg(min("dist").as("best_hit"))
    val bad = n.join(hits, "event_id")
      .filter(col("dist") > col("best_hit")).count()
    assert(bad == 0, s"$bad events where nearest > a known in-radius hit")
  }

  test("events_trip_stats invariants: counts partition events; single-point trips have zero extent") {
    val t = q("events_trip_stats")
    val total = t.agg(sum("n_points")).head().getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
    val degenerate = t.filter(col("n_points") === 1
      && (col("dur_s") =!= 0 || col("dist") =!= 0.0)).count()
    assert(degenerate == 0)
    // trip ids are 1..k dense per user
    val dense = t.groupBy("user_id")
      .agg(count(lit(1)).as("k"), min("trip_id").as("lo"), max("trip_id").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("k")).count()
    assert(dense == 0, "trip_id not dense 1..k within a user")
  }

  test("geo_cluster_cells matches a driver-side union-find over core cells") {
    // recompute the clustering naively: same core rule, 8-adjacency CC
    val pts = Tables.events(spark, sfDir).select(
      (operators.TextDedup.hash56(concat(lit("x:"), col("event_id").cast("string"))) % 1000000L).as("px"),
      (operators.TextDedup.hash56(concat(lit("y:"), col("event_id").cast("string"))) % 1000000L).as("py"))
      .select(expr("px div 60000").as("cx"), expr("py div 60000").as("cy"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cnt = pts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = pts.length.toLong; val c = cnt.size.toLong
    val core = cnt.filter { case (_, k) => k * 5 * c > n * 6 }
    val ids = core.keys.toArray
    def cid(x: (Long, Long)): Long = x._1 * 100000L + x._2
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: (Long, Long)): (Long, Long) =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- ids; b <- ids
         if a != b && math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1) {
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (cid(ra) < cid(rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val naive = ids.groupBy(i => cid(find(i))).map { case (_, members) =>
      val root = members.map(cid).min
      root -> (members.length.toLong, members.map(core).sum)
    }
    val got = q("geo_cluster_cells").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == naive, s"engine ${got.size} clusters vs naive ${naive.size}")
    assert(got.nonEmpty)
  }

  test("events_od_matrix: flow total equals the trip count") {
    val flows = q("events_od_matrix").agg(sum("n_trips")).head().getLong(0)
    val trips = q("events_trip_stats").count()
    assert(flows == trips, s"$flows flows vs $trips trips")
    // zones bounded by the 4×4 grid
    val bad = q("events_od_matrix").filter(
      col("o_zx") < 0 || col("o_zx") > 3 || col("o_zy") < 0 || col("o_zy") > 3
        || col("d_zx") < 0 || col("d_zx") > 3
        || col("d_zy") < 0 || col("d_zy") > 3).count()
    assert(bad == 0)
  }

  test("stream_geofence: transitions strictly alternate per vehicle") {
    val rows = q("stream_geofence").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { seq =>
      seq.map(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a != b, "enter/exit must alternate")
        case _ =>
      }
    }
  }

  test("plan: grid join broadcasts the candidate cells, no cartesian product") {
    val p = plan(SparkEntry.queries("geo_grid_join")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"), "grid join must not plan a cartesian")
  }

  test("geo_polygon_contain agrees with a JVM ray-independent convex test") {
    import org.apache.spark.sql.functions._
    val hex = Seq((800000L, 500000L), (650000L, 760000L),
      (350000L, 760000L), (200000L, 500000L),
      (350000L, 240000L), (650000L, 240000L))
    def insideJvm(px: Long, py: Long): Boolean =
      hex.indices.forall { i =>
        val (x1, y1) = hex(i)
        val (x2, y2) = hex((i + 1) % hex.length)
        (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) >= 0L
      }
    val got = q("geo_polygon_contain").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute the synthetic coordinates through the declared hash
    val pts = Tables.events(spark, sfDir)
      .select(col("user_id"),
        graft.operators.TextDedup.hash56(
          concat(lit("x:"), col("event_id").cast("string"))) % 1000000L,
        graft.operators.TextDedup.hash56(
          concat(lit("y:"), col("event_id").cast("string"))) % 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = pts.groupBy(_._1).view.mapValues { rs =>
      (rs.length.toLong, rs.count(p => insideJvm(p._2, p._3)).toLong)
    }.toMap
    assert(got == expect)
    // the zone is neither empty nor everything — the fixture exercises
    // both sides of every edge
    val totalIn = got.values.map(_._2).sum
    val total = got.values.map(_._1).sum
    assert(totalIn > 0 && totalIn < total,
      s"degenerate containment: $totalIn of $total")
  }
}
