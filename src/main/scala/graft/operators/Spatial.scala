package graft.operators

import graft.{Canon, QueryGroup, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial analytics over synthetic planar coordinates — the geo family
  * the reference's vehicle-telemetry API implies (map display, proximity,
  * trip mining) generalized to the fixtures, which carry no lat/lon
  * (FIXTURES.md events schema): every event gets a deterministic point in
  * a 1 000 000 × 1 000 000 integer grid derived from the engine-
  * independent 56-bit sha256 hash ([[TextDedup.hash56]]), so Spark and
  * the DuckDB oracle reconstruct the identical geometry and every
  * distance is EXACT integer arithmetic (dx² + dy² ≤ 2·10¹² < 2⁶³) until
  * one final correctly-rounded sqrt.
  *
  * Scale design:
  *  - the radius join is a GRID-CELL equi-join (cell = coord div R, the
  *    small side replicated to its 3×3 neighborhood), never a cross
  *    product: at 100 TB the probe side shuffles once on the cell key —
  *    or not at all while the POI side stays broadcastable;
  *  - nearest-POI is the broadcast-NL + min_by pattern
  *    (vec_centroid_assign's shape): k× row fanout with map-side
  *    reduction, no shuffle of the big side beyond its partial agg;
  *  - trip segmentation is ONE user-keyed exchange shared by the
  *    gap-detection window and the per-trip aggregate; per-leg distances
  *    are centi-unit longs so the per-trip sum is order-insensitive
  *    (exact), never a parallel float fold.
  */
object Spatial extends QueryGroup {

  /** Grid span: coordinates live in [0, 1e6) integer units. */
  private val Span = 1000000L

  /** Radius for the proximity join, also the grid-cell size. */
  private val R = 60000L

  /** Trip split threshold: a gap ≥ 24 h starts a new trip. */
  private val GapUs = 86400000000L

  /** Deterministic coordinate: 56-bit hash of a salted key, mod span. */
  private def coord(salt: String, c: Column): Column =
    TextDedup.hash56(concat(lit(salt), c.cast("string"))) % Span

  private def coordSql(salt: String, e: String): String =
    s"CAST(concat('0x', substring(sha256('$salt' || CAST($e AS VARCHAR)), 1, 14)) AS BIGINT) % $Span"

  /** events + synthetic point (px, py). */
  private def points(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        coord("x:", col("event_id")).as("px"),
        coord("y:", col("event_id")).as("py"))

  private val pointsSql =
    s"""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |  ${coordSql("x:", "event_id")} AS px,
       |  ${coordSql("y:", "event_id")} AS py
       |FROM events""".stripMargin

  /** 25 POIs: one deterministic point per nation. */
  private def pois(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("poi_id"),
        coord("x:poi:", col("n_nationkey")).as("qx"),
        coord("y:poi:", col("n_nationkey")).as("qy"))

  private val poisSql =
    s"""SELECT CAST(n_nationkey AS BIGINT) AS poi_id,
       |  ${coordSql("x:poi:", "n_nationkey")} AS qx,
       |  ${coordSql("y:poi:", "n_nationkey")} AS qy
       |FROM nation""".stripMargin

  def queries = baseQueries ++ queries2

  private def baseQueries: Map[String, Q] = Map(
    "geo_grid_join" -> { (spark, dir) =>
      // Radius join events↔POIs WITHOUT a cross product: both sides key
      // by grid cell (cell edge = R), the tiny POI side replicated to
      // its 3×3 neighborhood — every true pair shares a candidate cell
      // because |dx|,|dy| ≤ R bounds the cell offset to ±1 — then the
      // exact integer d² ≤ R² filter keeps true hits only. The oracle
      // is the naive cross join: identical output PROVES the grid
      // decomposition lossless. Plan: candidate side is broadcast (225
      // replicated POI rows); the events scan reads 3 columns and never
      // shuffles. At 100 TB with a large POI table the same plan
      // becomes a shuffle equi-join on (cx, cy) — still linear.
      val ev = points(spark, dir)
        .withColumn("cx", expr(s"px div $R"))
        .withColumn("cy", expr(s"py div $R"))
      val cand = pois(spark, dir)
        .withColumn("dx", explode(sequence(lit(-1L), lit(1L))))
        .withColumn("dy", explode(sequence(lit(-1L), lit(1L))))
        .select(col("poi_id"), col("qx"), col("qy"),
          (expr(s"qx div $R") + col("dx")).as("cx"),
          (expr(s"qy div $R") + col("dy")).as("cy"))
      ev.join(broadcast(cand), Seq("cx", "cy"))
        .withColumn("d2",
          (col("px") - col("qx")) * (col("px") - col("qx"))
            + (col("py") - col("qy")) * (col("py") - col("qy")))
        .filter(col("d2") <= R * R)
        .select(col("event_id"), col("poi_id"),
          Canon.round2(sqrt(col("d2").cast("double"))).as("dist"))
        .orderBy("event_id", "poi_id")
    },

    "geo_nearest_poi" -> { (spark, dir) =>
      // Nearest POI per event — broadcast 25-row dim, 25× fanout, then
      // a map-side-combinable argmin keyed by event. The (d², poi_id)
      // argmin PACKS into one long (d² ≤ 2·10¹² needs 41 bits; poi_id
      // takes the low 5), so the aggregate is a plain codegen'd
      // hash-agg min — a min(struct(...)) here planned a SortAggregate
      // that SORTED the 25× fanout (measured 36 s at 10×; packed: a
      // flat ~2 s). Ties break to the smaller poi_id in the low bits.
      // The same shape serves any small reference set (chargers,
      // depots, geofences) at fleet scale.
      //
      // The mapPartitions identity is a MATERIALIZATION BARRIER for the
      // synthetic sha-256 coordinates (the sigTable discipline):
      // BroadcastNestedLoopJoin's whole-stage codegen defers stream-side
      // expressions into the per-build-row loop, so without the barrier
      // each event's px/py sha pair is recomputed 25× — measured 4.2 s
      // → 0.7 s at sf0.1 with the plan otherwise unchanged. A real
      // deployment reads stored coordinates and needs no barrier.
      import spark.implicits._
      val pts = points(spark, dir).select(col("event_id"), col("px"), col("py"))
        .as[(Long, Long, Long)].mapPartitions(identity)
        .toDF("event_id", "px", "py")
      val joined = pts.crossJoin(broadcast(pois(spark, dir)))
        .withColumn("d2",
          (col("px") - col("qx")) * (col("px") - col("qx"))
            + (col("py") - col("qy")) * (col("py") - col("qy")))
      joined.groupBy("event_id")
        .agg(min(col("d2") * 32L + col("poi_id")).as("packed"))
        .select(col("event_id"),
          (col("packed") % 32L).as("poi_id"),
          Canon.round2(sqrt(expr("packed div 32").cast("double"))).as("dist"))
        .orderBy("event_id")
    },

    "geo_polygon_contain" -> { (spark, dir) =>
      // Point-in-POLYGON containment — the zone-report generalization of
      // the circular geofence: which share of each vehicle's reports
      // fall inside a service area defined as a convex polygon (here a
      // hexagon over the synthetic grid). The test is six CROSS PRODUCTS
      // against CCW edges — pure integer arithmetic (|cross| ≤ 10¹² ≪
      // 2⁶³), branch-free, codegen'd per row, zero trig — so both
      // engines agree bit-for-bit on every boundary case. One map-side
      // pass + one user-keyed agg; at 100 TB a polygon SET first blocks
      // by bounding-box grid cell (the geo_grid_join machinery) and
      // runs this exact test only on candidates.
      val hex = Seq((800000L, 500000L), (650000L, 760000L),
        (350000L, 760000L), (200000L, 500000L),
        (350000L, 240000L), (650000L, 240000L))
      val inside = hex.indices.map { i =>
        val (x1, y1) = hex(i)
        val (x2, y2) = hex((i + 1) % hex.length)
        (lit(x2 - x1) * (col("py") - lit(y1))
          - lit(y2 - y1) * (col("px") - lit(x1))) >= 0
      }.reduce(_ && _)
      points(spark, dir)
        .withColumn("in_zone", inside)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_reports"),
          sum(when(col("in_zone"), 1L).otherwise(0L)).as("n_inside"))
        .select(col("user_id"), col("n_reports"), col("n_inside"),
          Canon.round6(col("n_inside").cast("double")
            / col("n_reports").cast("double")).as("share_inside"))
        .orderBy("user_id")
    },

    "geo_cluster_cells" -> { (spark, dir) =>
      // Grid-density clustering (DBSCAN-lite, the hotspot-mining shape):
      // a cell is CORE iff its point count exceeds 1.2× the mean
      // occupied-cell density — tested as the cross-multiplied integer
      // inequality cnt·5·C > N·6, no division, exact at any scale —
      // and clusters are connected components of 8-adjacent core
      // cells. Adjacency is an EQUI-join on shifted cell keys (the
      // geo_grid_join trick), components run through the distributed
      // hash-min propagation ([[Graph.connectedComponents]], with its
      // large-star/small-star fallback), and the oracle replays the
      // same clustering with a recursive label-propagation CTE over
      // the naive abs()-adjacency — proving both the shifted-key
      // decomposition AND the distributed CC agree with the
      // declarative spec. Cell stats, not raw points, flow into the
      // clustering: corpus-sized work is ONE groupBy.
      val cells = points(spark, dir)
        .select(expr(s"px div $R").as("cx"), expr(s"py div $R").as("cy"))
        .groupBy("cx", "cy").agg(count(lit(1)).as("cnt"))
      val tot = cells.agg(sum("cnt").as("n"), count(lit(1)).as("c"))
      val core = cells.crossJoin(broadcast(tot))
        .filter(col("cnt") * 5 * col("c") > col("n") * 6)
        .withColumn("cid", col("cx") * 100000L + col("cy"))
        .select("cid", "cx", "cy", "cnt")
      val nb = core
        .withColumn("dx", explode(sequence(lit(-1L), lit(1L))))
        .withColumn("dy", explode(sequence(lit(-1L), lit(1L))))
        .filter(!(col("dx") === 0L && col("dy") === 0L))
        .select((col("cx") + col("dx")).as("cx"),
          (col("cy") + col("dy")).as("cy"), col("cid").as("src_cid"))
      val edges = nb.join(
          core.select(col("cx"), col("cy"), col("cid").as("dst_cid")),
          Seq("cx", "cy"))
        .filter(col("src_cid") < col("dst_cid"))
        .select("src_cid", "dst_cid")
      val labels = Graph.connectedComponents(edges, "src_cid", "dst_cid")
      core.join(labels, core("cid") === labels("id"), "left")
        .select(col("cid"), col("cnt"),
          coalesce(col("component"), col("cid")).as("cluster"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_cells"), sum("cnt").as("n_points"))
        .orderBy("cluster")
    },

    "events_trip_stats" -> { (spark, dir) =>
      // Trip mining: per vehicle, consecutive reports ≤ 24 h apart form
      // one trip; a longer silence starts the next. Per trip: points,
      // duration, and total path length over the synthetic planar
      // track. ONE user-keyed exchange feeds the lag window, the trip
      // counter (running sum of gap flags), and the per-trip aggregate.
      // Determinism: each leg length is floor(sqrt(exact-int)·100 + .5)
      // — a correctly-rounded double quantized to centi-units BEFORE
      // the sum, so the per-trip total is an exact long fold, immune to
      // aggregation order (the float-sum trap Canon.scala documents).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      points(spark, dir)
        .withColumn("prev_ts", lag("ts_us", 1).over(w))
        .withColumn("prev_px", lag("px", 1).over(w))
        .withColumn("prev_py", lag("py", 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull
            || col("ts_us") - col("prev_ts") >= GapUs, 1L).otherwise(0L))
        .withColumn("trip_id", sum("is_new").over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .withColumn("leg_cu",
          when(col("is_new") === 1L, 0L).otherwise(
            floor(sqrt(
              ((col("px") - col("prev_px")) * (col("px") - col("prev_px"))
                + (col("py") - col("prev_py")) * (col("py") - col("prev_py")))
                .cast("double")) * 100 + 0.5).cast("long")))
        .groupBy("user_id", "trip_id")
        .agg(count(lit(1)).as("n_points"),
          max("ts_us").as("max_us"), min("ts_us").as("min_us"),
          (sum("leg_cu").cast("double") / 100.0).as("dist"))
        // `div` = exact long division (the `/` Column operator would go
        // through double, and DuckDB's double→BIGINT cast ROUNDS while
        // Spark's truncates — the one-off-at-.5s trap)
        .select(col("user_id"), col("trip_id"), col("n_points"),
          expr("(max_us - min_us) div 1000000").as("dur_s"), col("dist"))
        .orderBy("user_id", "trip_id")
    }
  )

  /** Coarse cell edge for the OD matrix: a 4×4 zone grid. */
  private val Zone = 250000L

  def queries2: Map[String, Q] = Map(
    "events_od_matrix" -> { (spark, dir) =>
      // Origin–destination matrix — the flow analytic on top of trip
      // mining (where do trips that start in zone A end?): same 24 h
      // gap segmentation as events_trip_stats, origin/destination =
      // first/last fix per trip via first/last window frames that ride
      // the SAME user exchange as the trip counter (no second
      // shuffle), then one coarse-zone groupBy. Flows, not positions,
      // leave the vehicle partition — the output is zone²-bounded at
      // any corpus size.
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wTrip = W.partitionBy("user_id", "trip_id")
        .orderBy("ts_us", "event_id")
      val full = wTrip.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
      points(spark, dir)
        .withColumn("prev_ts", lag("ts_us", 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull
            || col("ts_us") - col("prev_ts") >= GapUs, 1L).otherwise(0L))
        .withColumn("trip_id", sum("is_new").over(
          w.rowsBetween(W.unboundedPreceding, 0)))
        .withColumn("ox", first("px").over(full))
        .withColumn("oy", first("py").over(full))
        .withColumn("dx", last("px").over(full))
        .withColumn("dy", last("py").over(full))
        .groupBy(expr(s"ox div $Zone").as("o_zx"),
          expr(s"oy div $Zone").as("o_zy"),
          expr(s"dx div $Zone").as("d_zx"),
          expr(s"dy div $Zone").as("d_zy"))
        // each trip contributes its point count of identical rows;
        // count distinct trips via the (user, trip) key
        .agg(count_distinct(col("user_id"), col("trip_id")).as("n_trips"))
        .orderBy("o_zx", "o_zy", "d_zx", "d_zy")
    }
  )

  def oracle = Map(
    "geo_polygon_contain" ->
      // identical six integer cross products over the same CCW hexagon
      s"""WITH p AS ($pointsSql),
         |t AS (SELECT user_id,
         |    ((650000 - 800000) * (py - 500000)
         |       - (760000 - 500000) * (px - 800000) >= 0)
         |    AND ((350000 - 650000) * (py - 760000)
         |       - (760000 - 760000) * (px - 650000) >= 0)
         |    AND ((200000 - 350000) * (py - 760000)
         |       - (500000 - 760000) * (px - 350000) >= 0)
         |    AND ((350000 - 200000) * (py - 500000)
         |       - (240000 - 500000) * (px - 200000) >= 0)
         |    AND ((650000 - 350000) * (py - 240000)
         |       - (240000 - 240000) * (px - 350000) >= 0)
         |    AND ((800000 - 650000) * (py - 240000)
         |       - (500000 - 240000) * (px - 650000) >= 0) AS in_zone
         |  FROM p),
         |a AS (SELECT user_id, count(*) AS n_reports,
         |    CAST(sum(CASE WHEN in_zone THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_inside
         |  FROM t GROUP BY user_id),
         |f AS (SELECT *, CAST(n_inside AS DOUBLE)
         |    / CAST(n_reports AS DOUBLE) AS sh FROM a)
         |SELECT user_id, n_reports, n_inside,
         |  CAST(floor(sh * 1e6 + 0.5) / 1e6 AS DOUBLE) AS share_inside
         |FROM f ORDER BY user_id""".stripMargin,

    "events_od_matrix" ->
      s"""WITH p AS ($pointsSql),
         |l AS (SELECT *, lag(ts_us) OVER w AS prev_ts FROM p
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |f AS (SELECT *, CASE WHEN prev_ts IS NULL
         |      OR ts_us - prev_ts >= $GapUs THEN 1 ELSE 0 END AS is_new
         |  FROM l),
         |t AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trip_id
         |  FROM f),
         |e AS (SELECT *,
         |    first_value(px) OVER wt AS ox, first_value(py) OVER wt AS oy,
         |    last_value(px) OVER wt AS dx, last_value(py) OVER wt AS dy
         |  FROM t
         |  WINDOW wt AS (PARTITION BY user_id, trip_id
         |    ORDER BY ts_us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         |SELECT ox // $Zone AS o_zx, oy // $Zone AS o_zy,
         |  dx // $Zone AS d_zx, dy // $Zone AS d_zy,
         |  count(DISTINCT (user_id, trip_id)) AS n_trips
         |FROM e GROUP BY o_zx, o_zy, d_zx, d_zy
         |ORDER BY o_zx, o_zy, d_zx, d_zy""".stripMargin,

    "geo_grid_join" ->
      // the NAIVE quadratic form — proving the engine's grid-cell
      // decomposition returns exactly the true pair set
      s"""WITH p AS ($pointsSql), q AS ($poisSql),
         |d AS (SELECT p.event_id, q.poi_id,
         |    (p.px - q.qx) * (p.px - q.qx)
         |      + (p.py - q.qy) * (p.py - q.qy) AS d2
         |  FROM p CROSS JOIN q)
         |SELECT event_id, poi_id,
         |  CAST(floor(sqrt(CAST(d2 AS DOUBLE)) * 100 + 0.5) / 100
         |    AS DOUBLE) AS dist
         |FROM d WHERE d2 <= ${R * R}
         |ORDER BY event_id, poi_id""".stripMargin,

    "geo_nearest_poi" ->
      s"""WITH p AS ($pointsSql), q AS ($poisSql),
         |d AS (SELECT p.event_id, q.poi_id,
         |    (p.px - q.qx) * (p.px - q.qx)
         |      + (p.py - q.qy) * (p.py - q.qy) AS d2,
         |    row_number() OVER (PARTITION BY p.event_id
         |                       ORDER BY (p.px - q.qx) * (p.px - q.qx)
         |                         + (p.py - q.qy) * (p.py - q.qy),
         |                         q.poi_id) AS rn
         |  FROM p CROSS JOIN q)
         |SELECT event_id, poi_id,
         |  CAST(floor(sqrt(CAST(d2 AS DOUBLE)) * 100 + 0.5) / 100
         |    AS DOUBLE) AS dist
         |FROM d WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "geo_cluster_cells" ->
      // naive abs()-adjacency + recursive label propagation: the
      // declarative spec of the engine's shifted-key join + hash-min CC
      s"""WITH RECURSIVE p AS ($pointsSql),
         |cl AS (SELECT px // $R AS cx, py // $R AS cy, count(*) AS cnt
         |  FROM p GROUP BY cx, cy),
         |t AS (SELECT sum(cnt) AS n, count(*) AS c FROM cl),
         |core AS (SELECT cx, cy, cnt, cx * 100000 + cy AS cid
         |  FROM cl CROSS JOIN t WHERE cnt * 5 * c > n * 6),
         |e0 AS (SELECT a.cid AS src, b.cid AS dst FROM core a JOIN core b
         |  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
         |    AND a.cid <> b.cid),
         |r AS (SELECT cid AS id, cid AS lbl FROM core
         |  UNION
         |  SELECT e0.dst AS id, r.lbl FROM r JOIN e0 ON r.id = e0.src),
         |lab AS (SELECT id, min(lbl) AS cluster FROM r GROUP BY id)
         |SELECT lab.cluster, count(*) AS n_cells,
         |  CAST(sum(core.cnt) AS BIGINT) AS n_points
         |FROM core JOIN lab ON core.cid = lab.id
         |GROUP BY lab.cluster ORDER BY lab.cluster""".stripMargin,

    "events_trip_stats" ->
      s"""WITH p AS ($pointsSql),
         |l AS (SELECT *,
         |    lag(ts_us) OVER w AS prev_ts,
         |    lag(px) OVER w AS prev_px,
         |    lag(py) OVER w AS prev_py
         |  FROM p
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |f AS (SELECT *,
         |    CASE WHEN prev_ts IS NULL OR ts_us - prev_ts >= $GapUs
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM l),
         |t AS (SELECT *,
         |    sum(is_new) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trip_id,
         |    CASE WHEN is_new = 1 THEN 0
         |         ELSE CAST(floor(sqrt(CAST(
         |             (px - prev_px) * (px - prev_px)
         |               + (py - prev_py) * (py - prev_py) AS DOUBLE))
         |           * 100 + 0.5) AS BIGINT) END AS leg_cu
         |  FROM f)
         |SELECT user_id, CAST(trip_id AS BIGINT) AS trip_id,
         |  count(*) AS n_points,
         |  (max(ts_us) - min(ts_us)) // 1000000 AS dur_s,
         |  CAST(sum(leg_cu) AS DOUBLE) / 100.0 AS dist
         |FROM t GROUP BY user_id, trip_id
         |ORDER BY user_id, trip_id""".stripMargin
  )
}
