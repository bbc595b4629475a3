package graft.operators

import graft.{Canon, QueryGroup, Tables}
import org.apache.spark.sql.functions._

/** The reference's serving-tier queries, made explicit [RVI].
  *
  * PDXostc/rvi_big-data_api's analytic surface was: fetch a vehicle's
  * trace for a time range, per-vehicle summary statistics, and vehicle
  * enumeration (SURVEY.md §0.3, §1.3 — `user_id` ↔ VIN, `ts` ↔ report
  * time, `value` ↔ signal value). The generalized forms live across
  * groups A–J; these three are the literal endpoint shapes.
  *
  * Scale notes: the trace query is the canonical pushdown case — the
  * user-set and time-range predicates reach the parquet reader
  * (PushedFilters), which on a ts-partitioned 100 TB store becomes
  * partition pruning + row-group skipping; the per-entity summary is one
  * partial-agg shuffle keyed by the entity id.
  */
object Telemetry extends QueryGroup {

  /** 2024-01-10 .. 2024-01-20 in epoch-µs (events span ~30 days). */
  private val FromUs = 1704844800000000L
  private val ToUs = 1705708800000000L

  def queries = Map(
    "events_trace" -> { (spark, dir) =>
      // time-range trace fetch for a set of entities — THE reference
      // endpoint (vin + from + to), canonicalized to epoch-µs.
      // Predicates go on the RAW ts column via Tables.tsRange (constant
      // of ts's own physical type) so they push into the parquet scan —
      // filtering the derived ts_us expression would not.
      val ev = Tables.events(spark, dir)
      ev.filter(col("user_id").isin(1L, 2L, 3L)
          && Tables.tsRange(ev, FromUs, ToUs))
        .select("user_id", "ts_us", "event_id", "event_type", "value")
        .orderBy("user_id", "ts_us", "event_id")
    },

    "events_bbox" -> { (spark, dir) =>
      // the reference's geo "bounding box for map display", generalized:
      // the fixtures carry no lat/lon (SURVEY.md §2 note), so the box is
      // a 2D range on the two continuous telemetry axes (time × signal
      // value). Both predicates push to the scan; at 100 TB with
      // ts-partitioned layout the time edge becomes partition pruning.
      val ev = Tables.events(spark, dir)
      ev.filter(Tables.tsRange(ev, FromUs, ToUs)
          && col("value") >= 20.0 && col("value") < 60.0)
        .select("user_id", "ts_us", "event_id", "event_type", "value")
        .orderBy("user_id", "ts_us", "event_id")
    },

    "events_downsample" -> { (spark, dir) =>
      // the reference's map-display downsampling: every 10th report per
      // vehicle in (ts, event_id) order. One window shuffle keyed by the
      // entity — at 100 TB the partitionBy(user_id) hash exchange is the
      // only data movement; no global sort until the final output order.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(spark, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter((col("rn") - 1) % 10 === 0)
        .select("user_id", "ts_us", "event_id", "value", "rn")
        .orderBy("user_id", "rn")
    },

    "events_user_summary" -> { (spark, dir) =>
      // per-vehicle summary statistics (report count, channel spread,
      // activity span, mean/max signal value)
      Tables.events(spark, dir)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          min(col("ts_us")).as("first_us"),
          max(col("ts_us")).as("last_us"),
          Canon.meanOf(col("value")).as("avg_value"),
          Canon.round4(max(col("value"))).as("max_value"))
        .orderBy("user_id")
    },

    "events_heatmap" -> { (spark, dir) =>
      // the dashboard activity heatmap: day-of-week × hour-of-day event
      // counts + distinct vehicles. Bucket indices via pure integer
      // arithmetic on epoch-µs (epoch day 0 = Thursday; +4 mod 7 puts
      // Sunday at 0) — identical on any engine, immune to the
      // dayofweek()/dow() numbering and timezone mismatches between
      // engines. One partial+final agg over a 7×24 key space: map-side
      // combine reduces every partition to ≤ 168 rows regardless of
      // input size.
      Tables.events(spark, dir)
        .select(
          // `div` = integer division on longs (the `/` Column operator
          // is DOUBLE division — a rounding hazard on epoch-µs values)
          expr("(ts_us div 86400000000 + 4) % 7").as("dow"),
          expr("(ts_us % 86400000000) div 3600000000").as("hour"),
          col("user_id"))
        .groupBy("dow", "hour")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"))
        .orderBy("dow", "hour")
    },

    "events_distinct_users" -> { (spark, dir) =>
      // vehicle enumeration (distinct VINs), with first-seen timestamp
      Tables.events(spark, dir)
        .groupBy("user_id")
        .agg(min(col("ts_us")).as("first_seen_us"))
        .orderBy("user_id")
    },

    "events_gini" -> { (spark, dir) =>
      // Distribution-diversity report: Gini impurity of the payload
      // key per event type (1 − Σp² — the split-quality measure, and
      // the log-free diversity statistic: entropy would drag libm ln
      // into the hash compare, impurity is pure rational arithmetic).
      // Two hash aggregates — (type, k) counts, then per-type Σc² as
      // exact longs — and ONE double division at the end; output is
      // ≤|event types| rows at any corpus size.
      val k = from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k")
      Tables.events(spark, dir)
        .select(col("event_type"), k.as("k"))
        .groupBy("event_type", "k")
        .agg(count(lit(1)).as("c"))
        .groupBy("event_type")
        .agg(sum(col("c")).as("n"),
          count(lit(1)).as("n_distinct_k"),
          sum(col("c") * col("c")).as("sc2"))
        .select(col("event_type"), col("n"), col("n_distinct_k"),
          Canon.round6(lit(1.0) - col("sc2").cast("double")
            / (col("n") * col("n"))).as("gini"))
        .orderBy("event_type")
    },

    "events_changepoint" -> { (spark, dir) =>
      // CUSUM change-point detection per vehicle: the point where the
      // cumulative deviation from the vehicle's own mean peaks — the
      // classic single-changepoint locator (regime shift / sensor
      // drift onset) behind telemetry drift monitors. Determinism by
      // INTEGER arithmetic throughout: values enter as exact cents,
      // and the mean division is eliminated by scaling the CUSUM by n
      // (n·Σ_{j≤i}c_j − i·Σc — a first decimal-cast draft lost one
      // sf0.1 row to a double→decimal boundary; integers cannot).
      // |scaled CUSUM| ranks exactly, ties break by (ts, event), and
      // only the REPORTED value divides back down — one IEEE division
      // of exact operands. ONE user_id exchange serves all windows
      // (totals, running sum, argmax rank); one row per vehicle out.
      val W = org.apache.spark.sql.expressions.Window
      val wAll = W.partitionBy("user_id")
      val wRun = W.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      val wRank = W.partitionBy("user_id")
        .orderBy(abs(col("cusum_scaled")).desc, col("ts_us"), col("event_id"))
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
        .withColumn("c", cents)
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("s", sum(col("c")).over(wAll))
        .withColumn("run", sum(col("c")).over(wRun))
        .withColumn("i", row_number().over(
          W.partitionBy("user_id").orderBy("ts_us", "event_id")).cast("long"))
        .withColumn("cusum_scaled", col("n") * col("run") - col("i") * col("s"))
        .withColumn("rk", row_number().over(wRank))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("ts_us").as("cp_ts_us"),
          col("event_id").as("cp_event"),
          Canon.round4(col("cusum_scaled").cast("double")
            / (col("n") * lit(100.0))).as("peak_cusum"))
        .orderBy("user_id")
    },

    "events_drawdown" -> { (spark, dir) =>
      // Maximum drawdown per vehicle — the running-peak-to-trough drop
      // (finance's risk metric, equally at home on battery capacity or
      // signal health): dd_t = runmax(value) − value, max over t, with
      // the EARLIEST trough hitting that max. Integer cents throughout
      // ⇒ the argmax tie-break is exact; two frames + the final argmin
      // share ONE user exchange, then a broadcast join of the |users|
      // max table picks the trough rows.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      val dd = Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          cents.as("c"))
        .withColumn("runmax", max("c").over(w))
        .withColumn("dd", col("runmax") - col("c"))
      val mx = dd.groupBy("user_id").agg(max("dd").as("max_dd"))
      dd.join(broadcast(mx), "user_id")
        .filter(col("dd") === col("max_dd"))
        .groupBy("user_id")
        .agg(min("ts_us").as("trough_us"), first("max_dd").as("mdd"))
        .select(col("user_id"),
          (col("mdd").cast("double") / 100.0).as("max_dd"),
          col("trough_us"))
        .orderBy("user_id")
    },

    "events_bursts" -> { (spark, dir) =>
      // Burst episodes — fleet-wide traffic spikes: hourly event counts,
      // hours above mean + 2σ (exact integer moments over the ≤|hours|
      // aggregate → one fixed-order threshold expression), adjacent
      // burst hours merged into episodes via the islands trick. The
      // corpus collapses to the hourly grid FIRST (one groupBy), so
      // every window below runs over ≤ |hours| rows — the two-phase
      // pattern, never a raw-row global window.
      val HourUs = 3600000000L
      val hours = Tables.events(spark, dir)
        .select(expr(s"ts_us div $HourUs").as("h"))
        .groupBy("h").agg(count(lit(1)).as("n"))
      val stats = hours.agg(count(lit(1)).as("k"),
        sum("n").as("s1"), sum(col("n") * col("n")).as("s2"))
      val W = org.apache.spark.sql.expressions.Window
      val wOrd = W.orderBy("h")
      val flagged = hours.crossJoin(broadcast(stats))
        .withColumn("mean", col("s1").cast("double") / col("k"))
        .withColumn("sd", sqrt(
          (col("s2").cast("double") - col("s1").cast("double")
            * col("s1").cast("double") / col("k")) / col("k")))
        .filter(col("n").cast("double") > col("mean") + lit(2.0) * col("sd"))
      flagged
        .withColumn("prev_h", lag("h", 1).over(wOrd))
        .withColumn("is_new",
          when(col("prev_h").isNull || col("h") - col("prev_h") > 1, 1L)
            .otherwise(0L))
        .withColumn("ep", sum("is_new").over(
          wOrd.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("ep")
        .agg((min("h") * HourUs).as("start_us"),
          ((max("h") + 1) * HourUs).as("end_us"),
          count(lit(1)).as("n_hours"), max("n").as("peak"))
        .orderBy("ep")
    },

    "events_benford" -> { (spark, dir) =>
      // First-digit (Benford) audit — the data-forensics screen for
      // fabricated or unit-broken telemetry: observed leading-digit
      // shares of the signal value against Benford expectations. The
      // nine expected probabilities log₁₀(1+1/d) are FIXED LITERALS
      // (pre-computed once, identical bytes in both engines), so no
      // transcendental ever evaluates in the hash path; counts are
      // exact longs, and each digit's deviation is one fixed-order
      // expression. One groupBy over the facts.
      val benford = Map(1 -> 0.301029995663981, 2 -> 0.176091259055681,
        3 -> 0.124938736608300, 4 -> 0.096910013008056,
        5 -> 0.079181246047625, 6 -> 0.066946789630613,
        7 -> 0.057991946977687, 8 -> 0.051152522447381,
        9 -> 0.045757490560675)
      val expCol = benford.foldLeft(lit(0.0)) { case (acc, (d, p)) =>
        when(col("d1") === d, lit(p)).otherwise(acc)
      }
      val digits = Tables.events(spark, dir)
        // leading digit computed on integer CENTS (scaling by 10^k
        // preserves it) via a bounded div ladder — engine-string
        // rendering and log10 both stay out of the hash path
        .select(floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .filter(col("c") >= 1)
        .withColumn("d1", expr(
          """CASE WHEN c >= 10000 THEN c div 10000
            |     WHEN c >= 1000 THEN c div 1000
            |     WHEN c >= 100 THEN c div 100
            |     WHEN c >= 10 THEN c div 10
            |     ELSE c END""".stripMargin).cast("int"))
        .groupBy("d1").agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum("n").as("nt"))
      digits.crossJoin(broadcast(tot))
        .withColumn("expected", expCol)
        .select(col("d1"), col("n"),
          Canon.round6(col("n").cast("double") / col("nt")).as("observed"),
          col("expected"),
          Canon.round6(col("n").cast("double") / col("nt")
            - expCol).as("deviation"))
        .orderBy("d1")
    },

    "events_autocorr" -> { (spark, dir) =>
      // Lag-1 autocorrelation per vehicle — the time-series memory
      // diagnostic (white noise ≈ 0; a drifting or oscillating sensor
      // shows structure): Pearson r between consecutive readings.
      // The events_trend numeric discipline: all five pair moments
      // accumulate in EXACT decimal over (prev, cur) cent pairs, cast
      // to double once, one closed-form expression. One user exchange
      // shared by the lag window and the aggregate.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val dec = org.apache.spark.sql.types.DecimalType(18, 0)
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          cents.as("c"))
        .withColumn("p", lag("c", 1).over(w))
        .filter(col("p").isNotNull)
        .select(col("user_id"), col("c").cast(dec).as("x"),
          col("p").cast(dec).as("y"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("user_id"), col("n"),
          Canon.round6(
            (col("n") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"))
            / sqrt((col("n") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double"))
              * (col("n") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))))
            .as("acf1"))
        .orderBy("user_id")
    },

    "events_gap_hist" -> { (spark, dir) =>
      // Inter-report gap distribution — the cadence-health histogram
      // behind events_cadence's summary stats and events_gap_report's
      // alerts: every consecutive-report gap bucketed by integer µs
      // thresholds (≤5 min, ≤30 min, ≤2 h, ≤12 h, ≤48 h, >48 h), with
      // counts and shares. One lag window over one user exchange, then
      // a 6-row aggregate; shares divide exact longs once.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val gaps = Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"))
        .withColumn("gap", col("ts_us") - lag("ts_us", 1).over(w))
        .filter(col("gap").isNotNull)
        .withColumn("bucket",
          when(col("gap") <= 300000000L, "a_le5m")
            .when(col("gap") <= 1800000000L, "b_le30m")
            .when(col("gap") <= 7200000000L, "c_le2h")
            .when(col("gap") <= 43200000000L, "d_le12h")
            .when(col("gap") <= 172800000000L, "e_le48h")
            .otherwise("f_gt48h"))
      val tot = gaps.agg(count(lit(1)).as("nt"))
      gaps.groupBy("bucket").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("n"),
          Canon.round6(col("n").cast("double") / col("nt")).as("share"))
        .orderBy("bucket")
    },

    "events_gap_report" -> { (spark, dir) =>
      // Silence windows — the complement of events_coverage: every gap
      // of ≥ 48 h between consecutive reports of a vehicle, with its
      // bounds. THE fleet-ops alert ("vehicle dark for two days"); one
      // lag window over one user exchange, integer µs throughout.
      val Silence = 172800000000L // 48 h
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"))
        .withColumn("prev_ts", lag("ts_us", 1).over(w))
        .filter(col("prev_ts").isNotNull
          && col("ts_us") - col("prev_ts") >= Silence)
        .select(col("user_id"), col("prev_ts").as("dark_from_us"),
          col("ts_us").as("dark_to_us"),
          expr("(ts_us - prev_ts) div 1000000").as("gap_s"))
        .orderBy("user_id", "dark_from_us")
    },

    "events_outliers_mad" -> { (spark, dir) =>
      // Robust per-vehicle outliers: |x − median| > 3·MAD — the
      // median/MAD rule that shrugs off the very outliers that corrupt
      // a z-score's own baseline (events_anomaly is the moment-based
      // sibling). EXACT integer algebra throughout: with cents c and
      // twoMid(xs) = the sum of the two middle order statistics
      // (= 2·median exactly, odd or even n), d = |2c − med2| = 2·|c−med|
      // and mad2 = twoMid(d) = 4·MAD — the flag |c−med| > 3·MAD
      // becomes the INTEGER comparison
      // 2·d > 3·mad2 — no float ever enters the decision, so the
      // flagged set is bit-deterministic in any engine. Per-vehicle
      // arrays are history-bounded (collect_list per key, the
      // win_rolling_median precedent); stats join back broadcast.
      def twoMid(arr: org.apache.spark.sql.Column) = {
        val n = size(arr)
        element_at(arr, ((n - 1) / lit(2) + 1).cast("int"))
          .+(element_at(arr, (n / lit(2) + 1).cast("int")))
      }
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("value"), cents.as("c"))
      val med = ev.groupBy("user_id")
        .agg(sort_array(collect_list("c")).as("arr"))
        .select(col("user_id"), twoMid(col("arr")).as("med2"))
      val withD = ev.join(broadcast(med), "user_id")
        .withColumn("d", abs(col("c") * 2 - col("med2")))
      val mad = withD.groupBy("user_id")
        .agg(sort_array(collect_list("d")).as("darr"))
        .select(col("user_id"), twoMid(col("darr")).as("mad2"))
      withD.join(broadcast(mad), "user_id")
        .filter(col("d") * 2 > col("mad2") * 3)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"),
          (col("med2").cast("double") / 200.0).as("median"),
          (col("mad2").cast("double") / 400.0).as("mad"))
        .orderBy("user_id", "ts_us", "event_id")
    },

    "events_coverage" -> { (spark, dir) =>
      // Connected-time coverage: each report keeps a vehicle "online"
      // for 30 min; overlapping windows merge (interval UNION, the
      // uptime/SLA metric distinct from raw counts). Sweep-line per
      // vehicle: an interval starts an island iff its start exceeds the
      // running max of all previous ends — two window passes over ONE
      // user_id exchange (running max, then running island count), then
      // a per-island extent and a per-vehicle sum. All integer µs —
      // exact at any aggregation order. At 100 TB: the exchange is the
      // only data movement, islands never leave their key partition.
      val Hold = 1800000000L // 30 min in µs
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val wPrev = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wRun = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          (col("ts_us") + Hold).as("end_us"))
        .withColumn("max_prev_end", max("end_us").over(wPrev))
        .withColumn("is_new",
          when(col("max_prev_end").isNull
            || col("ts_us") > col("max_prev_end"), 1L).otherwise(0L))
        .withColumn("island", sum("is_new").over(wRun))
        .groupBy("user_id", "island")
        .agg(min("ts_us").as("s_us"), max("end_us").as("e_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("e_us") - col("s_us")).as("covered_us"))
        // `div` = exact long division (the `/` operator would round-trip
        // through double and DuckDB's double→BIGINT cast ROUNDS)
        .select(col("user_id"), col("n_islands"),
          expr("covered_us div 1000000").as("covered_s"))
        .orderBy("user_id")
    },

    "events_profile_drift" -> { (spark, dir) =>
      // Behavioral DRIFT detector: does this week's (dow × event_type)
      // activity profile differ from last week's? The monitoring check
      // behind "did the fleet's usage pattern shift?" — a chi-square
      // distance between the first and second half of the timeline's
      // weekly profiles. Corpus → (half, dow, type) grid in ONE
      // groupBy; expected counts and per-cell contributions are
      // rational in integer totals, nano-quantized before the
      // cross-cell fold (the stat_chisq discipline) so the sum is
      // exact integer addition. Output: one drift row.
      val DayUs = 86400000000L
      val ev = Tables.events(spark, dir)
      val bounds = ev.agg(min("ts_us").as("lo"), max("ts_us").as("hi"))
      val cells = ev.crossJoin(broadcast(bounds))
        .select(
          when(col("ts_us") < expr("(lo + hi) div 2"), 0L)
            .otherwise(1L).as("half"),
          expr(s"pmod(ts_us div $DayUs, 7)").as("dow"),
          col("event_type"))
        .groupBy("half", "dow", "event_type").agg(count(lit(1)).as("o"))
      val rows = cells.groupBy("half").agg(sum("o").as("rt"))
      val cols_ = cells.groupBy("dow", "event_type").agg(sum("o").as("ct"))
      val n = cells.agg(sum("o").as("nt"))
      cells.join(broadcast(rows), "half")
        .join(broadcast(cols_), Seq("dow", "event_type"))
        .crossJoin(broadcast(n))
        .withColumn("e", col("rt").cast("double") * col("ct").cast("double")
          / col("nt").cast("double"))
        .withColumn("contrib_nano",
          floor((col("o") - col("e")) * (col("o") - col("e")) / col("e")
            * 1e9 + 0.5).cast("long"))
        .agg(count(lit(1)).as("n_cells"),
          Canon.round6(sum("contrib_nano").cast("double") / 1e9)
            .as("chisq_drift"),
          first(col("nt")).as("n"))
        .select(col("chisq_drift"), col("n_cells"), col("n"))
    },

    "events_state_dwell" -> { (spark, dir) =>
      // TIME-IN-STATE: treating each event as entering a state that
      // lasts until the user's next event, the fleet's dwell profile
      // per state — interval count, total and mean dwell. The ops view
      // behind "how long do vehicles sit in 'error' vs 'view'?". One
      // user-keyed exchange feeds the lead() frame; the last event of
      // each user has no successor and drops out (no fabricated dwell).
      // Dwells stay exact µs longs; the mean is one final division.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("next_us", lead("ts_us", 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("dwell_us", col("next_us") - col("ts_us"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum("dwell_us").as("total_dwell_us"))
        .select(col("event_type"), col("n_intervals"), col("total_dwell_us"),
          Canon.round6(col("total_dwell_us").cast("double")
            / col("n_intervals")).as("avg_dwell_us"))
        .orderBy("event_type")
    },

    "events_top_movers" -> { (spark, dir) =>
      // Day-over-day TOP MOVERS — the dashboard tile behind every
      // "what changed yesterday?" triage: per (day, event_type) signal
      // totals in exact integer cents, the previous day's total via one
      // lag over the per-type series, ranked by absolute delta, top 10.
      // Scale: the corpus collapses to the (day × type) grid in one
      // map-side-combined groupBy; the lag window and the final rank
      // run on ≤|days|·|types| rows, and the top-10 compiles to
      // TakeOrderedAndProject. Deltas stay exact longs end to end.
      val DayUs = 86400000000L
      val ev = Tables.events(spark, dir)
      val daily = ev
        .select(expr(s"ts_us div $DayUs").as("day"), col("event_type"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .groupBy("day", "event_type").agg(sum("cents").as("tot"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
      daily
        .withColumn("prev", lag("tot", 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("delta", col("tot") - col("prev"))
        .select(col("day"), col("event_type"), col("tot"), col("prev"),
          col("delta"))
        .orderBy(abs(col("delta")).desc, col("day"), col("event_type"))
        .limit(10)
    },

    "events_stl_lite" -> { (spark, dir) =>
      // Seasonal-trend decomposition (STL-lite: one pass, no loess) of
      // the daily signal-total series — trend = centered 7-day moving
      // average, seasonal = mean detrended value per weekly phase,
      // residual = the rest. The anomaly-triage view: "is today's spike
      // trend, weekday pattern, or actually anomalous?" Exactness: daily
      // totals are integer CENTS; the 7-day trend sum and the 7·total −
      // Σ7 detrended value stay exact longs (×7 avoids division), the
      // per-phase seasonal mean and residual are each ONE fixed-order
      // IEEE expression over those longs. Scale: the corpus collapses to
      // the day grid in one map-side-combined groupBy; every window/join
      // after runs on ≤|days| rows (the two-phase discipline) with the
      // 7-row phase table broadcast.
      val DayUs = 86400000000L
      val ev = Tables.events(spark, dir)
      val daily = ev
        .select(expr(s"ts_us div $DayUs").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .groupBy("day").agg(sum("cents").as("tot"))
      val w7 = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(-3, 3)
      val trended = daily
        .withColumn("sum7", sum("tot").over(w7))
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("det_x7",
          when(col("n7") === 7, lit(7L) * col("tot") - col("sum7")))
        .withColumn("phase", expr("day % 7"))
      val seasonal = trended.filter(col("det_x7").isNotNull)
        .groupBy("phase")
        .agg((sum("det_x7").cast("double") / count(lit(1))
          / 7.0d).as("seas_raw"))
      trended.join(broadcast(seasonal), Seq("phase"), "left")
        .select(col("day"), col("phase"), col("tot"),
          Canon.round6(when(col("n7") === 7,
            col("sum7").cast("double") / 7.0d)).as("trend"),
          Canon.round6(col("seas_raw")).as("seasonal"),
          Canon.round6(col("det_x7").cast("double") / 7.0d
            - col("seas_raw")).as("resid"))
        .orderBy("day")
    },

    "events_trend" -> { (spark, dir) =>
      // Per-vehicle signal DRIFT: least-squares slope of value over
      // seconds-since-first-report — the fleet-health regression every
      // telemetry backend runs (a drifting sensor shows up as |slope|).
      // Numeric policy: the five regression sums accumulate in EXACT
      // decimal with tight types (x ≤ ~2.6e6 s fits DECIMAL(10,0);
      // products stay inside precision 38 with zero loss), each sum is
      // cast to double ONCE, and the closed-form slope combines those
      // five doubles — scalar IEEE arithmetic, identical in any engine.
      // Shape: one (user) exchange shared by the min-ts window and the
      // final agg; at 100 TB this is a single keyed partial+final agg
      // after a per-key min broadcast-back — no row ever leaves its
      // user partition twice.
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val decX = org.apache.spark.sql.types.DecimalType(10, 0)
      val decY = org.apache.spark.sql.types.DecimalType(18, 6)
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("value"))
        .withColumn("dx", col("ts_us") - min("ts_us").over(w))
        // `div` = exact integer division on longs (the `/` Column
        // operator would go through double)
        .withColumn("x", expr("dx div 1000000"))
        .select(col("user_id"), col("x").cast(decX).as("xd"),
          col("value").cast(decY).as("yd"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("xd")).as("sx"), sum(col("yd")).as("sy"),
          sum(col("xd") * col("yd")).as("sxy"),
          sum(col("xd") * col("xd")).as("sxx"))
        .select(col("user_id"), col("n"),
          Canon.round6(
            when(col("n") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double") > 0,
              (col("n") * col("sxy").cast("double")
                - col("sx").cast("double") * col("sy").cast("double"))
                / (col("n") * col("sxx").cast("double")
                  - col("sx").cast("double") * col("sx").cast("double")))
              .otherwise(lit(0.0))).as("slope_per_s"))
        .orderBy("user_id")
    },

    "events_theilsen" -> { (spark, dir) =>
      // THEIL–SEN robust drift, INCOMPLETE form (Theil's original
      // pairing) — the median-of-pairwise-slopes twin of events_trend's
      // least squares, immune to the single stuck-sensor spike that
      // drags an LS slope. The r7 verdict marked the complete Σ
      // per-vehicle n² pair join weak at 100 TB (per-entity n grows
      // with history length; complete Theil–Sen is quadratic per block
      // BY DEFINITION), so the DECLARED query is now the scale-safe
      // incomplete estimator: order each vehicle's readings by
      // (ts, event_id), pair reading i with reading i + ⌈n/2⌉ — a
      // DETERMINISTIC n/2-pair set both engines state identically (no
      // RNG, no hash salt to keep in sync), the maximal-spread variant
      // Theil proposed, with the same √n-consistent slope and ~29%
      // breakdown on the sampled pairs. Shape: ONE user_id exchange
      // feeds row_number + per-vehicle count, then the pairing is a
      // self-EQUI-join on (user_id, rn+h)=(user_id, rn) — linear rows
      // in, linear pairs out, never n². Each slope is ONE IEEE division
      // of exact operands (dx as double µs/1e6 — NOT integer-truncated:
      // a sub-second gap would div to zero and poison the median; ts
      // ties are dropped by the strict tb > ta guard on both engines);
      // the even-count median interpolates (a+b)/2 identically.
      // TheilSenSpec certifies the estimator against the complete
      // gold-standard form at sf0.001 (median |Δslope| and sign
      // agreement), keeping the exact n² variant as a calibration
      // check in the test suite — not a declared query.
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
      val base = Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(wOrd))
        // h = n div 2 (count/2 is double-exact below 2^52 rows/vehicle;
        // the long cast truncates = floor on the positive count)
        .withColumn("h",
          (count(lit(1)).over(wAll) / lit(2)).cast("long"))
      val a = base.select(col("user_id"),
        (col("rn").cast("long") + col("h")).as("rn_b"),
        col("ts_us").as("ta"), col("value").as("va"))
      val b = base.select(col("user_id"), col("rn").cast("long").as("rn_b"),
        col("ts_us").as("tb"), col("value").as("vb"))
      a.join(b, Seq("user_id", "rn_b"))
        .filter(col("tb") > col("ta"))
        .select(col("user_id"),
          ((col("vb") - col("va"))
            / (expr("CAST(tb - ta AS DOUBLE)") / lit(1000000.0d)))
            .as("slope"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          Canon.round6(expr("percentile(slope, 0.5)")).as("theil_slope"))
        .orderBy("user_id")
    },

    "events_peaks" -> { (spark, dir) =>
      // LOCAL-MAXIMA detection per vehicle — the spike inventory a
      // telemetry backend feeds to alerting: an interior reading is a
      // peak when its value strictly exceeds both neighbors on each
      // side (w=2) and rises ≥ 5.00 units over the higher shoulder
      // (the prominence floor that kills sensor jitter). INTEGER
      // arithmetic throughout: cents via the canonical floor(x·100+½),
      // neighbor maxes and prominence are exact longs, so both engines
      // agree bit-for-bit with zero float comparisons. Edge readings
      // (fewer than 2 neighbors a side) are not peaks by definition —
      // the four-lag existence guard, identical in the oracle. Plan:
      // ONE user_id exchange feeds all four lag/lead columns (a single
      // in-partition sort by (ts, event_id)); linear in events.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val c = floor(col("value") * 100 + 0.5).cast("long")
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), c.as("c"))
        .withColumn("p1", lag("c", 1).over(w))
        .withColumn("p2", lag("c", 2).over(w))
        .withColumn("n1", lead("c", 1).over(w))
        .withColumn("n2", lead("c", 2).over(w))
        .filter(col("p1").isNotNull && col("p2").isNotNull &&
          col("n1").isNotNull && col("n2").isNotNull)
        .withColumn("shoulder",
          greatest(col("p1"), col("p2"), col("n1"), col("n2")))
        .filter(col("c") > col("shoulder") &&
          col("c") - col("shoulder") >= 500)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          (col("c").cast("double") / 100).as("value"),
          ((col("c") - col("shoulder")).cast("double") / 100)
            .as("prominence"))
        .orderBy("user_id", "ts_us", "event_id")
    },

    "events_twap" -> { (spark, dir) =>
      // TIME-weighted average — the sampling-robust mean every telemetry
      // and market-data backend pairs with the count-weighted one: per
      // (vehicle, day), Σ valueᵢ·Δtᵢ / Σ Δtᵢ under piecewise-constant
      // hold-to-next within the day (the last reading of a day holds
      // nothing — no synthetic extrapolation enters the statistic). A
      // vehicle reporting 100× faster while idle no longer drags the
      // mean; the plain avg would. Numerics: value is exact CENTS
      // (integral ×100 in the fixture), Δt exact µs, each term
      // cents·Δt ≤ 5e4·8.6e10 ≈ 4e15 — the day sum stays inside
      // DECIMAL(38,0) with zero loss; ONE double division at the end.
      // Shape: lead() and the day agg share the (user, day) exchange —
      // no second shuffle.
      val DayUs = 86400000000L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "day").orderBy("ts_us", "event_id")
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          expr(s"ts_us div $DayUs").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .withColumn("dt", lead("ts_us", 1).over(w) - col("ts_us"))
        .filter(col("dt").isNotNull)
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_holds"),
          sum(col("dt")).as("span_us"),
          sum((col("cents") * col("dt"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("wsum"))
        .select(col("user_id"), col("day"), col("n_holds"), col("span_us"),
          Canon.round6(col("wsum").cast("double")
            / col("span_us").cast("double") / 100.0d).as("twap"))
        .orderBy("user_id", "day")
    },

    "events_ohlc" -> { (spark, dir) =>
      // Candlestick compaction: per (vehicle, hour) open/high/low/close
      // of the signal — the canonical telemetry downsample for charting
      // long time ranges. Open/close are picked by deterministic
      // (ts_us, event_id) order so equal-timestamp ties cannot flip
      // them cross-engine. Shape: both row_number windows and the final
      // aggregate key on (user_id, hr), so ONE hash exchange feeds two
      // in-partition sorts and a map-side-combinable agg; at 100 TB the
      // exchange carries each row once and output is bounded by
      // |entities| × |hours|. Values pass through min/max/pick only —
      // no float arithmetic, so raw doubles are hash-safe.
      val HourUs = 3600000000L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "hr")
      Tables.events(spark, dir)
        .withColumn("hr", expr(s"ts_us div $HourUs * $HourUs"))
        .withColumn("rn_a",
          row_number().over(w.orderBy(col("ts_us"), col("event_id"))))
        .withColumn("rn_d",
          row_number().over(w.orderBy(col("ts_us").desc, col("event_id").desc)))
        .groupBy("user_id", "hr")
        .agg(count(lit(1)).as("n"),
          max(when(col("rn_a") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"))
        .orderBy("user_id", "hr")
    },

    "events_cadence" -> { (spark, dir) =>
      // Reporting-cadence health: the distribution of gaps between a
      // vehicle's consecutive reports of the SAME signal type — the
      // fleet check that finds silent sensors (p99 gap ≫ expected
      // cadence) before they become data loss. One (user, type) window
      // exchange derives the lag gaps; the exact percentile aggregate
      // (cross-engine interpolation parity proven at agg_percentile)
      // reduces to ≤|event types| rows. At 100 TB: one keyed exchange,
      // one agg — and the per-type output is serving-layer sized.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
      val probes = "array(0.5D, 0.9D, 0.99D)"
      // r14: 64k-floor child session — lag window + exact-percentile
      // map over a byte-small exchange; the 1m default serializes it
      // (+0.19-0.32 s in all three 32c A/B pairs —
      // [[QueryGroup.cpuDenseSession]])
      Tables.events(graft.QueryGroup.cpuDenseSession(spark), dir)
        .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          // cast to double BEFORE the percentile so both engines
          // interpolate the same operand type (gaps < 2^53: exact)
          expr(s"percentile(cast(gap_us as double), $probes)").as("p"))
        .select(col("event_type"), col("n_gaps"),
          element_at(col("p"), 1).as("p50_us"),
          element_at(col("p"), 2).as("p90_us"),
          element_at(col("p"), 3).as("p99_us"))
        .orderBy("event_type")
    },

    "events_resample_lerp" -> { (spark, dir) =>
      // Regular-grid resampling with LINEAR interpolation — the
      // time-series alignment step before any cross-vehicle join or
      // model feature build (irregular telemetry → one value per
      // vehicle per day boundary). Both bracketing neighbors come from
      // ONE user-keyed window pass: anchors and grid rows union under a
      // total order (t, is_grid, tie) where same-instant anchors sort
      // BEFORE their grid row, so the backward frame's last-non-null is
      // the ≤t anchor and the forward frame's first-non-null the >t one
      // (exactly-on-grid events ⇒ fraction 0 ⇒ the event's own value).
      // Spark plans all four IGNORE-NULLS frames in a single WindowExec
      // (one exchange + one sort — same partitioning+ordering). Grid
      // size is bounded by per-user day span, never event count; the
      // lerp is scalar IEEE arithmetic on exact integer-µs operands —
      // identical cross-engine. Grid rows use a sentinel tie id (no
      // null ordering: Spark sorts nulls FIRST, DuckDB LAST — a silent
      // cross-engine divergence if ties ever ordered by a null column).
      val day = 86400000000L
      // r14: 64k-floor child session — four IGNORE-NULLS frames in one
      // WindowExec on a byte-small exchange; the 1m default serializes
      // it (+0.43-0.52 s in all three 32c A/B pairs —
      // [[QueryGroup.cpuDenseSession]])
      val ev = Tables.events(graft.QueryGroup.cpuDenseSession(spark), dir)
        .select(col("user_id"), col("ts_us").as("t"),
          col("value").as("v"), col("event_id").as("tie"))
      val grid = ev.groupBy("user_id")
        .agg(min("t").as("mn"), max("t").as("mx"))
        .filter(expr(s"(mn + ${day - 1}) div $day") <= expr(s"mx div $day"))
        .select(col("user_id"), explode(sequence(
          expr(s"(mn + ${day - 1}) div $day"),
          expr(s"mx div $day"))).as("d"))
      val u = ev.select(col("user_id"), col("t"), col("v"),
          lit(0).as("isg"), col("tie"))
        .unionAll(grid.select(col("user_id"), (col("d") * day).as("t"),
          lit(null).cast("double").as("v"),
          lit(1).as("isg"), lit(Long.MaxValue).as("tie")))
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("t", "isg", "tie")
      val back = ord.rowsBetween(Long.MinValue, 0)
      val fwd = ord.rowsBetween(0, Long.MaxValue)
      val anchorT = when(col("isg") === 0, col("t"))
      val anchorV = when(col("isg") === 0, col("v"))
      u.select(col("user_id"), col("t"), col("isg"),
          last(anchorT, ignoreNulls = true).over(back).as("t0"),
          last(anchorV, ignoreNulls = true).over(back).as("v0"),
          first(anchorT, ignoreNulls = true).over(fwd).as("t1"),
          first(anchorV, ignoreNulls = true).over(fwd).as("v1"))
        .filter(col("isg") === 1)
        .select(col("user_id"), expr(s"t div $day").as("day"),
          Canon.round6(when(col("t1") === col("t0"), col("v0"))
            .otherwise(col("v0") + (col("v1") - col("v0"))
              * (col("t") - col("t0")).cast("double")
              / (col("t1") - col("t0")).cast("double"))).as("v_interp"))
        .orderBy("user_id", "day")
    }
  )

  def oracle = Map(
    "events_resample_lerp" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v,
        |    event_id AS tie FROM events),
        |b AS (SELECT user_id, min(t) AS mn, max(t) AS mx
        |  FROM e GROUP BY 1),
        |g AS (SELECT user_id,
        |    unnest(range((mn + 86399999999) // 86400000000,
        |                 mx // 86400000000 + 1)) AS d
        |  FROM b),
        |u AS (SELECT user_id, t, v, 0 AS isg, tie FROM e
        |  UNION ALL SELECT user_id, d * 86400000000, NULL, 1,
        |    9223372036854775807 FROM g),
        |w AS (SELECT user_id, t, isg,
        |    last_value(CASE WHEN isg = 0 THEN t END IGNORE NULLS)
        |      OVER wb AS t0,
        |    last_value(CASE WHEN isg = 0 THEN v END IGNORE NULLS)
        |      OVER wb AS v0,
        |    first_value(CASE WHEN isg = 0 THEN t END IGNORE NULLS)
        |      OVER wf AS t1,
        |    first_value(CASE WHEN isg = 0 THEN v END IGNORE NULLS)
        |      OVER wf AS v1
        |  FROM u WINDOW
        |  wb AS (PARTITION BY user_id ORDER BY t, isg, tie
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY user_id ORDER BY t, isg, tie
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, t // 86400000000 AS day,
        |  CAST(round(CASE WHEN t1 = t0 THEN v0
        |    ELSE v0 + (v1 - v0) * CAST(t - t0 AS DOUBLE)
        |      / CAST(t1 - t0 AS DOUBLE) END, 6) AS DOUBLE) AS v_interp
        |FROM w WHERE isg = 1 ORDER BY user_id, day""".stripMargin,

    "events_gini" ->
      """WITH kk AS (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS k
        |  FROM events),
        |c AS (SELECT event_type, k, count(*) AS c FROM kk GROUP BY 1, 2)
        |SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
        |  count(*) AS n_distinct_k,
        |  CAST(round(1.0 - CAST(sum(c * c) AS DOUBLE)
        |    / (sum(c) * sum(c)), 6) AS DOUBLE) AS gini
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_changepoint" ->
      // integer mirror: exact cents, scaled CUSUM n·run − i·total, one
      // double division only in the reported value
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |w AS (SELECT *,
        |    count(*) OVER (PARTITION BY user_id) AS n,
        |    CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) AS s,
        |    CAST(sum(c) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS run,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS i
        |  FROM e),
        |c2 AS (SELECT *, n * run - i * s AS cusum_scaled FROM w),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY abs(cusum_scaled) DESC, ts_us, event_id) AS rk
        |  FROM c2)
        |SELECT user_id, ts_us AS cp_ts_us, event_id AS cp_event,
        |  CAST(round(CAST(cusum_scaled AS DOUBLE) / (n * 100.0), 4)
        |    AS DOUBLE) AS peak_cusum
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "events_trace" ->
      s"""SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
         |FROM events
         |WHERE user_id IN (1, 2, 3)
         |  AND epoch_us(ts) >= $FromUs AND epoch_us(ts) < $ToUs
         |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "events_bbox" ->
      s"""SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
         |FROM events
         |WHERE epoch_us(ts) >= $FromUs AND epoch_us(ts) < $ToUs
         |  AND value >= 20.0 AND value < 60.0
         |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "events_downsample" ->
      """WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn
        |  FROM events)
        |SELECT user_id, ts_us, event_id, value, rn FROM r
        |WHERE (rn - 1) % 10 = 0 ORDER BY user_id, rn""".stripMargin,

    "events_user_summary" ->
      """SELECT user_id, count(*) AS n_events,
        |  count(DISTINCT event_type) AS n_types,
        |  min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us,
        |  CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_value,
        |  CAST(round(max(value), 4) AS DOUBLE) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_distinct_users" ->
      """SELECT user_id, min(epoch_us(ts)) AS first_seen_us
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_heatmap" ->
      """SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
        |  (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
        |  count(*) AS n_events, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY dow, hour ORDER BY dow, hour""".stripMargin,

    "events_drawdown" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |r AS (SELECT *, max(c) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
        |  FROM e),
        |d AS (SELECT *, runmax - c AS dd FROM r),
        |m AS (SELECT user_id, CAST(max(dd) AS BIGINT) AS max_dd
        |  FROM d GROUP BY user_id)
        |SELECT d.user_id,
        |  CAST(m.max_dd AS DOUBLE) / 100.0 AS max_dd,
        |  min(d.ts_us) AS trough_us
        |FROM d JOIN m ON d.user_id = m.user_id AND d.dd = m.max_dd
        |GROUP BY d.user_id, m.max_dd
        |ORDER BY d.user_id""".stripMargin,

    "events_bursts" ->
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS n
        |  FROM events GROUP BY h),
        |s AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS s1,
        |    CAST(sum(n * n) AS BIGINT) AS s2 FROM h),
        |f AS (SELECT h.h, h.n FROM h CROSS JOIN s
        |  WHERE CAST(h.n AS DOUBLE) > CAST(s1 AS DOUBLE) / k
        |    + 2.0 * sqrt((CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / k) / k)),
        |l AS (SELECT *, lag(h) OVER (ORDER BY h) AS prev_h FROM f),
        |i AS (SELECT *, CASE WHEN prev_h IS NULL OR h - prev_h > 1
        |    THEN 1 ELSE 0 END AS is_new FROM l),
        |eps AS (SELECT *, sum(is_new) OVER (ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ep
        |  FROM i)
        |SELECT CAST(ep AS BIGINT) AS ep,
        |  min(h) * 3600000000 AS start_us,
        |  (max(h) + 1) * 3600000000 AS end_us,
        |  count(*) AS n_hours, CAST(max(n) AS BIGINT) AS peak
        |FROM eps GROUP BY ep ORDER BY ep""".stripMargin,

    "events_benford" ->
      """WITH c0 AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |d AS (SELECT CASE WHEN c >= 10000 THEN c // 10000
        |             WHEN c >= 1000 THEN c // 1000
        |             WHEN c >= 100 THEN c // 100
        |             WHEN c >= 10 THEN c // 10
        |             ELSE c END AS d1
        |  FROM c0 WHERE c >= 1),
        |g AS (SELECT CAST(d1 AS INTEGER) AS d1, count(*) AS n
        |  FROM d GROUP BY d1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM g),
        |b(d1, expected) AS (VALUES
        |  (1, 0.301029995663981), (2, 0.176091259055681),
        |  (3, 0.124938736608300), (4, 0.096910013008056),
        |  (5, 0.079181246047625), (6, 0.066946789630613),
        |  (7, 0.057991946977687), (8, 0.051152522447381),
        |  (9, 0.045757490560675))
        |SELECT g.d1, CAST(g.n AS BIGINT) AS n,
        |  CAST(round(CAST(g.n AS DOUBLE) / nt, 6) AS DOUBLE) AS observed,
        |  b.expected,
        |  CAST(round(CAST(g.n AS DOUBLE) / nt - b.expected, 6) AS DOUBLE)
        |    AS deviation
        |FROM g JOIN b ON g.d1 = b.d1 CROSS JOIN t
        |ORDER BY g.d1""".stripMargin,

    "events_autocorr" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |l AS (SELECT user_id,
        |    CAST(c AS DECIMAL(18,0)) AS x,
        |    CAST(lag(c) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS DECIMAL(18,0)) AS y
        |  FROM e),
        |s AS (SELECT user_id, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM l WHERE y IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n,
        |  CAST(round((n * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((n * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (n * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS DOUBLE)
        |    AS acf1
        |FROM s ORDER BY user_id""".stripMargin,

    "events_gap_hist" ->
      """WITH g AS (SELECT epoch_us(ts)
        |      - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |        ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events),
        |b AS (SELECT CASE
        |    WHEN gap <= 300000000 THEN 'a_le5m'
        |    WHEN gap <= 1800000000 THEN 'b_le30m'
        |    WHEN gap <= 7200000000 THEN 'c_le2h'
        |    WHEN gap <= 43200000000 THEN 'd_le12h'
        |    WHEN gap <= 172800000000 THEN 'e_le48h'
        |    ELSE 'f_gt48h' END AS bucket
        |  FROM g WHERE gap IS NOT NULL),
        |t AS (SELECT count(*) AS nt FROM b)
        |SELECT bucket, count(*) AS n,
        |  CAST(round(CAST(count(*) AS DOUBLE) / nt, 6) AS DOUBLE) AS share
        |FROM b CROSS JOIN t GROUP BY bucket, nt ORDER BY bucket""".stripMargin,

    "events_gap_report" ->
      """WITH l AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id, prev_ts AS dark_from_us, ts_us AS dark_to_us,
        |  (ts_us - prev_ts) // 1000000 AS gap_s
        |FROM l WHERE prev_ts IS NOT NULL
        |  AND ts_us - prev_ts >= 172800000000
        |ORDER BY user_id, dark_from_us""".stripMargin,

    "events_outliers_mad" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |m AS (SELECT user_id, list_sort(list(c)) AS arr
        |  FROM e GROUP BY user_id),
        |m2 AS (SELECT user_id,
        |    arr[(len(arr) - 1) // 2 + 1] + arr[len(arr) // 2 + 1] AS med2
        |  FROM m),
        |dd AS (SELECT e.*, m2.med2, abs(c * 2 - med2) AS dv
        |  FROM e JOIN m2 USING (user_id)),
        |md AS (SELECT user_id, list_sort(list(dv)) AS darr
        |  FROM dd GROUP BY user_id),
        |md2 AS (SELECT user_id,
        |    darr[(len(darr) - 1) // 2 + 1] + darr[len(darr) // 2 + 1]
        |      AS mad2
        |  FROM md)
        |SELECT dd.user_id, ts_us, event_id, value,
        |  CAST(med2 AS DOUBLE) / 200.0 AS median,
        |  CAST(mad2 AS DOUBLE) / 400.0 AS mad
        |FROM dd JOIN md2 USING (user_id)
        |WHERE dv * 2 > mad2 * 3
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "events_coverage" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    epoch_us(ts) + 1800000000 AS end_us
        |  FROM events),
        |mk AS (SELECT *,
        |    max(end_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS max_prev_end
        |  FROM iv),
        |fl AS (SELECT *,
        |    CASE WHEN max_prev_end IS NULL OR ts_us > max_prev_end
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM mk),
        |isl AS (SELECT *,
        |    sum(is_new) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM fl),
        |ext AS (SELECT user_id, island,
        |    min(ts_us) AS s_us, max(end_us) AS e_us
        |  FROM isl GROUP BY user_id, island)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(e_us - s_us) AS BIGINT) // 1000000 AS covered_s
        |FROM ext GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_profile_drift" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
        |b AS (SELECT CAST(min(us) AS BIGINT) AS lo,
        |    CAST(max(us) AS BIGINT) AS hi FROM e),
        |cells AS (SELECT
        |    CASE WHEN us < (lo + hi) // 2 THEN 0 ELSE 1 END AS half,
        |    ((us // 86400000000) % 7 + 7) % 7 AS dow, event_type,
        |    count(*) AS o
        |  FROM e CROSS JOIN b GROUP BY 1, 2, 3),
        |r AS (SELECT half, sum(o) AS rt FROM cells GROUP BY half),
        |c AS (SELECT dow, event_type, sum(o) AS ct FROM cells
        |  GROUP BY dow, event_type),
        |n AS (SELECT sum(o) AS nt FROM cells),
        |k AS (SELECT cells.o,
        |    CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nt AS DOUBLE) AS e,
        |    nt
        |  FROM cells JOIN r USING (half)
        |    JOIN c USING (dow, event_type) CROSS JOIN n),
        |q AS (SELECT CAST(floor((o - e) * (o - e) / e * 1e9 + 0.5) AS BIGINT)
        |    AS contrib_nano, nt FROM k)
        |SELECT
        |  CAST(floor(CAST(sum(contrib_nano) AS DOUBLE) / 1e9 * 1e6 + 0.5)
        |    / 1e6 AS DOUBLE) AS chisq_drift,
        |  count(*) AS n_cells,
        |  CAST(first(nt) AS BIGINT) AS n
        |FROM q""".stripMargin,

    "events_state_dwell" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    event_type FROM events),
        |d AS (SELECT event_type,
        |    lead(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) - ts_us AS dwell_us
        |  FROM e),
        |g AS (SELECT event_type, count(*) AS n_intervals,
        |    CAST(sum(dwell_us) AS BIGINT) AS total_dwell_us
        |  FROM d WHERE dwell_us IS NOT NULL GROUP BY event_type)
        |SELECT event_type, CAST(n_intervals AS BIGINT) AS n_intervals,
        |  total_dwell_us,
        |  CAST(floor(CAST(total_dwell_us AS DOUBLE) / n_intervals * 1e6
        |    + 0.5) / 1e6 AS DOUBLE) AS avg_dwell_us
        |FROM g ORDER BY event_type""".stripMargin,

    "events_top_movers" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |d AS (SELECT day, event_type, CAST(sum(cents) AS BIGINT) AS tot
        |  FROM e GROUP BY day, event_type),
        |l AS (SELECT day, event_type, tot,
        |    lag(tot) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM d)
        |SELECT day, event_type, tot, prev, tot - prev AS delta
        |FROM l WHERE prev IS NOT NULL
        |ORDER BY abs(tot - prev) DESC, day, event_type LIMIT 10""".stripMargin,

    "events_stl_lite" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |d AS (SELECT day, CAST(sum(cents) AS BIGINT) AS tot
        |  FROM e GROUP BY day),
        |t AS (SELECT day, tot,
        |    CAST(sum(tot) OVER (ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS sum7,
        |    count(*) OVER (ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7,
        |    day % 7 AS phase
        |  FROM d),
        |t2 AS (SELECT *, CASE WHEN n7 = 7 THEN 7 * tot - sum7 END AS det_x7
        |  FROM t),
        |s AS (SELECT phase,
        |    CAST(sum(det_x7) AS DOUBLE) / count(*) / 7.0 AS seas_raw
        |  FROM t2 WHERE det_x7 IS NOT NULL GROUP BY phase),
        |f AS (SELECT day, phase, tot,
        |    CASE WHEN n7 = 7 THEN CAST(sum7 AS DOUBLE) / 7.0 END AS tr,
        |    seas_raw,
        |    CAST(det_x7 AS DOUBLE) / 7.0 - seas_raw AS rs
        |  FROM t2 LEFT JOIN s USING (phase))
        |SELECT day, phase, tot,
        |  CAST(CASE WHEN tr >= 0 THEN floor(tr * 1e6 + 0.5) / 1e6
        |    ELSE -floor(-tr * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE) AS trend,
        |  CAST(CASE WHEN seas_raw >= 0 THEN floor(seas_raw * 1e6 + 0.5) / 1e6
        |    ELSE -floor(-seas_raw * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE)
        |    AS seasonal,
        |  CAST(CASE WHEN rs >= 0 THEN floor(rs * 1e6 + 0.5) / 1e6
        |    ELSE -floor(-rs * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE) AS resid
        |FROM f ORDER BY day""".stripMargin,

    "events_trend" ->
      // identical numeric staging: exact decimal sums → one double cast
      // each → the closed-form slope in scalar IEEE arithmetic. The
      // `+ 0.0` after round() normalizes IEEE -0.0 → +0.0: DuckDB's
      // round/floor return DOUBLE and keep the sign of a tiny negative
      // slope (seen: -2.86e-8 → -0.0 at sf0.01 user 27), while Spark's
      // floor returns LONG which has no -0 — without the normalizer the
      // two engines hash-differ on a value they both print as zero.
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value
        |  FROM events),
        |b AS (SELECT user_id, value,
        |    (ts_us - min(ts_us) OVER (PARTITION BY user_id)) // 1000000
        |      AS x FROM e),
        |s AS (SELECT user_id, count(*) AS n,
        |    sum(CAST(x AS DECIMAL(10,0))) AS sx,
        |    sum(CAST(value AS DECIMAL(18,6))) AS sy,
        |    sum(CAST(x AS DECIMAL(10,0)) * CAST(value AS DECIMAL(18,6)))
        |      AS sxy,
        |    sum(CAST(x AS DECIMAL(10,0)) * CAST(x AS DECIMAL(10,0)))
        |      AS sxx
        |  FROM b GROUP BY user_id)
        |SELECT user_id, n,
        |  CAST(round(CASE WHEN n * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |    THEN (n * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (n * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    ELSE 0.0 END, 6) + 0.0 AS DOUBLE) AS slope_per_s
        |FROM s ORDER BY user_id""".stripMargin,

    "events_theilsen" ->
      // incomplete-estimator pairing: rank each vehicle's readings,
      // pair rn with rn + n//2 — the same deterministic pair set the
      // Spark side states; DuckDB's interpolating median ≡ Spark
      // percentile(0.5) on even counts
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
        |  FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |p AS (SELECT a.user_id,
        |    (b.value - a.value)
        |      / (CAST(b.ts_us - a.ts_us AS DOUBLE) / 1000000.0) AS slope
        |  FROM r a JOIN r b ON a.user_id = b.user_id
        |    AND b.rn = a.rn + a.n // 2
        |    AND b.ts_us > a.ts_us),
        |m AS (SELECT user_id, count(*) AS n_pairs,
        |    median(slope) AS med FROM p GROUP BY user_id)
        |SELECT user_id, n_pairs,
        |  CAST(CASE WHEN med >= 0 THEN floor(med * 1e6 + 0.5) / 1e6
        |    ELSE -floor(-med * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE)
        |    AS theil_slope
        |FROM m ORDER BY user_id""".stripMargin,

    "events_peaks" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |l AS (SELECT user_id, t, event_id, c,
        |    lag(c, 1) OVER w AS p1, lag(c, 2) OVER w AS p2,
        |    lead(c, 1) OVER w AS n1, lead(c, 2) OVER w AS n2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |f AS (SELECT *, greatest(p1, p2, n1, n2) AS shoulder FROM l
        |  WHERE p1 IS NOT NULL AND p2 IS NOT NULL
        |    AND n1 IS NOT NULL AND n2 IS NOT NULL)
        |SELECT user_id, t AS ts_us, event_id,
        |  CAST(c AS DOUBLE) / 100 AS value,
        |  CAST(c - shoulder AS DOUBLE) / 100 AS prominence
        |FROM f WHERE c > shoulder AND c - shoulder >= 500
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "events_twap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |h AS (SELECT user_id, day, cents,
        |    lead(ts_us, 1) OVER (PARTITION BY user_id, day
        |      ORDER BY ts_us, event_id) - ts_us AS dt
        |  FROM e),
        |a AS (SELECT user_id, day, count(*) AS n_holds,
        |    sum(dt) AS span_us,
        |    sum(CAST(cents * dt AS DECIMAL(38,0))) AS wsum
        |  FROM h WHERE dt IS NOT NULL GROUP BY user_id, day),
        |f AS (SELECT user_id, day, n_holds, CAST(span_us AS BIGINT) AS span_us,
        |    CAST(wsum AS DOUBLE) / CAST(span_us AS DOUBLE) / 100.0 AS tw
        |  FROM a)
        |SELECT user_id, day, n_holds, span_us,
        |  CAST(CASE WHEN tw >= 0 THEN floor(tw * 1e6 + 0.5) / 1e6
        |    ELSE -floor(-tw * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE) AS twap
        |FROM f ORDER BY user_id, day""".stripMargin,

    "events_ohlc" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
        |    FROM events),
        |b AS (SELECT user_id,
        |    ts_us // 3600000000 * 3600000000 AS hr, ts_us, event_id, value
        |  FROM e),
        |r AS (SELECT user_id, hr, value,
        |    row_number() OVER (PARTITION BY user_id, hr
        |      ORDER BY ts_us, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id, hr
        |      ORDER BY ts_us DESC, event_id DESC) AS rn_d
        |  FROM b)
        |SELECT user_id, hr, count(*) AS n,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close
        |FROM r GROUP BY user_id, hr ORDER BY user_id, hr""".stripMargin,

    "events_cadence" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
        |    event_id FROM events),
        |g AS (SELECT event_type, ts_us - lag(ts_us) OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts_us, event_id) AS gap_us FROM e)
        |SELECT event_type, count(*) AS n_gaps,
        |  quantile_cont(CAST(gap_us AS DOUBLE), 0.5) AS p50_us,
        |  quantile_cont(CAST(gap_us AS DOUBLE), 0.9) AS p90_us,
        |  quantile_cont(CAST(gap_us AS DOUBLE), 0.99) AS p99_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
