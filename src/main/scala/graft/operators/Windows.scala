package graft.operators

import graft.{Canon, QueryGroup, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group E (window functions) — SURVEY.md §2.E.
  *
  * Scale notes: every window here partitions by a high-cardinality key
  * (customer, user, brand) so WindowExec sees small per-key frames after
  * one hash-partition shuffle — no single-partition global window
  * anywhere (that would serialize 100 TB through one task). Cumulative /
  * sliding money sums go through DECIMAL so the frame fold is exact and
  * engine-independent (SURVEY.md §5.3).
  */
object Windows extends QueryGroup {

  def queries = Map(
    "win_topk_per_group" -> { (spark, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.table(spark, dir, "orders")
        // long: DuckDB row_number() is BIGINT
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },

    "win_rank_dense" -> { (spark, dir) =>
      // rank over value only (no tiebreaker) keeps rank() ≠ row_number();
      // output total order restored by (brand, partkey).
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc)
      Tables.table(spark, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy("p_brand", "p_partkey")
    },

    "win_lag_delta" -> { (spark, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"))
        .withColumn("prev_ts", lag("ts_us", 1).over(w))
        .withColumn("delta_us", col("ts_us") - col("prev_ts"))
        .orderBy("user_id", "ts_us", "event_id")
    },

    "win_running_sum" -> { (spark, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.table(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          Canon.decRound4(sum(col("o_totalprice").cast(Canon.Dec)).over(w))
            .as("cum_spend"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },

    "win_rolling_median" -> { (spark, dir) =>
      // Exact rolling median of the last 10 events per user — the
      // robust-statistics sibling of win_moving_avg (medians shrug off
      // the value spikes that drag a mean). Determinism: the median of
      // DOUBLES is interpolation-formula-sensitive (a+(b-a)/2 vs
      // (a+b)/2 can differ by an ulp), so the value is first binary-
      // rounded to integer cents — for integer-valued doubles every
      // interpolation formula is EXACT, so Spark and the oracle agree
      // bit-for-bit, and the final /100.0 is the same single operation
      // on the same operand in both engines. Plan: one (user_id) hash
      // exchange; the frame is explicitly bounded (ROWS 9 PRECEDING) so
      // the per-row sort_array cost is O(10 log 10) — constant — and
      // per-key frames stay small at any corpus size.
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(-9, Window.currentRow)
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
        .withColumn("arr", sort_array(collect_list(cents).over(w)))
        // element_at needs INT positions; `div` keeps them integral
        // (Spark's `/` on ints is double division). (n+1) div 2 is the
        // middle for odd n and the LOWER middle for even n.
        .withColumn("med10",
          when(size(col("arr")) % 2 === 1,
            element_at(col("arr"), expr("(size(arr) + 1) div 2").cast("int"))
              .cast("double"))
          .otherwise(
            (element_at(col("arr"), expr("(size(arr) + 1) div 2").cast("int"))
              + element_at(col("arr"), expr("size(arr) div 2 + 1").cast("int")))
            / 2.0)
          / 100.0)
        .drop("arr")
        .orderBy("user_id", "ts_us", "event_id")
    },

    "win_moving_avg" -> { (spark, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
      Tables.table(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          // explicit decimal-sum / count so both engines fold identically
          Canon.round4(sum(col("o_totalprice").cast(Canon.Dec)).over(w)
            .cast("double") / count(lit(1)).over(w)).as("ma3"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },

    "win_ntile" -> { (spark, dir) =>
      // Distributed EXACT ntile — no global single-task window. Phase 1:
      // one tiny aggregate takes B-1 approx-percentile cuts of the sort
      // column; bucket = |cuts strictly < value| is monotone in
      // (c_acctbal, c_custkey) because equal acctbal values always land
      // in the SAME bucket, so per-bucket local order + carry-in offsets
      // reproduce the exact global rank (the events_concurrency
      // two-phase pattern). The cuts only balance work — ANY cut set
      // yields identical output, so approx_percentile's error is
      // irrelevant to correctness. Phase 2: row_number within bucket
      // (ONE hash exchange, ~N/B rows per task) + broadcast B-row offset
      // table; ntile(4) is then pure integer arithmetic on (rank, N):
      // the first N%4 quartiles get one extra row, same as the SQL spec.
      // Tie-skew note: if one acctbal value dominated, its bucket would
      // be big; the fix is cutting on struct(c_acctbal, c_custkey) —
      // unnecessary at any realistic acctbal distribution.
      val cust = Tables.table(spark, dir, "customer")
        .select("c_custkey", "c_acctbal")
      val B = 32
      val qs = (1 until B).map(i => i.toDouble / B).mkString(",")
      val cuts = cust.agg(
        expr(s"approx_percentile(c_acctbal, array($qs), 10000)").as("cuts"))
      val bucketed = cust.crossJoin(broadcast(cuts))
        .withColumn("bkt", expr("size(filter(cuts, c -> c < c_acctbal))"))
        .drop("cuts")
      val offs = bucketed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum("cnt").over(
          Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("n", sum("cnt").over(Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select("bkt", "off", "n")
      val inBkt = Window.partitionBy("bkt").orderBy("c_acctbal", "c_custkey")
      bucketed
        .withColumn("rn", row_number().over(inBkt).cast("long"))
        .join(broadcast(offs), "bkt")
        .withColumn("r", col("off") + col("rn"))
        .withColumn("quartile",
          // CASE is lazy: the ELSE division by base only runs when
          // r > rem (impossible at base = 0, where every r <= n = rem)
          expr("""CASE WHEN r <= (n % 4) * (n div 4 + 1)
                 |     THEN (r - 1) div (n div 4 + 1) + 1
                 |     ELSE n % 4 + (r - 1 - (n % 4) * (n div 4 + 1)) div (n div 4) + 1
                 |END""".stripMargin))
        .select("c_custkey", "c_acctbal", "quartile")
        .orderBy("c_custkey")
    },

    "agg_histogram_equidepth" -> { (spark, dir) =>
      // Equi-DEPTH histogram (the optimizer-statistics twin of
      // agg_histogram's equi-width buckets): 8 tiles of equal row count
      // over o_totalprice, each reporting [lo, hi] and its exact count —
      // the boundary table a cost model or a monotone-split planner
      // actually consumes. Built with win_ntile's distributed two-phase
      // exact rank (approx cuts for BALANCE only, per-bucket row_number
      // + broadcast carry-in offsets for the EXACT global rank — never a
      // single-task global sort), then one tiny 8-group aggregate. min/
      // max are exact element picks, so no float arithmetic enters the
      // hash. The heavy exchange is the one B-way pre-bucket hash — the
      // same shape at any corpus size.
      val ord = Tables.table(spark, dir, "orders")
        .select("o_orderkey", "o_totalprice")
      val B = 32
      val qs = (1 until B).map(i => i.toDouble / B).mkString(",")
      val cuts = ord.agg(
        expr(s"approx_percentile(o_totalprice, array($qs), 10000)").as("cuts"))
      val bucketed = ord.crossJoin(broadcast(cuts))
        .withColumn("bkt", expr("size(filter(cuts, c -> c < o_totalprice))"))
        .drop("cuts")
      val offs = bucketed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum("cnt").over(
          Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("n", sum("cnt").over(Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select("bkt", "off", "n")
      val inBkt = Window.partitionBy("bkt")
        .orderBy("o_totalprice", "o_orderkey")
      bucketed
        .withColumn("rn", row_number().over(inBkt).cast("long"))
        .join(broadcast(offs), "bkt")
        .withColumn("r", col("off") + col("rn"))
        .withColumn("tile",
          expr("""CASE WHEN r <= (n % 8) * (n div 8 + 1)
                 |     THEN (r - 1) div (n div 8 + 1) + 1
                 |     ELSE n % 8 + (r - 1 - (n % 8) * (n div 8 + 1)) div (n div 8) + 1
                 |END""".stripMargin))
        .groupBy("tile")
        .agg(count(lit(1)).as("n_rows"),
          min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
        .orderBy("tile")
    },

    "win_first_last" -> { (spark, dir) =>
      // first_value / last_value / nth_value over the FULL partition
      // frame (unbounded both ways) — the deterministic form: the frame
      // is the whole user history under a unique total order, so every
      // row of a user agrees on all three. One user_id exchange.
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          first("event_type").over(w).as("first_type"),
          last("event_type").over(w).as("last_type"),
          nth_value(col("event_type"), 2).over(w).as("second_type"))
        .orderBy("user_id", "ts_us", "event_id")
    },

    "win_streak" -> { (spark, dir) =>
      // Gaps-and-islands STREAK analytics: per user, the longest run of
      // consecutive high-value events (value > 35, ~median split) in
      // time order, with its start. Islands via the row_number
      // difference trick — rn over all events minus rn over qualifying
      // events is constant within a run — so the whole query is TWO
      // windows and a groupBy sharing ONE user_id exchange, then a
      // per-user top-1; integer arithmetic end-to-end except the raw
      // value comparison. The canonical sessionization-without-
      // timestamps shape (login streaks, SLA runs, hot sensors).
      val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val hot = Tables.events(spark, dir)
        .withColumn("rn_all", row_number().over(byUser))
        .filter(col("value") > 35)
        .withColumn("rn_hot", row_number().over(
          Window.partitionBy("user_id").orderBy("ts_us", "event_id")))
        .withColumn("isl", col("rn_all") - col("rn_hot"))
      val runs = hot.groupBy("user_id", "isl")
        .agg(count(lit(1)).as("len"), min("ts_us").as("start_us"))
      runs.withColumn("rk", row_number().over(
          Window.partitionBy("user_id")
            .orderBy(col("len").desc, col("start_us"))))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("len").as("streak_len"), col("start_us"))
        .orderBy("user_id")
    },

    "win_fill_forward" -> { (spark, dir) =>
      // Forward fill (last-observation-carried-forward) — the sensor /
      // time-series gap repair every telemetry store needs: nulls are
      // injected deterministically (event_id ≡ 0 mod 7), then repaired
      // with last(..., ignoreNulls) over the growing frame. The fill is
      // value COPYING, not arithmetic — bit-exact cross-engine by
      // construction. One user_id exchange, running state is a single
      // value per partition stream; rows whose null survives (no prior
      // observation) stay null and hash as such on both engines.
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(spark, dir)
        .withColumn("v_gap",
          when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("v_gap"),
          last(col("v_gap"), ignoreNulls = true).over(w).as("v_filled"))
        .orderBy("user_id", "ts_us", "event_id")
    },

    "features_pit_assemble" -> { (spark, dir) =>
      // Point-in-time feature assembly — the feature-store read that
      // prevents label leakage: for every 'purchase' (the label event),
      // attach features computed STRICTLY BEFORE it — the user's last
      // view value, recency of that view, and view count in the
      // trailing hour. All three features are frames over ONE user
      // exchange (two preceding-rows frames + one RANGE frame on the
      // µs axis); no joins, no leakage-prone "latest overall" lookups.
      // The classic as-of-join feature pull collapses into window
      // frames because label and feature events share the entity
      // stream — the cheapest correct shape at any scale.
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
      val wRange = W.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-3600000000L, -1)
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"), col("value"))
        .withColumn("view_val",
          when(col("event_type") === "view", col("value")))
        .withColumn("view_ts",
          when(col("event_type") === "view", col("ts_us")))
        .withColumn("last_view_value",
          last("view_val", ignoreNulls = true).over(w))
        .withColumn("last_view_us",
          last("view_ts", ignoreNulls = true).over(w))
        .withColumn("views_1h", count(col("view_ts")).over(wRange))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("last_view_value"),
          (col("ts_us") - col("last_view_us")).as("us_since_view"),
          col("views_1h"))
        .orderBy("user_id", "ts_us", "event_id")
    },

    "features_rolling_stats" -> { (spark, dir) =>
      // Rolling feature BLOCK — the standard feature-engineering read:
      // per event, mean/std/min/max of the user's trailing-10 signal
      // values (the current row included). All four statistics ride ONE
      // user exchange and one frame; Σv and Σv² accumulate in exact
      // decimal inside the frame (order-free), the mean and the
      // (n-1)-denominator std each collapse those scalars in one
      // fixed-order IEEE expression — so a 10-row frame is bit-stable
      // cross-engine where a float running sum would drift. std is NULL
      // at frame size 1, identically in both engines.
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(-9, 0)
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("value").cast(Canon.Dec).as("v"))
        .withColumn("n_win", count(lit(1)).over(w))
        .withColumn("s", sum("v").over(w))
        .withColumn("q", sum(col("v") * col("v")).over(w))
        .select(col("user_id"), col("ts_us"), col("event_id"), col("n_win"),
          Canon.round6(col("s").cast("double") / col("n_win")).as("roll_mean"),
          // greatest(, 0): identical values can go ~-1e-16 in IEEE —
          // sqrt would yield NaN, whose cross-engine hash is undefined
          Canon.round6(when(col("n_win") > 1, sqrt(greatest(
            (col("q").cast("double")
              - col("s").cast("double") * col("s").cast("double")
                / col("n_win"))
              / (col("n_win") - 1L), lit(0.0d))))).as("roll_std"),
          min(col("v").cast("double")).over(w).as("roll_min"),
          max(col("v").cast("double")).over(w).as("roll_max"))
        .orderBy("user_id", "ts_us", "event_id")
    },

    "features_rolling_slope" -> { (spark, dir) =>
      // Rolling REGRESSION SLOPE — the momentum feature next to
      // features_rolling_stats' level features: per event, the
      // least-squares slope of value over elapsed-seconds within the
      // trailing-10 frame. x is GLOBAL per user (seconds since first
      // report, events_trend's staging) so the five frame sums are sums
      // of per-row terms — associative, exact in decimal, order-free
      // under partial aggregation; the closed-form slope then collapses
      // five scalars in one fixed-order IEEE expression. Everything
      // rides the ONE user_id exchange: min-ts window, frame sums,
      // slope. NULL when the frame is degenerate (n < 2 or zero x
      // variance), identically in both engines.
      //
      // r8 staging change (verdict lever 8): the five frame sums run
      // on LONGs (x in whole seconds, y in exact CENTS — value×100 is
      // integral in this schema), not DECIMALs — long window sums are
      // the cheap codegen path (~1.7 s → ~1 s at sf0.1) and every sum
      // stays exactly representable (x ≤ ~9e9 s and |y| ≤ 9e13 cents
      // keep Σxy over the 10-row frame under 2^53), so each cast to
      // double is EXACT and the one /100.0 per y-sum is a single
      // correctly-rounded IEEE division of exact operands — the same
      // double the decimal-sum cast produced, so the DuckDB oracle
      // (which keeps its decimal staging) is untouched and hashes are
      // unchanged (re-verified at all 3 SFs).
      val W = org.apache.spark.sql.expressions.Window
      val w10 = W.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(-9, 0)
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("yc"))
        .withColumn("x",
          expr("(ts_us - min(ts_us) OVER (PARTITION BY user_id)) div 1000000"))
        .withColumn("n", count(lit(1)).over(w10))
        .withColumn("sx", sum("x").over(w10))
        .withColumn("syc", sum("yc").over(w10))
        .withColumn("sxyc", sum(col("x") * col("yc")).over(w10))
        .withColumn("sxx", sum(col("x") * col("x")).over(w10))
        .select(col("user_id"), col("ts_us"), col("event_id"), col("n"),
          Canon.round6(when(
            col("n") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double") > 0,
            (col("n") * (col("sxyc").cast("double") / lit(100.0d))
              - col("sx").cast("double")
                * (col("syc").cast("double") / lit(100.0d)))
              / (col("n") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double"))))
            .as("slope"))
        .orderBy("user_id", "ts_us", "event_id")
    },

    "features_target_encode" -> { (spark, dir) =>
      // Smoothed TARGET ENCODING of a categorical feature — the standard
      // trick for feeding high-cardinality categories to a model:
      // encode(seg) = (Σ_seg target + m·global_mean) / (n_seg + m), m=50,
      // shrinking small categories toward the prior. Numeric policy:
      // order totals sum in exact DECIMAL (order-free partial agg), the
      // global mean and each encode collapse those exact scalars in ONE
      // fixed-order IEEE expression — bit-stable cross-engine. Shape: one
      // fact⋈dim join (dim broadcast; at 100 TB a shuffle join with the
      // same downstream), ONE map-side-combined agg to |segments| rows,
      // and the 1-row global aggregate broadcast back via cross join —
      // the encode table itself is then a broadcast dim for the training
      // join. High-cardinality variant: same plan, the |categories|-row
      // result simply partitions; nothing here is per-row state.
      val seg = Tables.table(spark, dir, "orders")
        .join(broadcast(Tables.table(spark, dir, "customer")
            .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("o_totalprice").cast(Canon.Dec).as("t"))
      val bySeg = seg.groupBy("segment")
        .agg(count(lit(1)).as("n_orders"), sum("t").as("ssum"))
      val global = seg.agg(sum("t").as("gsum"), count(lit(1)).as("gn"))
      val m = lit(50.0d)
      bySeg.crossJoin(broadcast(global))
        .select(col("segment"), col("n_orders"),
          Canon.round6(col("ssum").cast("double")
            / col("n_orders").cast("double")).as("seg_mean"),
          Canon.round6((col("ssum").cast("double")
              + m * (col("gsum").cast("double") / col("gn").cast("double")))
            / (col("n_orders").cast("double") + m)).as("encoded"))
        .orderBy("segment")
    },

    "win_ewma" -> { (spark, dir) =>
      // Exponentially weighted moving average (α = ½) over the last 10
      // readings per vehicle — the time-series smoother between
      // win_moving_avg (uniform) and win_rolling_median (robust).
      // α = ½ is deliberate: 0.5^k is an EXACT power of two, so every
      // weight, every product, and the ordered left-fold sum are
      // bit-identical cross-engine (an arbitrary α would put pow()'s
      // libm in the hash path). The frame is bounded (ROWS 9
      // PRECEDING), weights renormalize over the available history;
      // one user_id exchange, per-row cost O(10).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(-9, org.apache.spark.sql.expressions.Window.currentRow)
      // r14: 64k-floor child session — the per-row lambda fold over the
      // 10-element frame is CPU-dense on a byte-small exchange; the 1m
      // default serializes it (+0.25-0.37 s in all three 32c A/B pairs
      // — [[QueryGroup.cpuDenseSession]])
      Tables.events(QueryGroup.cpuDenseSession(spark), dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
        .withColumn("arr", collect_list("value").over(w))
        .withColumn("s", aggregate(
          transform(col("arr"), (x, i) =>
            x * pow(lit(0.5), size(col("arr")) - 1 - i)),
          lit(0.0), (acc, x) => acc + x))
        .withColumn("wsum", aggregate(
          transform(col("arr"), (_, i) =>
            pow(lit(0.5), size(col("arr")) - 1 - i)),
          lit(0.0), (acc, x) => acc + x))
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"),
          Canon.round6(col("s") / col("wsum")).as("ewma10"))
        .orderBy("user_id", "ts_us", "event_id")
    },

    "win_pattern_vshape" -> { (spark, dir) =>
      // MATCH_RECOGNIZE-lite: detect V-shaped reversals (strict drop
      // then strict rebound, v[t−2] > v[t−1] < v[t]) in each vehicle's
      // signal series — the row-pattern-matching surface (SQL:2016
      // MATCH_RECOGNIZE) expressed as a lag-chain: for FIXED-length
      // patterns the recognizer compiles to k−1 lags over ONE keyed
      // window, which distributes where a general NFA would not. Per
      // vehicle: match count, first match time, and the mean drop depth
      // (exact decimal mean of a double subtraction — deterministic).
      // One user_id exchange total; the match predicate is codegen'd.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
        .withColumn("p1", lag("value", 1).over(w))
        .withColumn("p2", lag("value", 2).over(w))
        .filter(col("p2") > col("p1") && col("p1") < col("value"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_vshapes"),
          min("ts_us").as("first_us"),
          Canon.round4(sum((col("p2") - col("p1")).cast(Canon.Dec))
            .cast("double") / count(lit(1))).as("avg_drop"))
        .orderBy("user_id")
    },

    "win_percent_rank" -> { (spark, dir) =>
      // Relative-rank analytics: percent_rank = (rank−1)/(n−1) and
      // cume_dist = peers_at_or_below/n within brand, ordered by retail
      // price. Both are rank-derived double divisions — IEEE-identical
      // across engines for identical (rank, n) — and tie rows share a
      // value by definition, so the output is deterministic without a
      // unique order key inside the window (the final ORDER BY adds
      // p_partkey for row stability).
      val w = Window.partitionBy("p_brand").orderBy("p_retailprice")
      Tables.table(spark, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          Canon.round6(percent_rank().over(w)).as("pct_rank"),
          Canon.round6(cume_dist().over(w)).as("cume"))
        .orderBy("p_brand", "p_retailprice", "p_partkey")
    }
  )

  def oracle = Map(
    "agg_histogram_equidepth" ->
      // the declarative spec of the same tiles: ntile(8) under the
      // identical total order, then the per-tile bounds
      """WITH t AS (SELECT o_totalprice,
        |    ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
        |  FROM orders)
        |SELECT CAST(tile AS BIGINT) AS tile, count(*) AS n_rows,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM t GROUP BY tile ORDER BY tile""".stripMargin,

    "features_rolling_slope" ->
      // identical staging: global per-user x, exact decimal frame sums,
      // one double cast each, the same fixed-order closed form
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(value AS DECIMAL(18,6)) AS yd FROM events),
        |b AS (SELECT user_id, ts_us, event_id, yd,
        |    CAST((ts_us - min(ts_us) OVER (PARTITION BY user_id))
        |      // 1000000 AS DECIMAL(10,0)) AS xd FROM e),
        |f AS (SELECT user_id, ts_us, event_id,
        |    count(*) OVER w AS n,
        |    sum(xd) OVER w AS sx, sum(yd) OVER w AS sy,
        |    sum(xd * yd) OVER w AS sxy, sum(xd * xd) OVER w AS sxx
        |  FROM b WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS BETWEEN 9 PRECEDING
        |    AND CURRENT ROW)),
        |s AS (SELECT user_id, ts_us, event_id, n,
        |    CASE WHEN n * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |      THEN (n * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (n * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS sl
        |  FROM f)
        |SELECT user_id, ts_us, event_id, n,
        |  CAST(CASE WHEN sl >= 0 THEN floor(sl * 1e6 + 0.5) / 1e6
        |    ELSE -floor(-sl * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE)
        |    AS slope
        |FROM s ORDER BY user_id, ts_us, event_id""".stripMargin,

    "features_target_encode" ->
      // identical staging: exact decimal sums, one double cast each, the
      // same fixed-order scalar expression for mean and encode
      """WITH j AS (SELECT c_mktsegment AS segment,
        |    CAST(o_totalprice AS DECIMAL(18,6)) AS t
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT CAST(sum(t) AS DOUBLE) AS gsum,
        |    CAST(count(*) AS DOUBLE) AS gn FROM j),
        |s AS (SELECT segment, count(*) AS n_orders,
        |    CAST(sum(t) AS DOUBLE) AS ssum FROM j GROUP BY segment),
        |f AS (SELECT segment, n_orders,
        |    ssum / CAST(n_orders AS DOUBLE) AS mn,
        |    (ssum + 50.0 * (gsum / gn))
        |      / (CAST(n_orders AS DOUBLE) + 50.0) AS enc
        |  FROM s CROSS JOIN g)
        |SELECT segment, n_orders,
        |  CAST(CASE WHEN mn >= 0 THEN floor(mn * 1e6 + 0.5) / 1e6
        |    ELSE -floor(-mn * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE)
        |    AS seg_mean,
        |  CAST(CASE WHEN enc >= 0 THEN floor(enc * 1e6 + 0.5) / 1e6
        |    ELSE -floor(-enc * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE)
        |    AS encoded
        |FROM f ORDER BY segment""".stripMargin,

    "features_pit_assemble" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    event_type, value,
        |    CASE WHEN event_type = 'view' THEN value END AS view_val,
        |    CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS view_ts
        |  FROM events),
        |f AS (SELECT *,
        |    last_value(view_val IGNORE NULLS) OVER wp AS last_view_value,
        |    last_value(view_ts IGNORE NULLS) OVER wp AS last_view_us,
        |    count(view_ts) OVER (PARTITION BY user_id ORDER BY ts_us
        |      RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
        |      AS views_1h
        |  FROM e
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, ts_us, event_id, last_view_value,
        |  ts_us - last_view_us AS us_since_view, views_1h
        |FROM f WHERE event_type = 'purchase'
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "features_rolling_stats" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(value AS DECIMAL(18,6)) AS v FROM events),
        |f AS (SELECT user_id, ts_us, event_id,
        |    count(*) OVER w AS n_win,
        |    sum(v) OVER w AS s,
        |    sum(v * v) OVER w AS q,
        |    min(CAST(v AS DOUBLE)) OVER w AS roll_min,
        |    max(CAST(v AS DOUBLE)) OVER w AS roll_max
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
        |g AS (SELECT user_id, ts_us, event_id, n_win,
        |    CAST(s AS DOUBLE) / n_win AS mn,
        |    CASE WHEN n_win > 1 THEN sqrt(greatest(
        |      (CAST(q AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_win)
        |        / (n_win - 1), 0.0)) END AS sd,
        |    roll_min, roll_max
        |  FROM f)
        |SELECT user_id, ts_us, event_id, CAST(n_win AS BIGINT) AS n_win,
        |  CAST(CASE WHEN mn >= 0 THEN floor(mn * 1e6 + 0.5) / 1e6
        |    ELSE -floor(-mn * 1e6 + 0.5) / 1e6 END AS DOUBLE) AS roll_mean,
        |  CAST(floor(sd * 1e6 + 0.5) / 1e6 AS DOUBLE) AS roll_std,
        |  roll_min, roll_max
        |FROM g ORDER BY user_id, ts_us, event_id""".stripMargin,

    "win_ewma" ->
      // same ordered frame list, same exact 2^-k weights, same
      // left-fold — bit-identical by construction
      """WITH f AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
        |    list(value) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id
        |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS arr
        |  FROM events)
        |SELECT user_id, ts_us, event_id, value,
        |  CAST(round(
        |    list_sum(list_transform(range(1, len(arr) + 1),
        |      i -> arr[i] * power(0.5, len(arr) - i)))
        |    / list_sum(list_transform(range(1, len(arr) + 1),
        |      i -> power(0.5, len(arr) - i))), 6) AS DOUBLE) AS ewma10
        |FROM f ORDER BY user_id, ts_us, event_id""".stripMargin,

    "win_pattern_vshape" ->
      """WITH l AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
        |    lag(value, 1) OVER w AS p1, lag(value, 2) OVER w AS p2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |m AS (SELECT * FROM l WHERE p2 > p1 AND p1 < value)
        |SELECT user_id, count(*) AS n_vshapes, min(ts_us) AS first_us,
        |  CAST(round(CAST(sum(CAST(p2 - p1 AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 4) AS DOUBLE) AS avg_drop
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    "win_percent_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        |  CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pct_rank,
        |  CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cume
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice)
        |ORDER BY p_brand, p_retailprice, p_partkey""".stripMargin,
    "win_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "win_rank_dense" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        |       rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
        |       dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
        |FROM part ORDER BY p_brand, p_partkey""".stripMargin,

    "win_lag_delta" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |       lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                               ORDER BY epoch_us(ts), event_id) AS prev_ts,
        |       epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                               ORDER BY epoch_us(ts), event_id) AS delta_us
        |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin,

    "win_running_sum" ->
      """SELECT o_custkey, o_orderdate, o_orderkey,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
        |    AS cum_spend
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "win_rolling_median" ->
      // integer-cents median: every interpolation formula is exact on
      // integer-valued doubles, so DuckDB's median and the engine's
      // explicit two-middle average agree bit-for-bit
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
        |  CAST(median(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 100.0 AS med10
        |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin,

    "win_moving_avg" ->
      """SELECT o_custkey, o_orderdate, o_orderkey,
        |  CAST(round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
        |    OVER w AS DOUBLE) / count(*) OVER w, 4) AS DOUBLE) AS ma3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "win_ntile" ->
      """SELECT c_custkey, c_acctbal,
        |       ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "win_streak" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn_all
        |  FROM events),
        |h AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS rn_hot
        |  FROM e WHERE value > 35),
        |runs AS (SELECT user_id, rn_all - rn_hot AS isl,
        |    count(*) AS len, min(ts_us) AS start_us
        |  FROM h GROUP BY user_id, isl),
        |top AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY len DESC, start_us) AS rk FROM runs)
        |SELECT user_id, CAST(len AS BIGINT) AS streak_len, start_us
        |FROM top WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "win_fill_forward" ->
      """WITH g AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v_gap
        |  FROM events)
        |SELECT user_id, ts_us, event_id, v_gap,
        |  last_value(v_gap IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM g ORDER BY user_id, ts_us, event_id""".stripMargin,

    "win_first_last" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, ts_us, event_id""".stripMargin
  )
}
