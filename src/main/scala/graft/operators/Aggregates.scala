package graft.operators

import graft.{Canon, QueryGroup, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group D (aggregations) — SURVEY.md §2.D.
  *
  * Scale notes: every groupBy here compiles to HashAggregateExec with a
  * partial (map-side) phase before the shuffle, so the exchange moves one
  * row per (partition × group), not per input row — at 100 TB with
  * low-cardinality group keys (6 groups for the flagship) the shuffle is
  * effectively free. Sums over money columns go through exact
  * DECIMAL(18,6) ([[graft.Canon]]) so the partial/final fold order cannot
  * change the emitted bits (hash-compare safety, SURVEY.md §5.3).
  */
object Aggregates extends QueryGroup {

  def queries = Map(
    // Flagship — TPC-H Q1 shape. 6 groups at every sf (verified).
    "agg_pricing_summary" -> { (spark, dir) =>
      Tables.table(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Canon.moneySum(col("l_quantity")).as("sum_qty"),
          Canon.moneySum(col("l_extendedprice")).as("sum_base_price"),
          Canon.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          Canon.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("sum_charge"),
          Canon.meanOf(col("l_quantity")).as("avg_qty"),
          Canon.meanOf(col("l_extendedprice")).as("avg_price"),
          Canon.meanOf(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "agg_distinct" -> { (spark, dir) =>
      Tables.table(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    "agg_multi_distinct" -> { (spark, dir) =>
      Tables.table(spark, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_suppkey")).as("n_supp"))
        .orderBy("l_linestatus")
    },

    "profile_columns" -> { (spark, dir) =>
      // Exact data profile of lineitem: per column, non-null and exact
      // distinct counts — the schema-drift / data-quality primitive of
      // a training pipeline. The 11 distinct aggregates run in GROUPS
      // OF TWO (6 jobs, each a 3-branch Expand) rather than one
      // 12-branch Expand — the r8 VERDICT item-5 decision, measured at
      // sf0.1/local[32] (noop-write, warm): 12-branch 3.4-3.5 s;
      // 3 groups 1.3-1.5 s; 6 groups 0.8-1.0 s. The wide Expand loses
      // on CPU, not I/O: its partial hash-aggregate interleaves 12 gid
      // key spaces in one table (cache-hostile) and materializes 12×
      // rows; small expands stay cache-resident. The k extra scans are
      // nearly free at ANY scale because column pruning makes each
      // group's scan read ONLY its 2 columns — total bytes ≈ one full
      // scan regardless of k. profile_columns_approx remains the
      // 100 TB recommendation (single pass, no Expand at all).
      val df = Tables.table(spark, dir, "lineitem")
      LineitemCols.grouped(2).toSeq.map { g =>
        val aggs = count(lit(1)).as("n_rows") +:
          g.flatMap(c => Seq(
            count(col(c)).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c")))
        val wide = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = g.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
        wide.selectExpr("n_rows",
          s"stack(${g.length}, $stackArgs) AS (col_name, n_nonnull, n_distinct)")
      }.reduce(_ unionAll _)
        .select(col("col_name"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"))
        .orderBy("col_name")
    },

    "profile_columns_approx" -> { (spark, dir) =>
      // the 100 TB sibling of profile_columns (r2 VERDICT item 8):
      // HyperLogLog++ `approx_count_distinct` per column instead of
      // multi-distinct Expand — no row multiplication at all. Sketches
      // merge associatively, so map-side combine works and the shuffle
      // carries fixed-size HLL buffers per partition, independent of
      // cardinality. Like the exact profile, the columns run in
      // GROUPS OF TWO (r9, same measured effect at smaller magnitude:
      // one 11-sketch pass 1.8-2.2 s warm at sf0.1, 2-col groups
      // 1.3-1.4 s — fewer simultaneous HLL buffers stay
      // cache-resident, and column pruning keeps the 6 scans at ≈ one
      // full pass of bytes). Oracle-omitted like the other sketches
      // (approx values are engine-specific); AggregateSpec bounds the
      // error vs the exact profile instead.
      val df = Tables.table(spark, dir, "lineitem")
      LineitemCols.grouped(2).toSeq.map { g =>
        val aggs = count(lit(1)).as("n_rows") +:
          g.flatMap(c => Seq(
            count(col(c)).as(s"nn_$c"),
            approx_count_distinct(col(c), 0.02).as(s"nd_$c")))
        val wide = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = g.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
        wide.selectExpr("n_rows",
          s"stack(${g.length}, $stackArgs) AS (col_name, n_nonnull, approx_distinct)")
      }.reduce(_ unionAll _)
        .select(col("col_name"), col("n_rows"), col("n_nonnull"),
          col("approx_distinct"))
        .orderBy("col_name")
    },

    "agg_rollup" -> { (spark, dir) =>
      // dims are tiny → both joins broadcast (asserted in AggregateSpec)
      Tables.table(spark, dir, "customer").createOrReplaceTempView("ru_customer")
      Tables.table(spark, dir, "nation").createOrReplaceTempView("ru_nation")
      Tables.table(spark, dir, "region").createOrReplaceTempView("ru_region")
      spark.sql("""
        SELECT r_name, n_name, count(*) AS n_cust,
               CAST(grouping(r_name) AS BIGINT) AS g_r,
               CAST(grouping(n_name) AS BIGINT) AS g_n
        FROM ru_customer
        JOIN ru_nation ON c_nationkey = n_nationkey
        JOIN ru_region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
    },

    "agg_cube" -> { (spark, dir) =>
      // pre-aggregate before the cube: cube() plans Expand (×4 grouping
      // sets) on its INPUT, so the naive form re-sums every lineitem row
      // 4× through the double→decimal cast. sum/count are decomposable
      // and decimal partial sums are exact, so cubing the 6 (rf, ls)
      // base cells is bit-identical and skips 3/4 of the row traffic
      // (the same map-side-combine argument holds at 100 TB: the expand
      // fan-out happens after the first partial aggregation, not before).
      val base = Tables.table(spark, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(Canon.Dec)).as("pqty"),
          count(lit(1)).as("pn"))
      base.cube("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("pqty")), 4).cast("double").as("sum_qty"),
          sum(col("pn")).as("n_rows"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    "agg_grouping_sets" -> { (spark, dir) =>
      val c = Tables.table(spark, dir, "customer")
      c.createOrReplaceTempView("gs_customer")
      spark.sql("""
        SELECT c_mktsegment, c_nationkey,
               count(*) AS n_cust,
               CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
               CAST(grouping(c_nationkey) AS BIGINT) AS g_nat
        FROM gs_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY g_seg, g_nat,
                 c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST""")
    },

    "agg_stats" -> { (spark, dir) =>
      // stddev derived from exact decimal moments (count, Σx, Σx²) with
      // the final algebra in double — no raw parallel float aggregate,
      // same policy as means (Canon). The per-row x² decimal conversions
      // may differ from DuckDB's by ~1e-10, but that is ~1e-17 relative
      // at the sum's magnitude and vanishes in the double cast.
      val n = count(lit(1))
      val s1 = sum(col("o_totalprice").cast(Canon.Dec)).cast("double")
      val s2 = sum((col("o_totalprice") * col("o_totalprice"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 10))).cast("double")
      Tables.table(spark, dir, "orders")
        .agg(
          n.as("n_orders"),
          Canon.round4(min(col("o_totalprice"))).as("min_price"),
          Canon.round4(max(col("o_totalprice"))).as("max_price"),
          Canon.round4(sqrt((s2 - s1 * s1 / n) / (n - lit(1))))
            .as("sd_price"),
          Canon.round4(expr("percentile(o_totalprice, 0.5)")).as("median_price"))
    },

    "agg_corr" -> { (spark, dir) =>
      // Pearson correlation from EXACT integer-cents moments (n, Σx, Σy,
      // Σxy, Σx², Σy²) with the final algebra in double — the built-in
      // corr() folds raw doubles in partial-agg order, which is not
      // hash-comparable; the moment form is associative and therefore
      // deterministic at any parallelism (same policy as agg_stats).
      // Pearson r is scale-invariant, so both measures enter as exact
      // centi-unit LONGS (qty ≤ 50 and price < 1.05e5 make every
      // product ≤ 1.1e14 — codegen long multiplies) and only the six
      // SUMS fold in DECIMAL(38,0), overflow-free at any row count.
      // Measured vs the previous all-decimal(38,10) staging: 2.8 s →
      // 0.7 s at sf0.1 — per-row BigDecimal multiplies were the entire
      // cost. One partial+final hash agg, six compact buffers.
      val d0 = org.apache.spark.sql.types.DecimalType(38, 0)
      val xc = expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)")
      val yc = expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
      val n = count(lit(1)).cast("double")
      val sx = sum(xc.cast(d0)).cast("double")
      val sy = sum(yc.cast(d0)).cast("double")
      val sxy = sum((xc * yc).cast(d0)).cast("double")
      val sxx = sum((xc * xc).cast(d0)).cast("double")
      val syy = sum((yc * yc).cast(d0)).cast("double")
      Tables.table(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          Canon.round6((n * sxy - sx * sy)
            / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    },

    "agg_boolean" -> { (spark, dir) =>
      // the conditional/boolean aggregate surface: count_if + bool_and +
      // bool_or per group. All three fold with partial+final combine
      // (AND/OR/sum are associative-commutative), so the shuffle carries
      // one triple per (partition, group) — nothing here degrades at
      // scale. Thresholds chosen non-degenerate on the fixtures: both
      // true and false appear for each boolean column.
      Tables.table(spark, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          expr("count_if(o_totalprice > 300000)").as("n_big"),
          expr("bool_and(o_totalprice > 0)").as("all_pos"),
          expr("bool_or(o_totalprice > 499500)").as("any_huge"))
        .orderBy("o_orderstatus")
    },

    "agg_unpivot" -> { (spark, dir) =>
      // Wide → long reshape (the inverse of agg_pivot): a conditional
      // aggregate builds one row per status with a count per priority
      // prefix, then `unpivot` melts the five measure columns into
      // (status, pri, n) rows. Unpivot is a per-row Expand — no shuffle
      // beyond the one hash agg, and the 5× fanout happens AFTER the
      // aggregate, on |statuses| rows, not on the fact table. That
      // ordering (aggregate first, melt second) is the scale-safe form;
      // melting the raw table first would 5× the shuffle for nothing.
      val wide = Tables.table(spark, dir, "orders")
        .withColumn("pri", substring(col("o_orderpriority"), 1, 1))
        .groupBy("o_orderstatus")
        .agg(
          count(when(col("pri") === "1", 1)).as("p1"),
          count(when(col("pri") === "2", 1)).as("p2"),
          count(when(col("pri") === "3", 1)).as("p3"),
          count(when(col("pri") === "4", 1)).as("p4"),
          count(when(col("pri") === "5", 1)).as("p5"))
      wide.unpivot(
        Array(col("o_orderstatus")),
        Array(col("p1"), col("p2"), col("p3"), col("p4"), col("p5")),
        "pri", "n")
        .orderBy("o_orderstatus", "pri")
    },

    "agg_string_agg" -> { (spark, dir) =>
      // The LISTAGG/string_agg surface: per nation, the ordered CSV of
      // market segments its customers span plus how many distinct ones.
      // Determinism: collect_list order is partition-dependent, so the
      // list is built DISTINCT then sort_array'd before the join —
      // equivalent to string_agg(DISTINCT … ORDER BY …), the only
      // portable listagg form. Two-phase distinct (map-side combine)
      // then a ≤|nations|-row aggregate; the dimension joins broadcast.
      val cust = Tables.table(spark, dir, "customer")
        .select("c_nationkey", "c_mktsegment")
      val nat = Tables.table(spark, dir, "nation")
        .select("n_nationkey", "n_name")
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_mktsegment")).distinct()
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_segments"),
          array_join(sort_array(collect_list(col("c_mktsegment"))), ",")
            .as("segments"))
        .orderBy("n_name")
    },

    "agg_minmax_by" -> { (spark, dir) =>
      // The arg-min/arg-max surface (max_by/min_by): per
      // (returnflag, linestatus), WHICH order carried the priciest and
      // cheapest lineitem. max_by is tie-nondeterministic on raw
      // price, so the ordering key is the exact integer
      // cents·10⁷ + orderkey — unique (orderkey < 10⁷ on every
      // fixture, spec-asserted), pure BIGINT arithmetic in both
      // engines, and it folds with partial+final combine like any
      // max. One hash aggregate, six-row output.
      val key = (floor(col("l_extendedprice") * 100 + 0.5).cast("long")
        * 10000000L + col("l_orderkey"))
      Tables.table(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_orderkey"), col("l_extendedprice"), key.as("k"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          max(col("l_extendedprice")).as("max_price"),
          max_by(col("l_orderkey"), col("k")).as("top_order"),
          min(col("l_extendedprice")).as("min_price"),
          min_by(col("l_orderkey"), col("k")).as("bottom_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "agg_mode" -> { (spark, dir) =>
      // Deterministic mode (most frequent value per group): count →
      // window rank with an explicit value tie-break. Built-in mode()
      // exists in both engines but leaves ties undefined — undefined
      // output can't be hash-compared, so the composed form IS the
      // operator. Two key-compatible shuffles (group count, then rank
      // within status).
      val counted = Tables.table(spark, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
      counted
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("o_orderstatus")
            .orderBy(col("n").desc, col("o_orderpriority"))))
        .filter(col("rk") === 1)
        .select(col("o_orderstatus"),
          col("o_orderpriority").as("mode_priority"), col("n"))
        .orderBy("o_orderstatus")
    },

    "agg_bitmap_distinct" -> { (spark, dir) =>
      // EXACT distinct users per day via bitmap words — the
      // bitmap-index pattern (ClickHouse/Doris `groupBitmap`,
      // Spark's own BitmapCount helpers): pack user ids into 63-bit
      // words (word = id div 63, bit = id mod 63; 63 not 64 because a
      // `1<<63` shift overflows signed int64 in the oracle engine),
      // OR the words per (day, word_idx), then popcount+sum per day.
      // pmod + floor-div keep the encoding total for NEGATIVE ids too
      // (plain `%`/`div` would yield negative bit indices, and shift-
      // count masking silently corrupts words — r4 ADVICE).
      // vs count(DISTINCT): the shuffle carries one int64 per occupied
      // word per day instead of every distinct id, partial aggregation
      // (bit_or is assoc/comm) combines map-side, and day-level rollups
      // of the word table stay mergeable — the same words re-aggregate
      // into week/month exact distincts without touching raw ids. The
      // oracle runs plain count(DISTINCT), so the hash match PROVES the
      // bitmap plan computes true exact cardinality.
      Tables.events(spark, dir)
        .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
        .groupBy(col("day"),
          expr("(user_id - pmod(user_id, 63)) div 63").as("w"))
        .agg(expr("bit_or(shiftleft(1L, int(pmod(user_id, 63))))").as("word"))
        .groupBy("day")
        .agg(expr("sum(bit_count(word))").as("n_users"))
        .orderBy("day")
    },

    // Approx sketches: engine-specific — oracle omitted (SURVEY.md §5.5);
    // unit tests assert error bounds against the exact values.
    "agg_histogram" -> { (spark, dir) =>
      // Fixed-width numeric histogram: 50k-wide bins over o_totalprice
      // with count + exact decimal sum per bin. floor(x / width) on a
      // double is IEEE-identical cross-engine; bins with no rows are
      // absent (the dense/zero-filled form is events_gap_fill's shape).
      // One partial+final hash agg — the profile primitive that actually
      // scales, vs sort-based quantile binning.
      Tables.table(spark, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          Canon.moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("bin")
    },

    "agg_skewness" -> { (spark, dir) =>
      // Skewness + excess kurtosis per return flag from EXACT decimal
      // power sums (s1..s4) — the same moment policy as agg_stats/
      // agg_corr: built-in skewness()/kurtosis() fold raw doubles in
      // partial-agg order and can't be hash-compared. All four sums are
      // associative decimals (one partial+final agg, map-side combine);
      // the closed-form moment arithmetic then runs in scalar doubles,
      // IEEE-identical on both engines given the same expression shape.
      // l_quantity is INTEGRAL (1..50, asserted by the oracle's equal
      // hashes): every power is an exact long ≤ 6.25e6, so products run
      // as codegen long multiplies and only the sums fold in
      // DECIMAL(38,0) — overflow-free at any row count, and each sum is
      // the same exact integer the previous decimal(38,10) staging
      // produced (so the oracle's decimal form keys identically after
      // its one cast to double). Measured: the all-decimal per-row
      // multiplies were ~3× the cost of the whole query.
      val d0 = org.apache.spark.sql.types.DecimalType(38, 0)
      val q = expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")
      Tables.table(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(q.cast(d0)).cast("double").as("s1"),
          sum((q * q).cast(d0)).cast("double").as("s2"),
          sum((q * q * q).cast(d0)).cast("double").as("s3"),
          sum((q * q * q * q).cast(d0)).cast("double").as("s4"))
        .withColumn("m", col("s1") / col("n"))
        .withColumn("sd",
          sqrt((col("s2") - col("s1") * col("s1") / col("n")) / col("n")))
        .select(col("l_returnflag"),
          Canon.round4(
            (col("s3") / col("n")
              - lit(3.0) * col("m") * (col("s2") / col("n"))
              + lit(2.0) * col("m") * col("m") * col("m"))
              / (col("sd") * col("sd") * col("sd"))).as("skewness"),
          Canon.round4(
            (col("s4") / col("n")
              - lit(4.0) * col("m") * (col("s3") / col("n"))
              + lit(6.0) * col("m") * col("m") * (col("s2") / col("n"))
              - lit(3.0) * col("m") * col("m") * col("m") * col("m"))
              / (col("sd") * col("sd") * col("sd") * col("sd"))
              - lit(3.0)).as("kurtosis"))
        .orderBy("l_returnflag")
    },

    "agg_approx_distinct" -> { (spark, dir) =>
      Tables.events(spark, dir)
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
    },

    "agg_hll_merge" -> { (spark, dir) =>
      // Mergeable-sketch architecture (DataSketches HLL via Spark 4's
      // hll_sketch_agg/hll_union_agg): per-nation customer sketches
      // UNION to the corpus sketch without rescanning — the only
      // distinct-count architecture that works at 100 TB (sketch per
      // partition/day at ingest, merge on demand; bytes moved = k·few
      // KB, not the key universe). HLL updates are order-insensitive so
      // the estimates are deterministic, but no DuckDB oracle exists
      // (different HLL implementation) — rows-only here; AggregateSpec
      // proves the two laws that matter: merged == direct (losslessness
      // of the union) and |est − exact| inside the lgK error bound.
      val c = Tables.table(spark, dir, "customer")
      val perNation = c.groupBy("c_nationkey")
        .agg(expr("hll_sketch_agg(c_custkey)").as("s"))
      val merged = perNation
        .agg(expr("hll_sketch_estimate(hll_union_agg(s))").as("est_merged"))
      val direct = c.agg(
        expr("hll_sketch_estimate(hll_sketch_agg(c_custkey))").as("est_direct"),
        countDistinct(col("c_custkey")).as("exact"))
      merged.crossJoin(direct)
        .select(col("est_merged").cast("long").as("est_merged"),
          col("est_direct").cast("long").as("est_direct"), col("exact"))
    },

    "agg_approx_quantile" -> { (spark, dir) =>
      Tables.events(spark, dir)
        .agg(
          expr("percentile_approx(value, 0.5)").as("p50"),
          expr("percentile_approx(value, 0.95)").as("p95"))
    },

    "agg_kmv_distinct" -> { (spark, dir) =>
      // K-Minimum-Values distinct sketch (k = 64) per event type — the
      // ONE sketch in the family with a FULL oracle: KMV has no RNG and
      // no implementation-defined binning (unlike HLL/percentile_approx,
      // rows-only above), just "the k smallest values of a fixed hash",
      // so both engines compute the identical estimate and the driver
      // hash-compares sketch AND exact twin side by side. Estimator:
      // (k−1)·2^56/h_k (uniform sha-56 hash). Plan: distinct (type,
      // hash) pairs first (map-side partial distinct), then a per-type
      // rank selects h_k — at 100 TB the rank window over distinct
      // hashes is replaced by a bounded k-heap aggregate, same answer;
      // the sketch's point is that the k-row state merges across
      // partitions/days without rescanning (union = keep k smallest).
      val k = 64
      val h = TextDedup.hash56(
        concat(lit("kmv|"), col("user_id").cast("string")))
      val hashes = Tables.events(spark, dir)
        .select(col("event_type"), h.as("h")).distinct()
      val kth = hashes
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy("h")))
        .filter(col("rk") === k)
        .select(col("event_type").as("kt"), col("h").as("hk"))
      val exact = Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      val est = when(col("hk").isNull, col("n_exact").cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(72057594037927936.0)
          / col("hk").cast("double"))
      exact.join(broadcast(kth), col("event_type") === col("kt"), "left")
        .select(col("event_type"), col("n_exact"),
          Canon.round2(est).as("kmv_est"),
          Canon.round6(abs(est - col("n_exact"))
            / col("n_exact")).as("rel_err"))
        .orderBy("event_type")
    },

    "agg_topk_exact" -> { (spark, dir) =>
      // EXACT corpus heavy hitters — the oracle-checked twin of
      // agg_topk_approx (same pairing policy as agg_approx_distinct /
      // agg_hll_merge): top-20 tokens by raw term count, ties to the
      // smaller token. Partial+final hash agg over the vocabulary, then
      // TakeOrderedAndProject — never a global sort. At 100 TB the
      // vocabulary-sized shuffle is exactly what the sketch twin avoids.
      Tables.table(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)
    },

    "agg_topk_approx" -> { (spark, dir) =>
      // Misra-Gries frequent-items sketch (r4 VERDICT item 4): top-20
      // tokens by merged m=64-counter summaries — one corpus pass,
      // ≤ partitions·64 rows shuffled instead of the vocabulary. No
      // cross-engine oracle exists (summary content depends on the
      // engine's partition layout), so rows-only here — AggregateSpec
      // proves the underestimate / error-bound / heavy-hitter-coverage
      // laws against the exact counts, the same pattern as agg_hll_merge.
      Sketches.misraGriesTokens(
          Tables.table(spark, dir, "documents"), "text", m = 64)
        .orderBy(col("est").desc, col("token")).limit(20)
    },

    "agg_weighted_median" -> { (spark, dir) =>
      // Exact weighted median (quantity weighted by revenue) per
      // returnflag — the value-histogram form: one hash agg collapses
      // the table to ≤ |distinct values| rows per group with exact
      // decimal weight sums, a per-group prefix sum walks that tiny
      // histogram, and the median is the first value whose cumulative
      // weight reaches half the total. Nothing global, nothing sorted
      // at table scale — the shape every "approx weighted quantile is
      // not enough" pipeline uses when the value domain is bounded
      // (quantities, sizes, ratings). All comparisons are exact
      // decimal·2 vs decimal — no float threshold ulp hazard.
      val byVal = Tables.table(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(sum(col("l_extendedprice").cast(Canon.Dec)).as("wsum"))
      val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byVal
        .withColumn("cum", sum("wsum").over(w))
        .withColumn("tot",
          sum("wsum").over(Window.partitionBy("l_returnflag")))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy("l_returnflag")
        .agg(min("l_quantity").as("w_median"))
        .orderBy("l_returnflag")
    }
  )

  /** lineitem's column set, sorted — shared by profile_columns and its
    * oracle so the two can never drift apart.
    */
  private val LineitemCols = Seq("l_discount", "l_extendedprice",
    "l_linenumber", "l_linestatus", "l_orderkey", "l_partkey", "l_quantity",
    "l_returnflag", "l_shipdate", "l_suppkey", "l_tax")

  def oracle = Map(
    "agg_weighted_median" ->
      """WITH bv AS (SELECT l_returnflag, l_quantity,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS wsum
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, l_quantity,
        |    sum(wsum) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(wsum) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM bv)
        |SELECT l_returnflag, min(l_quantity) AS w_median
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_topk_exact" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS n FROM tok
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "agg_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    CAST(concat('0x', substring(sha256(
        |      concat('kmv|', CAST(user_id AS VARCHAR))), 1, 14))
        |      AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h, row_number() OVER
        |    (PARTITION BY event_type ORDER BY h) AS rk FROM h),
        |kth AS (SELECT event_type AS kt, h AS hk FROM r WHERE rk = 64),
        |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
        |  FROM events GROUP BY 1),
        |j AS (SELECT event_type, n_exact,
        |    CASE WHEN hk IS NULL THEN CAST(n_exact AS DOUBLE)
        |      -- e-notation forces DOUBLE: a decimal literal product
        |      -- of 63.0 · 2^56 overflows DECIMAL(18)
        |      ELSE 63.0 * 7.2057594037927936e16 / CAST(hk AS DOUBLE) END
        |      AS est
        |  FROM ex LEFT JOIN kth ON event_type = kt)
        |SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
        |  CAST(round(est, 2) AS DOUBLE) AS kmv_est,
        |  CAST(round(abs(est - n_exact) / n_exact, 6) AS DOUBLE)
        |    AS rel_err
        |FROM j ORDER BY event_type""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY bin ORDER BY bin""".stripMargin,

    "agg_skewness" ->
      """WITH s AS (SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,10)))
        |      AS DOUBLE) AS s2,
        |    CAST(sum(CAST(l_quantity * l_quantity * l_quantity
        |      AS DECIMAL(38,10))) AS DOUBLE) AS s3,
        |    CAST(sum(CAST(l_quantity * l_quantity * l_quantity * l_quantity
        |      AS DECIMAL(38,10))) AS DOUBLE) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (SELECT *, s1 / n AS m,
        |    sqrt((s2 - s1 * s1 / n) / n) AS sd FROM s)
        |SELECT l_returnflag,
        |  CAST(round((s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m)
        |    / (sd * sd * sd), 4) + 0.0 AS DOUBLE) AS skewness,
        |  CAST(round((s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n)
        |    - 3.0 * m * m * m * m) / (sd * sd * sd * sd) - 3.0, 4) + 0.0
        |    AS DOUBLE) AS kurtosis
        |FROM m ORDER BY l_returnflag""".stripMargin,
        // ^ `+ 0.0` normalizes DuckDB round()'s IEEE -0.0 (a tiny
        // negative skew rounds to signed zero at sf0.001) to the +0.0
        // Spark's long-typed floor always yields — same -0.0 class of
        // hash mismatch the driver caught on events_trend in r6.

    "profile_columns" ->
      (LineitemCols.map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct
           |  FROM lineitem""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),

    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_charge,
        |  CAST(round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_qty,
        |  CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_price,
        |  CAST(round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_corr" ->
      // identical integer-cents staging: every sum is an exact integer
      // in DECIMAL(38,0), cast to double exactly once
      """WITH c AS (SELECT l_returnflag,
        |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS xc,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS yc
        |  FROM lineitem),
        |s AS (SELECT l_returnflag, count(*) AS n_rows,
        |    CAST(sum(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(yc AS DECIMAL(38,0))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(xc * yc AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(xc * xc AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(yc * yc AS DECIMAL(38,0))) AS DOUBLE) AS syy
        |  FROM c GROUP BY l_returnflag)
        |SELECT l_returnflag, n_rows,
        |  CAST(round(
        |    (n_rows * sxy - sx * sy)
        |    / (sqrt(n_rows * sxx - sx * sx) * sqrt(n_rows * syy - sy * sy)),
        |  6) AS DOUBLE) AS corr_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "agg_boolean" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  count(*) FILTER (WHERE o_totalprice > 300000) AS n_big,
        |  bool_and(o_totalprice > 0) AS all_pos,
        |  bool_or(o_totalprice > 499500) AS any_huge
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "agg_unpivot" ->
      // DuckDB lacks Spark's unpivot relation; the UNION ALL over the
      // wide CTE is the same reshape expressed relationally.
      """WITH w AS (SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_orderpriority LIKE '1%') AS p1,
        |  count(*) FILTER (WHERE o_orderpriority LIKE '2%') AS p2,
        |  count(*) FILTER (WHERE o_orderpriority LIKE '3%') AS p3,
        |  count(*) FILTER (WHERE o_orderpriority LIKE '4%') AS p4,
        |  count(*) FILTER (WHERE o_orderpriority LIKE '5%') AS p5
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, 'p1' AS pri, p1 AS n FROM w
        |UNION ALL SELECT o_orderstatus, 'p2', p2 FROM w
        |UNION ALL SELECT o_orderstatus, 'p3', p3 FROM w
        |UNION ALL SELECT o_orderstatus, 'p4', p4 FROM w
        |UNION ALL SELECT o_orderstatus, 'p5', p5 FROM w
        |ORDER BY o_orderstatus, pri""".stripMargin,

    "agg_string_agg" ->
      """WITH d AS (SELECT DISTINCT n_name, c_mktsegment
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, count(*) AS n_segments,
        |  string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
        |FROM d GROUP BY n_name ORDER BY n_name""".stripMargin,

    "agg_minmax_by" ->
      """WITH l AS (SELECT l_returnflag, l_linestatus, l_orderkey,
        |    l_extendedprice,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 10000000
        |      + l_orderkey AS k
        |  FROM lineitem)
        |SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  max(l_extendedprice) AS max_price,
        |  arg_max(l_orderkey, k) AS top_order,
        |  min(l_extendedprice) AS min_price,
        |  arg_min(l_orderkey, k) AS bottom_order
        |FROM l GROUP BY 1, 2
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_mode" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |           FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |        ORDER BY n DESC, o_orderpriority) AS rk FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, n
        |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,

    // Plain count(DISTINCT) on purpose: the oracle asserts the bitmap
    // plan's SEMANTICS (exact cardinality), not its physical shape.
    "agg_bitmap_distinct" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id
        |           FROM events)
        |SELECT day, count(DISTINCT user_id) AS n_users
        |FROM e GROUP BY day ORDER BY day""".stripMargin,

    "agg_multi_distinct" ->
      """SELECT l_linestatus, count(DISTINCT l_partkey) AS n_part,
        |       count(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |       CAST(grouping(r_name) AS BIGINT) AS g_r, CAST(grouping(n_name) AS BIGINT) AS g_n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf, CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS n_cust,
        |       CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg, CAST(grouping(c_nationkey) AS BIGINT) AS g_nat
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY g_seg, g_nat,
        |         c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST""".stripMargin,

    "agg_stats" ->
      """SELECT count(*) AS n_orders,
        |  CAST(round(min(o_totalprice), 4) AS DOUBLE) AS min_price,
        |  CAST(round(max(o_totalprice), 4) AS DOUBLE) AS max_price,
        |  CAST(round(sqrt(
        |    (CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(38,10))) AS DOUBLE)
        |     - CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |       * CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*))
        |    / (count(*) - 1)), 4) AS DOUBLE) AS sd_price,
        |  CAST(round(quantile_cont(o_totalprice, 0.5), 4) AS DOUBLE) AS median_price
        |FROM orders""".stripMargin
  )
}
