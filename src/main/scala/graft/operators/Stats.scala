package graft.operators

import graft.{Canon, QueryGroup, Tables}
import org.apache.spark.sql.functions._

/** Inferential statistics over telemetry — the hypothesis-testing layer a
  * fleet-analytics service runs on top of its aggregates: per-segment
  * Welch t statistics, a chi-square independence test, and the
  * Kolmogorov–Smirnov distance between signal distributions.
  *
  * Numeric policy (the Canon.scala discipline, extended to test
  * statistics): every MOMENT (Σx, Σx²) accumulates in EXACT decimal —
  * associative, so partial aggregation order cannot change a bit — and
  * the closed-form statistic combines the per-group scalars in one fixed
  * IEEE expression, identical in Spark and DuckDB. Where a final Σ over
  * cells of double contributions is needed (chi-square), each cell's
  * contribution is quantized to nano-units on a long FIRST, so the fold
  * is exact integer addition (a parallel double sum would be
  * order-sensitive — the float-sum trap). `max` (KS) is order-insensitive
  * already. p-values need transcendental CDFs that differ across engines;
  * the test STATISTIC is the deterministic, mergeable part — thresholds
  * are a lookup the caller applies.
  *
  * Scale: one groupBy over the fact table per query (map-side combined),
  * then arithmetic over ≤ |groups| rows; KS's one unpartitioned window
  * runs over distinct VALUES after aggregation (the documented two-phase
  * pattern — never over raw rows).
  */
object Stats extends QueryGroup {

  private val DecV = "DECIMAL(18,6)"

  def queries = Map(
    "stat_ttest" -> { (spark, dir) =>
      // Welch's t for each event_type vs the REST of the fleet: does
      // this event class carry a different mean signal value? Exact
      // decimal Σx / Σx² per type (one map-side-combined groupBy), the
      // complement's moments by subtracting from broadcast totals —
      // one pass over the facts, 5 output rows, every double op in
      // fixed scalar order.
      val ev = Tables.events(spark, dir)
        .select(col("event_type"),
          col("value").cast(Canon.Dec).as("v"),
          (col("value").cast(Canon.Dec) * col("value").cast(Canon.Dec)).as("v2"))
      val per = ev.groupBy("event_type").agg(
        count(lit(1)).as("n1"), sum("v").as("s1"), sum("v2").as("q1"))
      val tot = ev.agg(count(lit(1)).as("nt"),
        sum("v").as("st"), sum("v2").as("qt"))
      per.crossJoin(broadcast(tot))
        .withColumn("n0", col("nt") - col("n1"))
        .withColumn("s1d", col("s1").cast("double"))
        .withColumn("q1d", col("q1").cast("double"))
        .withColumn("s0d", (col("st") - col("s1")).cast("double"))
        .withColumn("q0d", (col("qt") - col("q1")).cast("double"))
        .withColumn("m1", col("s1d") / col("n1"))
        .withColumn("m0", col("s0d") / col("n0"))
        .withColumn("var1",
          (col("q1d") - col("s1d") * col("s1d") / col("n1")) / (col("n1") - 1))
        .withColumn("var0",
          (col("q0d") - col("s0d") * col("s0d") / col("n0")) / (col("n0") - 1))
        .withColumn("t_stat", Canon.round6(
          (col("m1") - col("m0"))
            / sqrt(col("var1") / col("n1") + col("var0") / col("n0"))))
        .select(col("event_type"), col("n1"), col("n0"),
          Canon.round6(col("m1")).as("mean_in"),
          Canon.round6(col("m0")).as("mean_rest"), col("t_stat"))
        .orderBy("event_type")
    },

    "events_weekend_effect" -> { (spark, dir) =>
      // Weekend-vs-weekday Welch t PER STREAM — stat_ttest's machinery
      // pointed at the question an ops review actually asks ("does this
      // signal behave differently on weekends?"). The split key is pure
      // integer calendar arithmetic on epoch-days ((day + 4) % 7 ≥ 5 —
      // 1970-01-01 was a Thursday), both groups' moments come from ONE
      // map-side-combined (type, is_weekend) aggregate, and the t
      // collapses exact-decimal sums in fixed IEEE order. 5 output rows
      // per corpus at any scale.
      val DayUs = 86400000000L
      val ev = Tables.events(spark, dir)
        .select(col("event_type"),
          (expr(s"(ts_us div $DayUs + 4) % 7") >= 5).as("wk"),
          col("value").cast(Canon.Dec).as("v"),
          (col("value").cast(Canon.Dec) * col("value").cast(Canon.Dec))
            .as("v2"))
      val per = ev.groupBy("event_type", "wk").agg(
        count(lit(1)).as("n"), sum("v").as("s"), sum("v2").as("q"))
      val we = per.filter(col("wk")).drop("wk")
        .select(col("event_type"), col("n").as("n1"),
          col("s").as("s1"), col("q").as("q1"))
      val wd = per.filter(!col("wk")).drop("wk")
        .select(col("event_type"), col("n").as("n0"),
          col("s").as("s0"), col("q").as("q0"))
      we.join(wd, "event_type")
        .withColumn("s1d", col("s1").cast("double"))
        .withColumn("q1d", col("q1").cast("double"))
        .withColumn("s0d", col("s0").cast("double"))
        .withColumn("q0d", col("q0").cast("double"))
        .withColumn("m1", col("s1d") / col("n1"))
        .withColumn("m0", col("s0d") / col("n0"))
        .withColumn("var1",
          (col("q1d") - col("s1d") * col("s1d") / col("n1")) / (col("n1") - 1))
        .withColumn("var0",
          (col("q0d") - col("s0d") * col("s0d") / col("n0")) / (col("n0") - 1))
        .withColumn("t_stat", Canon.round6(
          (col("m1") - col("m0"))
            / sqrt(col("var1") / col("n1") + col("var0") / col("n0"))))
        .select(col("event_type"), col("n1").as("n_weekend"),
          col("n0").as("n_weekday"),
          Canon.round6(col("m1")).as("mean_weekend"),
          Canon.round6(col("m0")).as("mean_weekday"), col("t_stat"))
        .orderBy("event_type")
    },

    "stat_chisq" -> { (spark, dir) =>
      // Chi-square independence of event_type × value band (5 × 5
      // contingency from one groupBy; bands are exact integer
      // floor(value/100)). Expected counts and each cell's (O−E)²/E are
      // rational functions of INTEGER totals — computed in fixed IEEE
      // order, then quantized to nano-units before the final fold so
      // the cross-cell sum is exact long addition regardless of
      // partial-agg order. Output: the statistic + degrees of freedom.
      val cells = Tables.events(spark, dir)
        .select(col("event_type"), expr("CAST(floor(value / 100) AS BIGINT)").as("band"))
        .groupBy("event_type", "band").agg(count(lit(1)).as("o"))
      val rows = cells.groupBy("event_type").agg(sum("o").as("rt"))
      val cols_ = cells.groupBy("band").agg(sum("o").as("ct"))
      val n = cells.agg(sum("o").as("nt"))
      cells.join(broadcast(rows), "event_type")
        .join(broadcast(cols_), "band")
        .crossJoin(broadcast(n))
        .withColumn("e",
          col("rt").cast("double") * col("ct").cast("double") / col("nt").cast("double"))
        .withColumn("contrib_nano",
          floor((col("o") - col("e")) * (col("o") - col("e")) / col("e") * 1e9 + 0.5)
            .cast("long"))
        .agg(count(lit(1)).as("n_cells"),
          (sum("contrib_nano").cast("double") / 1e9).as("chisq_raw"),
          first(col("nt")).as("n"))
        .select(Canon.round6(col("chisq_raw")).as("chisq"),
          (col("n_cells") - 1).as("cells_minus_1"), col("n"))
    },

    "stat_ks" -> { (spark, dir) =>
      // Two-sample Kolmogorov–Smirnov distance between the value
      // distributions of 'click' and 'view' events: D = max over the
      // pooled support of |F̂₁ − F̂₂|. Phase 1 collapses 100k raw rows
      // to |distinct values| counting rows (map-side combined); phase 2
      // is a running-sum window over that SMALL aggregated set (the
      // two-phase pattern events_concurrency documents) and an
      // order-insensitive max. Counts are exact longs; each |Δ| is one
      // fixed-order scalar expression.
      val ev = Tables.events(spark, dir)
        .filter(col("event_type").isin("click", "view"))
        .groupBy("value").agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("value")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = ev.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      ev.withColumn("r1", sum("c1").over(w))
        .withColumn("r2", sum("c2").over(w))
        .crossJoin(broadcast(tot))
        .withColumn("gap", abs(
          col("r1").cast("double") / col("n1").cast("double")
            - col("r2").cast("double") / col("n2").cast("double")))
        .agg(max("gap").as("gap_max"), first("n1").as("n1"), first("n2").as("n2"))
        .select(Canon.round6(col("gap_max")).as("d_stat"), col("n1"), col("n2"))
    },

    "stat_mannwhitney" -> { (spark, dir) =>
      // Mann-Whitney U (Wilcoxon rank-sum) between 'click' and 'view'
      // signal values — the nonparametric sibling of stat_ttest, robust
      // to the non-normal value distribution. Ranks stay EXACT under
      // ties by working in doubled units: a tied block of c values after
      // `prev` cumulative rows has average rank prev + (c+1)/2, i.e.
      // 2·avgrank = 2·prev + c + 1 — an integer. So the rank-sum R1 and
      // U1 = R1 − n1(n1+1)/2 accumulate as exact longs (doubled), and
      // the tie-corrected variance's Σ(t³−t) is an exact long too; the
      // z statistic is ONE fixed-order IEEE expression at the end.
      // Scale: phase 1 is a map-side-combined groupBy collapsing raw
      // rows to |distinct values|; phase 2's running-count window runs
      // over that aggregated grid only (the KS/two-phase discipline).
      val ev = Tables.events(spark, dir)
        .filter(col("event_type").isin("click", "view"))
        .groupBy("value").agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
        .withColumn("c", col("c1") + col("c2"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("value")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      ev.withColumn("prev", coalesce(sum("c").over(w), lit(0L)))
        // doubled average rank of every row tied at this value
        .withColumn("r2x", lit(2L) * col("prev") + col("c") + lit(1L))
        .agg(
          sum("c1").as("n1"), sum("c2").as("n2"),
          sum(col("c1") * col("r2x")).as("rank1_2x"),
          sum(col("c") * col("c") * col("c") - col("c")).as("ties3"))
        .withColumn("u1_2x",
          col("rank1_2x") - col("n1") * (col("n1") + 1L))
        .withColumn("nt", col("n1") + col("n2"))
        .withColumn("mu2x", col("n1") * col("n2"))          // 2·E[U] = n1·n2
        .withColumn("var_u",
          col("n1").cast("double") * col("n2").cast("double") / 12.0d
            * ((col("nt") + 1L).cast("double")
               - col("ties3").cast("double")
                 / (col("nt").cast("double") * (col("nt") - 1L).cast("double"))))
        .withColumn("z_stat", Canon.round6(
          (col("u1_2x") - col("mu2x")).cast("double") / 2.0d / sqrt(col("var_u"))))
        .select(col("n1"), col("n2"),
          (col("u1_2x").cast("double") / 2.0d).as("u_stat"), col("z_stat"))
    },

    "stat_spearman" -> { (spark, dir) =>
      // Spearman rank correlation between TIME and value per vehicle —
      // the robust monotone-trend test (is this signal drifting?):
      // outlier-immune where events_trend's least-squares slope is not.
      // Exactness: average ranks carried as ×2 integers
      // (2·rank + tiecount − 1), then CENTERED by (n+1) — Σ of the ×2
      // average ranks is n(n+1) identically, so the centered moments
      // Σcx·cy, Σcx², Σcy² are exact LONGs (|c| ≤ n ⇒ sums ≤ n³:
      // long-exact to n ≈ 2M rows per entity, double-exact to n ≈ 200k
      // — beyond that, recast the three sums to decimal) and the two
      // engines agree bit-for-bit before the one fixed-order IEEE
      // division. Plan: ONE user_id exchange, two in-partition sorts
      // (by t, by v) feeding the four window functions, one keyed agg —
      // the entity-keyed window discipline, no unpartitioned window.
      // r14: 64k-floor child session — four window functions over two
      // in-partition sorts on one byte-small exchange; the 1m default
      // serializes them (+0.18-0.53 s in all three 32c A/B pairs —
      // [[QueryGroup.cpuDenseSession]])
      val ev = Tables.events(QueryGroup.cpuDenseSession(spark), dir)
        .select(col("user_id"), col("ts_us").as("t"), col("value").as("v"))
      import org.apache.spark.sql.expressions.Window
      val wu = Window.partitionBy("user_id")
      def cRank(order: String, tie: String): org.apache.spark.sql.Column =
        lit(2L) * rank().over(wu.orderBy(col(order))).cast("long") +
          count(lit(1)).over(Window.partitionBy(col("user_id"), col(tie))) -
          lit(1L) - (count(lit(1)).over(wu) + lit(1L))
      ev.withColumn("cx", cRank("t", "t"))
        .withColumn("cy", cRank("v", "v"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("cx") * col("cy")).as("sxy"),
          sum(col("cx") * col("cx")).as("sxx"),
          sum(col("cy") * col("cy")).as("syy"))
        .filter(col("n") >= 30 && col("sxx") > 0 && col("syy") > 0)
        .select(col("user_id"), col("n"),
          Canon.round6(col("sxy").cast("double") /
            (sqrt(col("sxx").cast("double")) *
             sqrt(col("syy").cast("double")))).as("rho"))
        .orderBy("user_id")
    },

    "events_dispersion" -> { (spark, dir) =>
      // Poisson DISPERSION index per event type — variance/mean of the
      // daily arrival counts over observed days (D ≈ 1 ⇒ Poisson-like
      // arrivals; D > 1 ⇒ bursty, D < 1 ⇒ paced): the burstiness
      // screen an ingest monitor runs before alert thresholds assume
      // Poisson noise. Counts are exact longs; the two moments stay
      // integers up to one fixed-order IEEE division each. Plan: two
      // keyed aggregates (events → daily grid → per-type moments),
      // output |types| rows.
      val DayUs = 86400000000L
      val daily = Tables.events(spark, dir)
        .groupBy(col("event_type"), expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("c"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("c").as("s1"),
          sum(col("c") * col("c")).as("s2"))
        .withColumn("mean", col("s1").cast("double") / col("n_days"))
        .withColumn("vr",
          (col("s2").cast("double")
            - col("s1").cast("double") * col("s1") / col("n_days"))
            / (col("n_days") - 1))
        .select(col("event_type"), col("n_days"),
          Canon.round6(col("mean")).as("mean_daily"),
          Canon.round6(col("vr")).as("var_daily"),
          Canon.round6(col("vr") / col("mean")).as("dispersion"))
        .orderBy("event_type")
    },

    "stat_ztest_prop" -> { (spark, dir) =>
      // TWO-PROPORTION z — does the error RATE differ on weekends?
      // The proportions counterpart of events_weekend_effect's Welch t
      // on means: counts are exact longs off one groupBy (the same
      // (epochday+4)%7 calendar split), the pooled-variance z is one
      // fixed-order IEEE expression over four scalars. Single-row
      // output; the statistic is the deterministic mergeable part,
      // thresholds are the caller's lookup (the Stats policy).
      val DayUs = 86400000000L
      val ev = Tables.events(spark, dir)
        .withColumn("wk", (expr(s"ts_us div $DayUs") + 4) % 7 >= 5)
      ev.agg(
          sum(when(col("wk"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("wk") && col("event_type") === "error", 1L)
            .otherwise(0L)).as("x1"),
          sum(when(!col("wk"), 1L).otherwise(0L)).as("n0"),
          sum(when(!col("wk") && col("event_type") === "error", 1L)
            .otherwise(0L)).as("x0"))
        .withColumn("p1", col("x1").cast("double") / col("n1"))
        .withColumn("p0", col("x0").cast("double") / col("n0"))
        .withColumn("p", (col("x1") + col("x0")).cast("double")
          / (col("n1") + col("n0")))
        .select(col("n1"), col("x1"), col("n0"), col("x0"),
          Canon.round6(col("p1")).as("p_weekend"),
          Canon.round6(col("p0")).as("p_weekday"),
          Canon.round6((col("p1") - col("p0"))
            / sqrt(col("p") * (lit(1.0) - col("p"))
              * (lit(1.0) / col("n1") + lit(1.0) / col("n0"))))
            .as("z_stat"))
    },

    "stat_kruskal" -> { (spark, dir) =>
      // Kruskal–Wallis H across event types — the rank-based one-way
      // ANOVA (does ANY type's value distribution sit higher?), robust
      // where stat_anova's means are not. GLOBAL ranks without a
      // global sort: values quantize to cents, so average ranks come
      // off the VALUE GRID — per distinct cent c with count tc and
      // cumulative cum, the ×2 average rank is 2·cum − tc + 1, exact
      // integers end-to-end (the agg_histogram_equidepth two-phase:
      // the one unpartitioned window runs over ≤ ~49k distinct cents,
      // never raw rows). Per-group rank sums are exact longs; the five
      // R²/n terms are IEEE-deterministic doubles summed by an ORDERED
      // fold (sort_array → aggregate) because a parallel double sum's
      // order is not reproducible. Tie correction Σ(t³−t) in decimal.
      val ev = Tables.events(spark, dir)
        .select(col("event_type"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      val grid = ev.groupBy("c").agg(count(lit(1)).as("tc"))
        .withColumn("cum", sum("tc").over(
          org.apache.spark.sql.expressions.Window.orderBy("c")))
        .withColumn("r2", lit(2L) * col("cum") - col("tc") + 1L)
      val perGroup = ev.groupBy("event_type", "c")
        .agg(count(lit(1)).as("cgv"))
        .join(grid.select("c", "r2"), "c")
        .groupBy("event_type")
        .agg(sum(col("cgv")).as("ng"), sum(col("cgv") * col("r2")).as("rr2"))
      val ties = grid.agg(
        sum(col("tc").cast(Canon.Dec) * col("tc") * col("tc") - col("tc"))
          .cast("double").as("tsum"))
      perGroup
        .withColumn("term",
          (col("rr2").cast("double") * col("rr2").cast("double"))
            / col("ng").cast("double"))
        .agg(sum("ng").as("n"),
          expr("aggregate(array_sort(collect_list(term)), 0D," +
            " (acc, x) -> acc + x)").as("s"))
        .crossJoin(broadcast(ties))
        .withColumn("h",
          lit(3.0) * col("s") / (col("n").cast("double") * (col("n") + 1L))
            - lit(3.0) * (col("n") + 1L).cast("double"))
        .withColumn("corr", lit(1.0) - col("tsum") /
          (col("n").cast("double") * col("n") * col("n")
            - col("n").cast("double")))
        .select(col("n"), Canon.round6(col("h")).as("h"),
          // corr = 0 only when EVERY value is one tie group (tsum =
          // N³−N) — H' is undefined there; NULL, not a NaN/Inf hash
          // hazard (the dedup_lsh_tuning empty-config lesson)
          when(col("corr") > 0,
            Canon.round6(col("h") / col("corr"))).as("h_tied"))
    },

    "stat_anova" -> { (spark, dir) =>
      // One-way ANOVA F statistic across the five event_type groups:
      // does mean signal value differ anywhere in the fleet? Per-group
      // moments (n, Σv, Σv²) in exact decimal from ONE map-side-combined
      // groupBy; SSB = Σ s_g²/n_g − S²/N and SSW = Σ(q_g − s_g²/n_g)
      // need a cross-GROUP sum of double contributions, so each group's
      // term is quantized to nano-units on a long FIRST (the stat_chisq
      // fold discipline) — the Σ over groups is then exact integer
      // addition, immune to partial-agg order. F combines the four
      // scalars in one fixed IEEE expression. Magnitude bound: nano-
      // quantizing caps each group term at int64/1e9 ≈ 9.2e9 value-
      // units²; with |value| ≤ 1e3 in this schema that allows n_g up to
      // ~9e3 × 1e3 ≈ 9.2e6 rows per group per unit variance — beyond
      // that (true 100 TB group sizes) quantize at a coarser scale
      // derived from the group totals (e.g. 1e9/max(sg²/ng)) or keep
      // the fold in DECIMAL(38,9); the cross-engine determinism
      // argument is the quantization itself, not the nano choice.
      val ev = Tables.events(spark, dir)
        .select(col("event_type"),
          col("value").cast(Canon.Dec).as("v"),
          (col("value").cast(Canon.Dec) * col("value").cast(Canon.Dec)).as("v2"))
      val per = ev.groupBy("event_type").agg(
        count(lit(1)).as("ng"), sum("v").as("sg"), sum("v2").as("qg"))
        .withColumn("sg2_over_n_nano",
          floor(col("sg").cast("double") * col("sg").cast("double")
            / col("ng").cast("double") * 1e9 + 0.5d).cast("long"))
        .withColumn("qg_nano",
          floor(col("qg").cast("double") * 1e9 + 0.5d).cast("long"))
      per.agg(
        count(lit(1)).as("k"), sum("ng").as("n"),
        sum("sg").as("s_tot"),
        sum("sg2_over_n_nano").as("between_nano"),
        sum(col("qg_nano") - col("sg2_over_n_nano")).as("within_nano"))
        .withColumn("ssb",
          col("between_nano").cast("double") / 1e9
            - col("s_tot").cast("double") * col("s_tot").cast("double")
              / col("n").cast("double"))
        .withColumn("ssw", col("within_nano").cast("double") / 1e9)
        .withColumn("f_stat", Canon.round6(
          (col("ssb") / (col("k") - 1L).cast("double"))
            / (col("ssw") / (col("n") - col("k")).cast("double"))))
        .select(col("k"), col("n"), Canon.round6(col("ssb")).as("ssb"),
          Canon.round6(col("ssw")).as("ssw"), col("f_stat"))
    }
  )

  def oracle = Map(
    "events_dispersion" ->
      """WITH d AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT event_type, count(*) AS n_days,
        |    CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM d GROUP BY 1),
        |f AS (SELECT event_type, n_days,
        |    CAST(s1 AS DOUBLE) / n_days AS mean,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_days)
        |      / (n_days - 1) AS vr
        |  FROM a)
        |SELECT event_type, n_days,
        |  CAST(CASE WHEN mean >= 0 THEN floor(mean * 1e6 + 0.5) / 1e6
        |       ELSE -floor(-mean * 1e6 + 0.5) / 1e6 END AS DOUBLE)
        |    AS mean_daily,
        |  CAST(CASE WHEN vr >= 0 THEN floor(vr * 1e6 + 0.5) / 1e6
        |       ELSE -floor(-vr * 1e6 + 0.5) / 1e6 END AS DOUBLE)
        |    AS var_daily,
        |  CAST(CASE WHEN vr / mean >= 0
        |       THEN floor(vr / mean * 1e6 + 0.5) / 1e6
        |       ELSE -floor(-(vr / mean) * 1e6 + 0.5) / 1e6 END AS DOUBLE)
        |    AS dispersion
        |FROM f ORDER BY event_type""".stripMargin,

    "stat_ztest_prop" ->
      // same calendar split, same operand order, symmetric rounding
      """WITH e AS (SELECT event_type,
        |    (epoch_us(ts) // 86400000000 + 4) % 7 >= 5 AS wk
        |  FROM events),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN wk THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN wk AND event_type = 'error'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS x1,
        |    CAST(sum(CASE WHEN NOT wk THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN NOT wk AND event_type = 'error'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS x0
        |  FROM e),
        |f AS (SELECT n1, x1, n0, x0,
        |    CAST(x1 AS DOUBLE) / n1 AS p1,
        |    CAST(x0 AS DOUBLE) / n0 AS p0,
        |    CAST(x1 + x0 AS DOUBLE) / (n1 + n0) AS p
        |  FROM a),
        |g AS (SELECT n1, x1, n0, x0, p1, p0,
        |    (p1 - p0) / sqrt(p * (1.0 - p) * (1.0 / n1 + 1.0 / n0)) AS z
        |  FROM f)
        |SELECT n1, x1, n0, x0,
        |  CAST(CASE WHEN p1 >= 0 THEN floor(p1 * 1e6 + 0.5) / 1e6
        |       ELSE -floor(-p1 * 1e6 + 0.5) / 1e6 END AS DOUBLE)
        |    AS p_weekend,
        |  CAST(CASE WHEN p0 >= 0 THEN floor(p0 * 1e6 + 0.5) / 1e6
        |       ELSE -floor(-p0 * 1e6 + 0.5) / 1e6 END AS DOUBLE)
        |    AS p_weekday,
        |  CAST(CASE WHEN z >= 0 THEN floor(z * 1e6 + 0.5) / 1e6
        |       ELSE -floor(-z * 1e6 + 0.5) / 1e6 END AS DOUBLE) AS z_stat
        |FROM g""".stripMargin,

    "stat_kruskal" ->
      // grid-based ×2 average ranks (2·cum − tc + 1), exact-long group
      // rank sums, ORDERED double fold over the five R²/n terms,
      // decimal tie correction — operand-for-operand the Spark plan
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |g AS (SELECT c, count(*) AS tc FROM e GROUP BY 1),
        |gr AS (SELECT c, tc, sum(tc) OVER (ORDER BY c) AS cum FROM g),
        |r AS (SELECT c, 2 * cum - tc + 1 AS r2 FROM gr),
        |x AS (SELECT event_type, c, count(*) AS cgv FROM e GROUP BY 1, 2),
        |pg AS (SELECT event_type, CAST(sum(cgv) AS BIGINT) AS ng,
        |    CAST(sum(cgv * r2) AS BIGINT) AS rr2
        |  FROM x JOIN r USING (c) GROUP BY 1),
        |t AS (SELECT CAST(sum(CAST(tc AS DECIMAL(18,6)) * tc * tc - tc)
        |    AS DOUBLE) AS tsum FROM g),
        |s AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |    list_sum(list_sort(list(
        |      CAST(rr2 AS DOUBLE) * CAST(rr2 AS DOUBLE)
        |        / CAST(ng AS DOUBLE)))) AS s
        |  FROM pg),
        |f AS (SELECT n,
        |    3.0 * s / (CAST(n AS DOUBLE) * (n + 1))
        |      - 3.0 * CAST(n + 1 AS DOUBLE) AS h0,
        |    1.0 - tsum / (CAST(n AS DOUBLE) * n * n - CAST(n AS DOUBLE))
        |      AS corr
        |  FROM s CROSS JOIN t)
        |SELECT n,
        |  CAST(CASE WHEN h0 >= 0 THEN floor(h0 * 1e6 + 0.5) / 1e6
        |       ELSE -floor(-h0 * 1e6 + 0.5) / 1e6 END AS DOUBLE) AS h,
        |  CAST(CASE WHEN corr <= 0 THEN NULL
        |       WHEN h0 / corr >= 0
        |       THEN floor(h0 / corr * 1e6 + 0.5) / 1e6
        |       ELSE -floor(-(h0 / corr) * 1e6 + 0.5) / 1e6 END
        |    AS DOUBLE) AS h_tied
        |FROM f""".stripMargin,

    "stat_spearman" ->
      // ×2 average ranks, centered by n+1: every aggregate is an exact
      // integer in both engines; one fixed-order IEEE division at the end
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v
        |  FROM events),
        |r AS (SELECT user_id,
        |    2 * rank() OVER (PARTITION BY user_id ORDER BY t)
        |      + count(*) OVER (PARTITION BY user_id, t) - 1
        |      - (count(*) OVER (PARTITION BY user_id) + 1) AS cx,
        |    2 * rank() OVER (PARTITION BY user_id ORDER BY v)
        |      + count(*) OVER (PARTITION BY user_id, v) - 1
        |      - (count(*) OVER (PARTITION BY user_id) + 1) AS cy
        |  FROM e),
        |a AS (SELECT user_id, count(*) AS n,
        |    CAST(sum(cx * cy) AS BIGINT) AS sxy,
        |    CAST(sum(cx * cx) AS BIGINT) AS sxx,
        |    CAST(sum(cy * cy) AS BIGINT) AS syy
        |  FROM r GROUP BY 1),
        |f AS (SELECT user_id, n,
        |    CAST(sxy AS DOUBLE)
        |      / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))
        |      AS rho0
        |  FROM a WHERE n >= 30 AND sxx > 0 AND syy > 0)
        |SELECT user_id, n,
        |  CAST(CASE WHEN rho0 >= 0 THEN floor(rho0 * 1e6 + 0.5) / 1e6
        |       ELSE -floor(-rho0 * 1e6 + 0.5) / 1e6 END AS DOUBLE) AS rho
        |FROM f ORDER BY user_id""".stripMargin,

    "events_weekend_effect" ->
      s"""WITH e AS (SELECT event_type,
         |    (epoch_us(ts) // 86400000000 + 4) % 7 >= 5 AS wk,
         |    CAST(value AS $DecV) AS v,
         |    CAST(value AS $DecV) * CAST(value AS $DecV) AS v2
         |  FROM events),
         |per AS (SELECT event_type, wk, count(*) AS n,
         |    sum(v) AS s, sum(v2) AS q FROM e GROUP BY event_type, wk),
         |we AS (SELECT event_type, n AS n1, s AS s1, q AS q1
         |  FROM per WHERE wk),
         |wd AS (SELECT event_type, n AS n0, s AS s0, q AS q0
         |  FROM per WHERE NOT wk),
         |j AS (SELECT we.event_type, n1, n0,
         |    CAST(s1 AS DOUBLE) AS s1d, CAST(q1 AS DOUBLE) AS q1d,
         |    CAST(s0 AS DOUBLE) AS s0d, CAST(q0 AS DOUBLE) AS q0d
         |  FROM we JOIN wd USING (event_type)),
         |k AS (SELECT *, s1d / n1 AS m1, s0d / n0 AS m0,
         |    (q1d - s1d * s1d / n1) / (n1 - 1) AS var1,
         |    (q0d - s0d * s0d / n0) / (n0 - 1) AS var0
         |  FROM j)
         |SELECT event_type, n1 AS n_weekend, n0 AS n_weekday,
         |  CAST(CASE WHEN m1 >= 0 THEN floor(m1 * 1e6 + 0.5) / 1e6
         |    ELSE -floor(-m1 * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE)
         |    AS mean_weekend,
         |  CAST(CASE WHEN m0 >= 0 THEN floor(m0 * 1e6 + 0.5) / 1e6
         |    ELSE -floor(-m0 * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE)
         |    AS mean_weekday,
         |  CAST(CASE WHEN (m1 - m0) >= 0
         |    THEN floor((m1 - m0) / sqrt(var1 / n1 + var0 / n0) * 1e6 + 0.5) / 1e6
         |    ELSE -floor(-((m1 - m0) / sqrt(var1 / n1 + var0 / n0)) * 1e6 + 0.5) / 1e6
         |  END + 0.0 AS DOUBLE) AS t_stat
         |FROM k ORDER BY event_type""".stripMargin,

    "stat_ttest" ->
      s"""WITH e AS (SELECT event_type, CAST(value AS $DecV) AS v,
         |    CAST(value AS $DecV) * CAST(value AS $DecV) AS v2
         |  FROM events),
         |per AS (SELECT event_type, count(*) AS n1,
         |    sum(v) AS s1, sum(v2) AS q1 FROM e GROUP BY event_type),
         |tot AS (SELECT count(*) AS nt, sum(v) AS st, sum(v2) AS qt FROM e),
         |j AS (SELECT per.*, tot.nt, tot.st, tot.qt,
         |    nt - n1 AS n0,
         |    CAST(s1 AS DOUBLE) AS s1d, CAST(q1 AS DOUBLE) AS q1d,
         |    CAST(st - s1 AS DOUBLE) AS s0d, CAST(qt - q1 AS DOUBLE) AS q0d
         |  FROM per CROSS JOIN tot),
         |k AS (SELECT *, s1d / n1 AS m1, s0d / n0 AS m0,
         |    (q1d - s1d * s1d / n1) / (n1 - 1) AS var1,
         |    (q0d - s0d * s0d / n0) / (n0 - 1) AS var0
         |  FROM j)
         |SELECT event_type, n1, n0,
         |  CAST(CASE WHEN m1 >= 0 THEN floor(m1 * 1e6 + 0.5) / 1e6
         |    ELSE -floor(-m1 * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE) AS mean_in,
         |  CAST(CASE WHEN m0 >= 0 THEN floor(m0 * 1e6 + 0.5) / 1e6
         |    ELSE -floor(-m0 * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE) AS mean_rest,
         |  CAST(CASE WHEN (m1 - m0) >= 0
         |    THEN floor((m1 - m0) / sqrt(var1 / n1 + var0 / n0) * 1e6 + 0.5) / 1e6
         |    ELSE -floor(-((m1 - m0) / sqrt(var1 / n1 + var0 / n0)) * 1e6 + 0.5) / 1e6
         |  END + 0.0 AS DOUBLE) AS t_stat
         |FROM k ORDER BY event_type""".stripMargin,

    "stat_chisq" ->
      """WITH cells AS (SELECT event_type,
        |    CAST(floor(value / 100) AS BIGINT) AS band, count(*) AS o
        |  FROM events GROUP BY event_type, band),
        |r AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY event_type),
        |c AS (SELECT band, sum(o) AS ct FROM cells GROUP BY band),
        |n AS (SELECT sum(o) AS nt FROM cells),
        |k AS (SELECT cells.o,
        |    CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nt AS DOUBLE) AS e,
        |    nt
        |  FROM cells JOIN r USING (event_type) JOIN c USING (band)
        |    CROSS JOIN n),
        |q AS (SELECT CAST(floor((o - e) * (o - e) / e * 1e9 + 0.5) AS BIGINT)
        |    AS contrib_nano, nt FROM k)
        |SELECT
        |  CAST(floor(CAST(sum(contrib_nano) AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6
        |    AS DOUBLE) AS chisq,
        |  count(*) - 1 AS cells_minus_1,
        |  CAST(first(nt) AS BIGINT) AS n
        |FROM q""".stripMargin,

    "stat_ks" ->
      """WITH g AS (SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY value),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2 FROM g),
        |r AS (SELECT value,
        |    sum(c1) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1,
        |    sum(c2) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2
        |  FROM g),
        |d AS (SELECT abs(CAST(r1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(r2 AS DOUBLE) / CAST(n2 AS DOUBLE)) AS gap, n1, n2
        |  FROM r CROSS JOIN t)
        |SELECT CAST(floor(max(gap) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS d_stat,
        |  first(n1) AS n1, first(n2) AS n2
        |FROM d""".stripMargin,

    "stat_mannwhitney" ->
      """WITH g AS (SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY value),
        |r AS (SELECT c1, c2, c1 + c2 AS c,
        |    coalesce(sum(c1 + c2) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |  FROM g),
        |a AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2,
        |    CAST(sum(c1 * (2 * prev + c + 1)) AS BIGINT) AS rank1_2x,
        |    CAST(sum(c * c * c - c) AS BIGINT) AS ties3
        |  FROM r),
        |b AS (SELECT *, rank1_2x - n1 * (n1 + 1) AS u1_2x,
        |    n1 + n2 AS nt, n1 * n2 AS mu2x FROM a),
        |k AS (SELECT *,
        |    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
        |      * (CAST(nt + 1 AS DOUBLE)
        |         - CAST(ties3 AS DOUBLE)
        |           / (CAST(nt AS DOUBLE) * CAST(nt - 1 AS DOUBLE))) AS var_u,
        |    CAST(u1_2x - mu2x AS DOUBLE) / 2.0 AS num FROM b)
        |SELECT n1, n2, CAST(u1_2x AS DOUBLE) / 2.0 AS u_stat,
        |  CAST(CASE WHEN num >= 0
        |    THEN floor(num / sqrt(var_u) * 1e6 + 0.5) / 1e6
        |    ELSE -floor(-(num / sqrt(var_u)) * 1e6 + 0.5) / 1e6
        |  END + 0.0 AS DOUBLE) AS z_stat
        |FROM k""".stripMargin,

    "stat_anova" ->
      s"""WITH e AS (SELECT event_type, CAST(value AS $DecV) AS v,
         |    CAST(value AS $DecV) * CAST(value AS $DecV) AS v2
         |  FROM events),
         |per AS (SELECT event_type, count(*) AS ng,
         |    sum(v) AS sg, sum(v2) AS qg FROM e GROUP BY event_type),
         |nano AS (SELECT ng, sg,
         |    CAST(floor(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
         |      / CAST(ng AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS sg2n,
         |    CAST(floor(CAST(qg AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS qgn
         |  FROM per),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS s_tot,
         |    CAST(sum(sg2n) AS BIGINT) AS between_nano,
         |    CAST(sum(qgn - sg2n) AS BIGINT) AS within_nano
         |  FROM nano),
         |b AS (SELECT k, n,
         |    CAST(between_nano AS DOUBLE) / 1e9
         |      - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
         |        / CAST(n AS DOUBLE) AS ssb,
         |    CAST(within_nano AS DOUBLE) / 1e9 AS ssw
         |  FROM a),
         |f AS (SELECT *, (ssb / CAST(k - 1 AS DOUBLE))
         |    / (ssw / CAST(n - k AS DOUBLE)) AS fr FROM b)
         |SELECT k, n,
         |  CAST(CASE WHEN ssb >= 0 THEN floor(ssb * 1e6 + 0.5) / 1e6
         |    ELSE -floor(-ssb * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE) AS ssb,
         |  CAST(floor(ssw * 1e6 + 0.5) / 1e6 AS DOUBLE) AS ssw,
         |  CAST(CASE WHEN fr >= 0 THEN floor(fr * 1e6 + 0.5) / 1e6
         |    ELSE -floor(-fr * 1e6 + 0.5) / 1e6 END + 0.0 AS DOUBLE) AS f_stat
         |FROM f""".stripMargin
  )
}
