package graft

/** Physical-plan audit (SURVEY.md §4): the plan shapes that decide
  * whether a query survives a 100× scale-up. Run at sf0.001 — plan
  * shape is sf-independent for these assertions (broadcast thresholds
  * comfortably cover every dim at all sfs).
  */
class PlanSpec extends SparkSpec {

  private def p(name: String): String = plan(q(name))

  test("flagship aggregates partial+final with pushed filter") {
    val s = p("agg_pricing_summary")
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "must have map-side partial aggregation")
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate")
      || s.contains("LessThanOrEqual(l_shipdate"),
      "shipdate filter must reach the parquet scan")
  }

  test("multiway join broadcasts all dimensions, no cartesian") {
    val s = p("join_multiway")
    assert("BroadcastHashJoin".r.findAllIn(s).length >= 3)
    assert(!s.contains("CartesianProduct"))
  }

  test("top-k queries use TakeOrderedAndProject (no global sort)") {
    assert(p("sort_multikey").contains("TakeOrderedAndProject"))
    assert(p("topk_group_limit").contains("TakeOrderedAndProject"))
    assert(p("knn_ivf").contains("TakeOrderedAndProject"))
  }

  test("as-of join compiles to a single window pass, zero joins") {
    val s = p("join_asof")
    assert(s.contains("Window"))
    assert(!s.contains("Join"), "as-of must be the window rewrite, not a join")
  }

  test("LSH/band joins never degrade to nested-loop or cartesian") {
    Seq("dedup_minhash", "dedup_jaccard", "dedup_simhash", "knn_ivf",
        "dedup_ngram", "dedup_ngram_global", "knn_search_ivf",
        "dedup_embed_lsh", "dedup_edit")
      .foreach { name =>
        val s = p(name)
        assert(!s.contains("CartesianProduct"), name)
        assert(!s.contains("BroadcastNestedLoopJoin"), name)
      }
  }

  test("exact similarity brute force: lazy broadcast join, no driver collect") {
    // r2 VERDICT item 1: the n² scoring must flow through
    // BroadcastExchange (lazy, executor-side), never a driver-side
    // collect materialized back as a local relation
    Seq("knn_cosine", "dedup_embed_cosine").foreach { name =>
      val s = p(name)
      assert(s.contains("BroadcastNestedLoopJoin"), name)
      assert(s.contains("BroadcastExchange"), name)
      assert(!s.contains("LocalTableScan") && !s.contains("Scan ExistingRDD"),
        s"$name must not seed the join from driver-collected rows")
    }
    assert(p("knn_cosine").contains("TakeOrderedAndProject"),
      "global top-20 must be per-partition top-k, not a global sort")
  }

  test("dedup_simhash candidates come from the segment equi-join") {
    // r2 VERDICT item 2: join keys must include the pigeonhole segment,
    // not source alone — the keys line of the candidate join lists
    // (source, seg, segv)
    val s = p("dedup_simhash")
    val keyLines = s.split("\n").filter(_.contains("keys"))
    assert(keyLines.exists(l => l.contains("segv#") && l.contains("source#")),
      "candidate join must key on (source, segment-id, segment-value)")
  }

  test("dedup_jaccard candidates come from prefix postings, not all pairs") {
    // r2 VERDICT item 3: the candidate join is an equi-join on
    // (source, token-hash) over rarity-ranked prefix postings; the
    // ranking itself is a window (row_number over df order)
    val s = p("dedup_jaccard")
    val keyLines = s.split("\n").filter(_.contains("keys"))
    assert(keyLines.exists(l => l.contains("h#") && l.contains("source#")),
      "candidate join must key on (source, token-hash)")
    assert(s.contains("Window"), "prefix ranking must be a window pass")
  }

  test("knn_search: broadcast queries, partial top-k before the shuffle") {
    val s = p("knn_search")
    assert(s.contains("BroadcastExchange"), "queries side must broadcast")
    assert(s.contains("MapPartitions"),
      "phase-1 bounded heaps must run per partition")
    assert(s.contains("WindowGroupLimit"),
      "Spark's partial group-limit must engage before the final window")
    assert(!s.contains("LocalTableScan") && !s.contains("Scan ExistingRDD"))
  }

  test("dedup_ngram: postings equi-join, intersection from one partial agg") {
    // the inverted-index shape: candidates come from an equi-join on
    // (source, shingle-hash) — high-cardinality shuffle keys that scale
    // out — and the pair intersection count is a partial+final aggregate,
    // never a per-pair set walk over O(n²) candidates
    val s = p("dedup_ngram")
    assert(s.contains("MapPartitions"),
      "shingling must run behind the JVM-loop barrier")
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "pair intersection count must partial-aggregate map-side")
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"))
  }

  test("windows shuffle once by key, with map-side group-limit pruning") {
    val s = p("win_topk_per_group")
    assert(s.contains("Window"))
    // formatted output lists each node twice (tree + details); count tree
    // entries "Exchange (n)": one hash partition + one final range sort
    assert("Exchange \\(\\d+\\)".r.findAllIn(s).length <= 2,
      "one hash-partition exchange plus the final order-by exchange")
    assert(s.contains("WindowGroupLimit"),
      "Spark's partial top-k pruning must engage before the shuffle")
  }

  test("distinct aggregation uses the two-phase expand rewrite") {
    assert(p("agg_multi_distinct").contains("Expand"))
  }

  test("vec_centroid_assign: k-row centroid side broadcasts, no cartesian") {
    val s = p("vec_centroid_assign")
    // the vectors × k-centroids fanout is a BROADCAST cross join (the
    // k-row array table ships to every task; k× fanout scored by the
    // codegen SqDist kernel) — never a shuffled CartesianProduct, and
    // never the 64×k posexplode equi-join fanout
    assert(s.contains("BroadcastNestedLoopJoin"),
      "centroid table must broadcast through the cross join")
    assert(!s.contains("CartesianProduct"),
      "a shuffled cartesian would move the corpus k times")
  }

  test("vec_gram: label filter pushes to the scan, partial+final decimal agg") {
    val s = p("vec_gram")
    assert(s.contains("PushedFilters") && s.contains("label"),
      "the label-slice predicate must reach the parquet reader")
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "d^2 reduction must combine map-side")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      "the per-vector fan-out is an equi-join on vec_id")
  }

  test("events_heatmap: map-side combine over the 168-cell key space") {
    val s = p("events_heatmap")
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "partial aggregation must bound the exchange at cells x partitions")
  }

  test("source_orc: the filter pushes into the ORC read-back scan") {
    val s = p("source_orc")
    assert(s.contains("PushedFilters") && s.contains("o_totalprice"),
      "predicate must reach the ORC reader for stripe-level skipping")
  }

  test("DataEng key shapes: one keyed exchange, no extra shuffles") {
    // cdc_latest: rank-filter over one hash exchange on the key
    val cdc = p("cdc_latest")
    assert(cdc.contains("WindowGroupLimit"),
      "rn=1 filter should engage partial top-1 pruning before the shuffle")
    // pack_chunks: per-lang prefix-sum window, exchanges bounded by
    // (lang hash) + final orderBy range
    val pack = p("pack_chunks")
    assert("Exchange \\(\\d+\\)".r.findAllIn(pack).length <= 2,
      "packing must reuse the lang exchange: window + final sort only")
  }

  test("agg_unpivot: the melt expands AFTER the aggregate, not the scan") {
    val s = p("agg_unpivot")
    assert(s.contains("Expand"), "unpivot should plan as Expand")
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "partial+final hash agg below the melt")
    // tree prints parents first: Expand above the aggregate means the 5×
    // fanout hits |statuses| rows, not the 150k-row fact scan
    assert(s.indexOf("Expand") < s.indexOf("HashAggregate"),
      "Expand must sit above the aggregate in the tree")
  }

  test("join_interval: equi-blocked overlap join, never all-pairs") {
    val s = p("join_interval")
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "the o_custkey equi key must drive the join; overlap is residual")
  }

  test("text_vocab: per-lang top-10 prunes map-side, distinct before explode") {
    val s = p("text_vocab")
    assert(s.contains("WindowGroupLimit"),
      "rnk<=10 should engage partial window-group-limit pruning")
    assert(s.indexOf("Generate") > s.indexOf("WindowGroupLimit"),
      "explode (Generate) feeds the agg below the group-limit in the tree")
  }

  test("sql_window: both window functions share one hash exchange") {
    val s = p("sql_window")
    assert(s.contains("Window"))
    assert("hashpartitioning\\(o_custkey".r.findAllIn(s).length >= 1 &&
      "Exchange \\(\\d+\\)".r.findAllIn(s).length <= 2,
      "rank + partition sum must reuse the o_custkey exchange; only the " +
        "final orderBy may add a range exchange")
  }

  test("win_ntile: no unpartitioned window over the raw input (r4 weak #1)") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val sp = q("win_ntile").queryExecution.sparkPlan
    val globals = sp.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    globals.foreach { w =>
      assert(w.find {
        case _: BaseAggregateExec => true; case _ => false
      }.isDefined,
        "an unpartitioned window may only run over the tiny B-row bucket " +
          "aggregate (carry-in offsets), never the input table")
    }
    assert(sp.collect { case w: WindowExec if w.partitionSpec.nonEmpty => w }
      .nonEmpty, "the per-bucket local rank must be a partitioned window")
  }

  test("join_nullsafe stays a hash join — <=> is a first-class equi key") {
    val s = p("join_nullsafe")
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin"),
      "null-safe equality must plan as a hash/merge join")
    assert(!s.contains("BroadcastNestedLoopJoin")
      && !s.contains("CartesianProduct"),
      "never a nested-loop fallback")
  }

  test("knn_graph: build plan broadcasts + partial top-k; query reads the persisted artifact") {
    // the BUILD (what sharedEdges materializes once): broadcast
    // self-join + the two-phase bounded-heap reducer
    val emb = Tables.table(spark, sfDir, "embeddings")
    val idx = emb.repartition(
      spark.sparkContext.defaultParallelism, org.apache.spark.sql.functions.col("vec_id"))
    val build = plan(operators.Knn.search(emb, idx, k = 3))
    assert(build.contains("BroadcastExchange"), "index side must broadcast")
    assert(!build.contains("CartesianProduct"))
    assert(build.contains("Window"), "global rank over pruned survivors")
    // the declared QUERY reads the shared persisted edge artifact — a
    // parquet scan, no re-run of the n² scorer
    val s = p("knn_graph")
    assert(s.contains("Scan parquet") && !s.contains("BroadcastExchange"),
      "knn_graph must read the persisted kNN edge artifact")
  }

  test("vec_kmeans: both E-steps broadcast centroids, no cartesian") {
    val s = p("vec_kmeans")
    assert("BroadcastNestedLoopJoin".r.findAllIn(s).length >= 2
      || "BroadcastExchange".r.findAllIn(s).length >= 2,
      "each Lloyd iteration must broadcast its k-row centroid side")
    assert(!s.contains("CartesianProduct"))
  }

  test("agg_incremental: partials combine via hash agg, no re-scan join") {
    val s = p("agg_incremental")
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "partial + final aggregation")
    assert(!s.contains("Join"),
      "merge of partials is a union + agg, never a join back to history")
  }

  test("events_ohlc: both windows and the agg share one hash exchange") {
    // exchanges are inserted by EnsureRequirements — assert on the
    // formatted executed plan, not sparkPlan (which predates them)
    val s = p("events_ohlc")
    assert("hashpartitioning\\(".r.findAllIn(s).length == 1,
      "rn_a window, rn_d window and the (user, hr) agg must all reuse " +
        "a single (user_id, hr) exchange — each row crosses the wire once")
  }

  test("events_cum_uniques: prefix sum runs over the aggregate, not events") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val sp = q("events_cum_uniques").queryExecution.sparkPlan
    val globals = sp.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(globals.nonEmpty)
    globals.foreach { w =>
      assert(w.find {
        case _: BaseAggregateExec => true; case _ => false
      }.isDefined,
        "the unpartitioned running sum may only see the ≤|days|-row " +
          "per-day aggregate, never raw events")
    }
  }

  test("part_skyline: reduced-set broadcast back, no self-join of part") {
    val s = p("part_skyline")
    assert(s.contains("BroadcastHashJoin"),
      "suffix-min cuts join back via broadcast")
    assert(!s.contains("CartesianProduct")
      && !s.contains("BroadcastNestedLoopJoin"),
      "the O(n²) NOT EXISTS form belongs to the oracle only")
  }

  test("orders_pareto: percentile-cut binning, no window at all") {
    val s = p("orders_pareto")
    assert(!s.contains("Window"),
      "deciles come from broadcast percentile cuts + CASE binning — " +
        "never ntile/rank over all customers")
    assert(s.contains("BroadcastExchange"),
      "cuts and the total must broadcast back")
  }

  test("er_blocked: blocking keys drive a hash join, never all-pairs") {
    val s = p("er_blocked")
    assert(!s.contains("CartesianProduct")
      && !s.contains("BroadcastNestedLoopJoin"),
      "pair generation must be the (brand, size) equi-join")
  }

  test("text_cooccur: vocab broadcast + top-k, no global sort") {
    val s = p("text_cooccur")
    assert(s.contains("TakeOrderedAndProject"))
    assert(!s.contains("CartesianProduct"))
  }

  test("agg_weighted_median: all windows partitioned by the group key") {
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = q("agg_weighted_median").queryExecution.sparkPlan
    assert(sp.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty,
      "the histogram prefix sum runs per returnflag — no global window")
  }

  test("events_attribution: carry-forward touch is one keyed window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = q("events_attribution").queryExecution.sparkPlan
    assert(sp.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty, "last-touch must be per-user, never a global window")
    assert(sp.collect { case w: WindowExec => w }.nonEmpty)
  }

  test("table_diff: both snapshots reduce before the diff join") {
    val s = p("table_diff")
    assert("HashAggregate".r.findAllIn(s).length >= 4,
      "each snapshot needs partial+final aggregation before joining — " +
        "the diff join moves |keys| rows, never |rows|")
    assert(!s.contains("CartesianProduct"))
  }

  test("graph_communities: LPA rounds are equi-joins, never all-pairs") {
    val s = p("graph_communities")
    assert(!s.contains("CartesianProduct")
      && !s.contains("BroadcastNestedLoopJoin"))
  }

  test("cohort LTV and cadence: every window keyed, none global") {
    import org.apache.spark.sql.execution.window.WindowExec
    Seq("orders_cohort_ltv", "events_cadence").foreach { name =>
      val sp = q(name).queryExecution.sparkPlan
      assert(sp.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.isEmpty, s"$name: cumulative/lag windows must be partitioned")
    }
  }

  test("vec_top_eigvec: build plan broadcasts norms; query reads the shared artifact") {
    // the BUILD (what sharedEigvec materializes once)
    val s = plan(operators.LlmVectors.topEigvec(spark, sfDir))
    assert("BroadcastExchange".r.findAllIn(s).length >= 3,
      "each of the 3 normalizations must broadcast its 1-row max")
    assert(!s.contains("CartesianProduct"))
    // the declared query reads the 64-row persisted eigvec
    val r = p("vec_top_eigvec")
    assert(r.contains("Scan parquet") && !r.contains("BroadcastExchange"),
      "vec_top_eigvec must read the persisted eigenvector artifact")
  }

  test("events_markov_stationary: one keyed window, iterations broadcast") {
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = q("events_markov_stationary").queryExecution.sparkPlan
    assert(sp.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty, "lead() must stay per-user")
    val s = p("events_markov_stationary")
    assert("BroadcastExchange".r.findAllIn(s).length >= 3,
      "each normalization broadcasts its 1-row total")
  }

  test("table_checksum: xor fingerprint combines map-side") {
    val s = p("table_checksum")
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "bit_xor is associative/commutative — partial aggregation required")
    assert(!s.contains("Exchange rangepartitioning, [o_orderstatus"),
      "no sort-based path for an order-independent checksum")
  }

  test("TPC-H composites: dims broadcast, facts meet once, top-k heaped") {
    Seq("tpch_q3", "tpch_q5", "tpch_q10").foreach { name =>
      val s = p(name)
      assert(!s.contains("CartesianProduct")
        && !s.contains("BroadcastNestedLoopJoin"), name)
      assert(s.contains("BroadcastHashJoin"),
        s"$name: every dimension must arrive broadcast")
      assert("HashAggregate".r.findAllIn(s).length >= 2,
        s"$name: revenue aggregate must partial-combine map-side")
    }
    assert(p("tpch_q3").contains("TakeOrderedAndProject"))
    assert(p("tpch_q10").contains("TakeOrderedAndProject"))
    // q5's asia filter must prune at the region scan, not post-join
    assert(p("tpch_q5").contains("EqualTo(r_name,ASIA)")
      || p("tpch_q5").contains("r_name"), "region filter pushed")
  }

  test("dq_expectations: one aggregate pass per table, FK check broadcast") {
    val s = p("dq_expectations")
    assert(!s.contains("CartesianProduct"))
    assert(s.contains("BroadcastHashJoin"),
      "FK orphan check must broadcast the dimension key set")
    // three single-table rule groups + fk + temporal = bounded scans;
    // the point is no per-rule re-scan: lineitem appears at most twice
    // (rule pass + ship_after_order join), never once per rule
    assert("lineitem\\.parquet".r.findAllIn(s).length <= 2,
      "single-table rules must fold into ONE aggregate pass")
  }

  test("orders_forecast: corpus agg first, lag window over months only") {
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = q("orders_forecast").queryExecution.sparkPlan
    // the unpartitioned lag window is the documented two-phase shape:
    // it runs over the ≤|months| aggregate, with the heavy reduction
    // below it in the same plan
    val winChildren = sp.collect { case w: WindowExec => w.child }
    assert(winChildren.nonEmpty)
    assert(winChildren.forall(c =>
      c.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }.nonEmpty),
      "lag window must sit ABOVE the month aggregate, never on raw rows")
  }

  test("win_rolling_median: keyed window, bounded frame, no global sort") {
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = q("win_rolling_median").queryExecution.sparkPlan
    assert(sp.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty, "median frame must stay per-user")
  }

  test("vec_pca_project: eigvec arrives broadcast, one corpus pass") {
    val s = p("vec_pca_project")
    assert(s.contains("BroadcastHashJoin"),
      "the 64-row eigenvector must broadcast into the projection join")
    assert(!s.contains("CartesianProduct"))
  }

  test("tpch_q19: common conjuncts of the OR extract below the join") {
    val s = p("tpch_q19")
    assert(s.contains("BroadcastHashJoin"))
    assert(!s.contains("CartesianProduct"))
    // Catalyst must extract `p_brand IN (…)` (or per-brand Or chain)
    // from the OR-of-ANDs and push it into the part scan
    assert(s.contains("PushedFilters: [IsNotNull(p_partkey), Or(")
      || s.contains("In(p_brand")
      || s.contains("EqualTo(p_brand,Brand#1)"),
      "part-side conjuncts of the OR must reach the scan:\n" +
        s.linesIterator.filter(_.contains("PushedFilters"))
          .mkString("\n"))
  }

  test("tpch_q22: scalar threshold and anti-join both broadcast") {
    val s = p("tpch_q22")
    assert("BroadcastExchange".r.findAllIn(s).length >= 2,
      "the 1-row average AND the recent-purchaser key set broadcast")
    assert(s.contains("LeftAnti"))
    // the 1-row threshold joins as a broadcast nested loop (fine for a
    // single row); a CartesianProduct would mean the broadcast was lost
    assert(!s.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(s).length >= 2)
  }

  test("tpch_q18: filtering aggregate reduces lineitem before the join") {
    val s = p("tpch_q18")
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "quantity sum must partial-combine map-side")
    assert(s.contains("TakeOrderedAndProject"))
    assert(!s.contains("CartesianProduct"))
  }

  test("part_supplier_counts: exclusion list broadcast anti, distinct expands") {
    val s = p("part_supplier_counts")
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftAnti"),
      "bad-supplier exclusion must be a broadcast anti-join")
    assert(s.contains("Expand") || "HashAggregate".r.findAllIn(s).length >= 3,
      "distinct count must use the two-phase rewrite")
  }

  test("orders_open_backlog: prefix sum runs over the month grid only") {
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = q("orders_open_backlog").queryExecution.sparkPlan
    val winChildren = sp.collect { case w: WindowExec => w.child }
    assert(winChildren.nonEmpty)
    assert(winChildren.forall(c =>
      c.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.nonEmpty || c.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }.nonEmpty),
      "cumulative window must sit above the delta aggregate, not raw rows")
  }

  test("vec_outliers: dimension stats broadcast back, top-k heaped") {
    val s = p("vec_outliers")
    assert(s.contains("BroadcastHashJoin"),
      "the 64-row stats table must broadcast")
    assert(s.contains("TakeOrderedAndProject"))
    assert(!s.contains("CartesianProduct"))
  }

  test("dedup_embed_eval: band join + exact join, no driver state") {
    val s = p("dedup_embed_eval")
    assert(!s.contains("LocalTableScan") && !s.contains("Scan ExistingRDD"),
      "both pair sets must be computed in-engine")
    assert(s.contains("BroadcastNestedLoopJoin"),
      "exact side is the declared broadcast NL baseline")
  }

  test("events_resample_lerp: both frame directions share one exchange") {
    import org.apache.spark.sql.execution.window.WindowExec
    val s = p("events_resample_lerp")
    // exactly two user_id exchanges: the grid-bounds aggregate (inherent
    // — min/max must reduce before the grid generates) and the ONE
    // window exchange that all four IGNORE-NULLS frames share
    assert("hashpartitioning\\(user_id".r.findAllIn(s).length == 2,
      "grid-bounds agg + one shared window exchange, nothing more")
    val sp = q("events_resample_lerp").queryExecution.sparkPlan
    val wins = sp.collect { case w: WindowExec => w }
    assert(wins.length == 1 && wins.forall(_.partitionSpec.nonEmpty),
      "one keyed WindowExec must serve both frame directions")
    // value check: every interpolated value lies between its bracketing
    // anchors (convexity of lerp) — verified against raw events
    val rows = q("events_resample_lerp").collect()
    assert(rows.nonEmpty)
    val byUser = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val (u, d, v) = (r.getAs[Long]("user_id"), r.getAs[Long]("day"),
        r.getAs[Double]("v_interp"))
      val t = d * 86400000000L
      val ev = byUser(u).sortBy(_._2)
      // all candidate anchor values at the bracketing timestamps (robust
      // to same-instant events with different values)
      val tsBefore = ev.filter(_._2 <= t).map(_._2).max
      val tsAfter = ev.filter(_._2 >= t).map(_._2).min
      val cands = ev.filter(e => e._2 == tsBefore || e._2 == tsAfter)
        .map(_._3)
      val (lo, hi) = (cands.min, cands.max)
      assert(v >= lo - 1e-6 && v <= hi + 1e-6,
        s"user $u day $d: $v outside [$lo, $hi]")
    }
  }

  test("geo_nearest_poi: coords materialize BEFORE the broadcast NL join") {
    // the r7 fix: BroadcastNestedLoopJoin codegen defers stream-side
    // expressions into the per-build-row loop, so the sha-256 synthetic
    // coords must be computed behind a mapPartitions barrier — the scan
    // side of the join must NOT contain the sha2 projection
    val sp = q("geo_nearest_poi").queryExecution.sparkPlan
    val joins = sp.collect {
      case j: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => j
    }
    assert(joins.length == 1)
    val streamSide = joins.head.left.toString
    assert(streamSide.contains("MapPartitions"),
      "the mapPartitions barrier must feed the join's stream side")
    // the sha2 projection must sit BELOW the barrier: nothing between
    // the join and MapPartitions may recompute it in the 25x loop
    val aboveBarrier = streamSide.substring(0,
      streamSide.indexOf("MapPartitions"))
    assert(!aboveBarrier.contains("sha2"),
      "coords must come from the barrier, not be recomputed 25x in-loop")
  }

  test("dedup_lsh_tuning: banded equi-joins only; truth enters broadcast") {
    val s = p("dedup_lsh_tuning")
    assert(!s.contains("CartesianProduct"))
    // nested-loop joins: the 1-row truth-count attach, plus (at tiny
    // fixture sizes only) the planner may pick NL for the truth
    // self-join — never for the band candidate joins, which must be
    // equi (hash or sort-merge) at every size
    assert("BroadcastNestedLoopJoin".r.findAllIn(s).length <= 2)
    assert(
      "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
        .findAllIn(s).nonEmpty,
      "band candidate joins must be equi-joins")
  }

  test("bpe_train: rules enter as broadcasts; corpus pass is checkpointed") {
    val s = p("bpe_train")
    // three merge rules attach as 1-row broadcast nested-loop joins
    assert("BroadcastNestedLoopJoin".r.findAllIn(s).length >= 3)
    // the vocabulary reads from the localCheckpoint RDD, not a rescan
    assert(s.contains("ExistingRDD") || s.contains("Scan ExistingRDD"),
      "word counts must come from the checkpoint, not re-aggregate the corpus")
  }

  test("ivm_retract: both signed partial aggregates are map-side combined") {
    val s = p("ivm_retract")
    assert("HashAggregate".r.findAllIn(s).length >= 4,
      "partial+final for base AND retraction partials")
    assert(!s.contains("CartesianProduct"))
  }

  test("vec_random_projection: pure map — no exchange before the sort") {
    val s = p("vec_random_projection")
    // one exchange total: the final presentation sort's range partition
    assert("Exchange".r.findAllIn(s).length <= 2,
      "projection must not shuffle (only the output sort may)")
    assert(!s.contains("Join"))
  }
}
