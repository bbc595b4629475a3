package graft.operators

import graft.{Canon, QueryGroup, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group C (joins) — SURVEY.md §2.C: equi (broadcast + sort-merge), outer,
  * semi/anti, theta residual, range non-equi, cross, as-of, multiway.
  *
  * Scale notes:
  *  - dimension sides (customer, nation, region, part) are broadcast —
  *    at 100 TB the fact tables shuffle only when two large sides meet
  *    (lineitem ⋈ orders), where sort-merge on the join key is the right
  *    physical plan and AQE handles skew;
  *  - the range join keeps `p_brand` as the equi key with the size
  *    comparison as a residual, so the planner hash-partitions by brand
  *    instead of a full cartesian — O(sum per-brand²), not O(n²);
  *  - the as-of join is a window rewrite (union-free here since both
  *    channels live in `events`): one shuffle by user_id, no join at all.
  *    A RANGE frame to -1 gives exact strictly-earlier semantics matching
  *    DuckDB's `ON s.ts > p.ts` ASOF condition even under ts ties.
  */
object Joins extends QueryGroup {

  private val liKey = Scans.lineitemKey
  private val liKeySql = Scans.lineitemKeySql

  /** Bucketed (8, key) + sorted parquet layout for `$dir/$name`, laid
    * down ONCE per fixture snapshot in the fingerprint-keyed
    * [[ArtifactCache]] (r8 ADVICE item 2 — the previous pid-keyed
    * /tmp/graft_buckets dirs accumulated forever across JVM runs),
    * then registered in THIS session's catalog as an external bucketed
    * table (the bucket spec lives in the catalog — a bare parquet read
    * would lose it, so each fresh JVM re-registers, but no longer
    * re-WRITES). The physical files come from Spark's own bucketed
    * writer, so re-declaring the identical CLUSTERED/SORTED BY spec
    * over them is exact; concurrent harness JVMs race benignly on the
    * one publish (ArtifactCache's atomic-rename contract). This is the
    * 100 TB operating model stated literally: the layout job runs once
    * per snapshot, every query session only ever re-attaches metadata.
    */
  private def bucketedTable(spark: org.apache.spark.sql.SparkSession,
      dir: String, name: String, key: String): String = {
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val tbl = s"graft_${name}_b_$suffix"
    if (!spark.catalog.tableExists(tbl)) {
      val out = ArtifactCache.path(s"bucket8_${name}_$key",
        Seq(s"$dir/$name.parquet")) { staging =>
        // the bucketed writer only exists behind saveAsTable; register
        // a throwaway external table on the staging path, then drop it
        // (external ⇒ files survive) before the atomic publish
        val tmp = s"graft_stage_${name}_p${ProcessHandle.current().pid()}"
        Tables.table(spark, dir, name).write
          .bucketBy(8, key).sortBy(key)
          .option("path", staging)
          .mode("overwrite").saveAsTable(tmp)
        spark.sql(s"DROP TABLE $tmp")
      }
      val ddl = Tables.table(spark, dir, name).schema.toDDL
      spark.sql(s"CREATE TABLE $tbl ($ddl) USING PARQUET " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS " +
        s"LOCATION '$out'")
    }
    tbl
  }

  def queries = Map(
    "join_inner_hash" -> { (spark, dir) =>
      Tables.table(spark, dir, "orders")
        .join(broadcast(Tables.table(spark, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy("o_orderkey")
    },

    "join_salted" -> { (spark, dir) =>
      // the explicit-salting path for hot join keys (Skew.saltedInnerJoin):
      // big side scattered over 8 salt buckets, small side replicated 8× —
      // row-identical to the plain join (the oracle IS the plain join), so
      // the hash-compare proves the equivalence end-to-end. The merge hint
      // keeps the join a shuffle join so the widened (key, salt) shuffle
      // key — the whole point at 100 TB — is actually exercised.
      val li = Tables.table(spark, dir, "lineitem")
        .select(col("l_suppkey"), col("l_extendedprice"))
      val supp = Tables.table(spark, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      Skew.saltedInnerJoin(li.hint("merge"), supp, Seq("l_suppkey"), n = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          Canon.moneySum(col("l_extendedprice")).as("revenue"))
        .orderBy("s_nationkey")
    },

    "join_sort_merge" -> { (spark, dir) =>
      Tables.table(spark, dir, "lineitem")
        .hint("merge")
        .join(Tables.table(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select((liKey.map(col) :+ col("o_totalprice") :+ col("o_orderdate")): _*)
        .orderBy(liKey.map(col): _*)
    },

    "join_left_outer" -> { (spark, dir) =>
      val bigOrders = Tables.table(spark, dir, "orders")
        .filter(col("o_totalprice") > 400000)
      Tables.table(spark, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    "join_full_outer" -> { (spark, dir) =>
      val autoNations = Tables.table(spark, dir, "customer")
        .filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_nationkey").as("cust_nation")).distinct()
      val richSuppNations = Tables.table(spark, dir, "supplier")
        .filter(col("s_acctbal") > 8000)
        .select(col("s_nationkey").as("supp_nation")).distinct()
      autoNations
        .join(richSuppNations, col("cust_nation") === col("supp_nation"), "full_outer")
        .orderBy(col("cust_nation").asc_nulls_first, col("supp_nation").asc_nulls_first)
    },

    "join_semi" -> { (spark, dir) =>
      val urgent = Tables.table(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      Tables.table(spark, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "join_anti" -> { (spark, dir) =>
      val urgent = Tables.table(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      Tables.table(spark, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "join_theta" -> { (spark, dir) =>
      Tables.table(spark, dir, "lineitem")
        .join(Tables.table(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > col("o_orderdate"))
        .select((liKey.map(col) :+ col("l_shipdate") :+ col("o_orderdate")): _*)
        .orderBy(liKey.map(col): _*)
    },

    "join_interval" -> { (spark, dir) =>
      // Interval-OVERLAP join (temporal allen-relation class): each order
      // carries a half-open activity interval [s, e) in integer epoch-days
      // (length derived from the key so both engines compute it exactly);
      // pairs of the same customer's orders whose intervals intersect.
      // The equi key (o_custkey) blocks candidates — the overlap predicate
      // only ever evaluates within a customer's ~10 orders, so the join is
      // a standard shuffle equi-join with a residual range condition, not
      // an all-pairs scan. For UNBLOCKED interval sets the same query
      // bands by fixed-width time bucket first (sequence() + explode as in
      // events_gap_fill, equi-join on bucket, dedup pairs) — overlap then
      // costs Σ per-bucket concurrency², never n². Integer day arithmetic
      // end-to-end: no float, no interval dtype skew.
      val epoch = lit("1970-01-01").cast("date")
      val iv = Tables.table(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"), epoch).cast("long").as("s"))
        .withColumn("e", col("s") + (col("o_orderkey") % 60) + lit(1))
      iv.as("a").join(iv.as("b"),
          col("a.o_custkey") === col("b.o_custkey")
            && col("a.o_orderkey") < col("b.o_orderkey")
            && col("a.s") < col("b.e") && col("b.s") < col("a.e"))
        .select(col("a.o_custkey").as("custkey"),
          col("a.o_orderkey").as("k1"), col("b.o_orderkey").as("k2"),
          (least(col("a.e"), col("b.e"))
            - greatest(col("a.s"), col("b.s"))).as("overlap_days"))
        .orderBy("custkey", "k1", "k2")
    },

    "join_range_nonequi" -> { (spark, dir) =>
      // Total order WITHOUT shuffling the 7.8M-row join output: a plain
      // orderBy on the result samples the child for range bounds (which
      // re-executes the join) and then moves every output row through a
      // range exchange — measured 8.7 s vs ~3 s for this form. Instead,
      // range-partition the 20k-row LEFT input on the leading sort keys
      // (brand, k1); the broadcast hash join preserves stream-side order
      // and emits complete (brand, k1) runs, so a within-partition sort
      // on the full key yields the same global order with no output
      // exchange. The same shape is the 100 TB plan: sort the dimension
      // stream, fan out, never reshuffle the blown-up pair stream.
      // r14: 64k-floor child session — the 20k-row range exchange is
      // byte-small but fans out 390× through the broadcast join and the
      // within-partition sort; the 1m default coalesces it to one task
      // (measured +0.46-1.01 s in all three 32c A/B pairs —
      // [[QueryGroup.cpuDenseSession]])
      val s2 = QueryGroup.cpuDenseSession(spark)
      val part = Tables.table(s2, dir, "part")
      part.as("a")
        .repartitionByRange(col("a.p_brand"), col("a.p_partkey"))
        .join(broadcast(part.as("b")),
          col("a.p_brand") === col("b.p_brand")
            && col("a.p_size") < col("b.p_size"))
        .select(col("a.p_brand").as("brand"),
          col("a.p_partkey").as("k1"), col("b.p_partkey").as("k2"),
          col("a.p_size").as("s1"), col("b.p_size").as("s2"))
        .sortWithinPartitions("brand", "k1", "k2")
    },

    "join_cross" -> { (spark, dir) =>
      Tables.table(spark, dir, "region")
        .crossJoin(Tables.table(spark, dir, "nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },

    "join_asof" -> { (spark, dir) =>
      // Most recent strictly-earlier purchase per signup, same user.
      // RANGE frame to -1 on epoch-µs = "ts_us < current ts_us" exactly.
      val e = Tables.events(spark, dir)
        .filter(col("event_type").isin("purchase", "signup"))
        .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)
      e.withColumn("prev_purchase_ts",
          last(when(col("event_type") === "purchase", col("ts_us")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "signup")
        .select("user_id", "event_id", "ts_us", "prev_purchase_ts")
        .orderBy("user_id", "ts_us", "event_id")
    },

    "join_asof_nearest" -> { (spark, dir) =>
      // NEAREST-in-time as-of: each purchase pairs with the closest
      // 'error' event of the same vehicle in EITHER direction (the
      // diagnostics question "what fault is nearest this sale?") —
      // completing the as-of family (backward join_asof, strict
      // join_asof_native, bounded join_asof_tolerance). Because label
      // and candidate events share the entity stream, the join
      // collapses into two IGNORE-NULLS frames over ONE user exchange
      // (prev error via preceding frame, next error via following
      // frame) + a scalar nearer-of-two pick, ties to the EARLIER
      // side — no join operator at all, which is the cheapest correct
      // plan at any scale (the two-table form would go through
      // [[graft.plans.AsOfJoin]] twice).
      val W = org.apache.spark.sql.expressions.Window
      val base = W.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wPrev = base.rowsBetween(W.unboundedPreceding, -1)
      val wNext = base.rowsBetween(1, W.unboundedFollowing)
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("err_ts",
          when(col("event_type") === "error", col("ts_us")))
        .withColumn("prev_err",
          last("err_ts", ignoreNulls = true).over(wPrev))
        .withColumn("next_err",
          first("err_ts", ignoreNulls = true).over(wNext))
        .filter(col("event_type") === "purchase")
        .withColumn("nearest_err_us",
          when(col("prev_err").isNull, col("next_err"))
            .when(col("next_err").isNull, col("prev_err"))
            .when(col("ts_us") - col("prev_err")
              <= col("next_err") - col("ts_us"), col("prev_err"))
            .otherwise(col("next_err")))
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("nearest_err_us"),
          (col("nearest_err_us") - col("ts_us")).as("delta_us"))
        .orderBy("user_id", "ts_us", "event_id")
    },

    "join_asof_tolerance" -> { (spark, dir) =>
      // As-of with BOUNDED STALENESS (pandas merge_asof's `tolerance`):
      // the matched purchase must be within 24 h of the signup, else the
      // match is discarded — stale state is worse than no state in
      // enrichment pipelines. Same single window pass as join_asof
      // (one user_id exchange, zero joins); the tolerance is a post-hoc
      // null-out of the matched timestamp, so the plan cost is identical
      // and at scale the bound also CAPS the state any implementation
      // must retain (the streaming analog keeps 24 h, not forever).
      val TolUs = 86400000000L
      val e = Tables.events(spark, dir)
        .filter(col("event_type").isin("purchase", "signup"))
        .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)
      e.withColumn("prev_ts",
          last(when(col("event_type") === "purchase", col("ts_us")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "signup")
        .withColumn("prev_purchase_ts",
          when(col("ts_us") - col("prev_ts") <= TolUs, col("prev_ts")))
        .select("user_id", "event_id", "ts_us", "prev_purchase_ts")
        .orderBy("user_id", "ts_us", "event_id")
    },

    "join_bucketed" -> { (spark, dir) =>
      // Co-located fact-fact join: both sides bucketed (8 buckets) and
      // sorted on the join key at write time, so the sort-merge join
      // needs NO exchange and NO sort at read time (asserted in
      // JoinSpec). This is the 100 TB recurring-join pattern: pay the
      // shuffle once when laying data down, never again per query.
      val li = spark.table(bucketedTable(spark, dir, "lineitem", "l_orderkey"))
      val ord = spark.table(bucketedTable(spark, dir, "orders", "o_orderkey"))
      li.hint("merge")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          Canon.moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },

    "agg_bucketed" -> { (spark, dir) =>
      // Exchange-free AGGREGATION on the bucketed layout — the other
      // half of join_bucketed's amortized-shuffle story: a groupBy on
      // the bucket key is satisfied by the scan's hash-clustered output,
      // so the aggregate runs in ONE stage with no exchange before it
      // (JoinSpec asserts it; the only shuffle in the plan is the final
      // presentation sort). At 100 TB this is why fact tables get
      // bucketed by their natural aggregation key: every recurring
      // per-key rollup — not just joins — skips the shuffle forever.
      // Same table name as join_bucketed → the layout is laid once per
      // fixture snapshot and shared between both queries.
      spark.table(bucketedTable(spark, dir, "lineitem", "l_orderkey"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          // quantities are integral in the fixture — the long cast keeps
          // the sum order-free exact (raw double sum would be weather)
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          Canon.moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_orderkey")
    },

    "join_asof_native" -> { (spark, dir) =>
      // Same semantics as join_asof, through the custom Catalyst operator
      // (graft.plans.AsOfJoinNode/Strategy/Exec): co-partitioned sorted
      // merge, O(1) state per task — the 100 TB as-of plan. Same oracle.
      val e = Tables.events(spark, dir)
        .filter(col("event_type").isin("purchase", "signup"))
      val signups = e.filter(col("event_type") === "signup")
        .select("user_id", "event_id", "ts_us")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts_us").as("p_ts"))
      graft.plans.AsOfJoin.asofLeft(signups, purchases,
          keys = Seq("user_id" -> "p_user"),
          leftTimeCol = "ts_us", rightTimeCol = "p_ts", strict = true)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("p_ts").as("prev_purchase_ts"))
        .orderBy("user_id", "ts_us", "event_id")
    },

    "join_multiway" -> { (spark, dir) =>
      // TPC-H Q5 shape: local-supplier revenue per nation within ASIA.
      val customer = Tables.table(spark, dir, "customer")
      val orders = Tables.table(spark, dir, "orders")
      val lineitem = Tables.table(spark, dir, "lineitem")
      val supplier = Tables.table(spark, dir, "supplier")
      val nation = Tables.table(spark, dir, "nation")
      val region = Tables.table(spark, dir, "region")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region),
          col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(Canon.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    "join_nullsafe" -> { (spark, dir) =>
      // Null-safe equi join (`<=>` / IS NOT DISTINCT FROM): the "unknown
      // matches unknown" semantics every entity-resolution join needs —
      // here nation 10 is masked to NULL on both sides (a stand-in for
      // unparsed/unknown region codes), and the null-safe key makes the
      // two unknown buckets join each other instead of silently dropping.
      // Catalyst keeps EqualNullSafe a first-class equi-join key, so this
      // stays a broadcast/shuffle HASH join — no fallback to a cartesian
      // with a residual. 100 TB caveat at the declaration site: NULLs
      // collapse to ONE hash bucket, so a high null fraction is a skew
      // hotspot — the mitigations are the usual ones (salt the null key,
      // or split off `IS NULL` rows into a separate cheap cross-count);
      // at this fixture's null rate the plain plan is right.
      val c = Tables.table(spark, dir, "customer")
        .select(expr("nullif(c_nationkey, 10)").cast("long").as("k"),
          col("c_custkey"))
      val s = Tables.table(spark, dir, "supplier")
        .select(expr("nullif(s_nationkey, 10)").cast("long").as("sk"),
          col("s_acctbal"))
      c.join(broadcast(s), col("k") <=> col("sk"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_pairs"),
          Canon.moneySum(col("s_acctbal")).as("bal_sum"))
        .orderBy(col("k").asc_nulls_first)
    },

    "join_bloom" -> { (spark, dir) =>
      // Bloom-filter semi-join reduction: the runtime-filter pattern for
      // the case where the build side's ROWS are too big to broadcast but
      // its KEY SET fits a bloom sketch (10^8 keys @ 3% fpp ≈ 90 MB).
      // Build: distributed treeAggregate of the urgent-order keys into
      // one BloomFilter (df.stat.bloomFilter), broadcast once; probe:
      // lineitem rows are pre-filtered map-side BEFORE the join shuffle,
      // so ~4/5 of the probe never pays exchange I/O. False positives
      // (~1%) pass the pre-filter and are dropped by the exact join that
      // follows — the result is bit-identical to the plain join, which is
      // exactly what the oracle checks. This is the hand-rolled form of
      // Spark's own InjectRuntimeFilter
      // (spark.sql.optimizer.runtime.bloomFilter.enabled), written out so
      // the mechanism is visible and spec-testable; the UDF is the one
      // documented non-codegen step, applied post-scan at map side where
      // it trades a hash per row for a shuffle write per row.
      val urgent = Tables.table(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
      val bf = urgent.stat.bloomFilter("o_orderkey", 100000L, 0.01)
      val bfB = spark.sparkContext.broadcast(bf)
      val mightContain = udf((k: Long) => bfB.value.mightContain(k))
      Tables.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
        .filter(mightContain(col("l_orderkey")))
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          Canon.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy("l_returnflag")
    }
  )

  def oracle = Map(
    "agg_bucketed" ->
      """SELECT l_orderkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 4)
        |    AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "join_bloom" ->
      // the bloom pre-filter is a pure reduction (no false negatives), so
      // the oracle is the PLAIN exact join — any sketch bug that drops or
      // duplicates a row hash-fails here
      """SELECT l_returnflag, count(*) AS n_items,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "join_asof_nearest" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    event_type,
        |    CASE WHEN event_type = 'error' THEN epoch_us(ts) END AS err_ts
        |  FROM events),
        |f AS (SELECT *,
        |    last_value(err_ts IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_err,
        |    first_value(err_ts IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS next_err
        |  FROM e),
        |p AS (SELECT *, CASE
        |    WHEN prev_err IS NULL THEN next_err
        |    WHEN next_err IS NULL THEN prev_err
        |    WHEN ts_us - prev_err <= next_err - ts_us THEN prev_err
        |    ELSE next_err END AS nearest_err_us
        |  FROM f WHERE event_type = 'purchase')
        |SELECT user_id, ts_us, event_id, nearest_err_us,
        |  nearest_err_us - ts_us AS delta_us
        |FROM p ORDER BY user_id, ts_us, event_id""".stripMargin,

    "join_nullsafe" ->
      """WITH c AS (SELECT CAST(nullif(c_nationkey, 10) AS BIGINT) AS k,
        |            c_custkey FROM customer),
        |     s AS (SELECT CAST(nullif(s_nationkey, 10) AS BIGINT) AS sk,
        |            s_acctbal FROM supplier)
        |SELECT k, count(*) AS n_pairs,
        |  CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,6))), 4) AS DOUBLE)
        |    AS bal_sum
        |FROM c JOIN s ON k IS NOT DISTINCT FROM sk
        |GROUP BY k ORDER BY k NULLS FIRST""".stripMargin,

    "join_salted" ->
      """SELECT s_nationkey, count(*) AS n_items,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "join_inner_hash" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "join_sort_merge" ->
      s"""SELECT $liKeySql, o_totalprice, o_orderdate
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |ORDER BY $liKeySql""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,

    "join_full_outer" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS cust_nation
        |            FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
        |     sn AS (SELECT DISTINCT s_nationkey AS supp_nation
        |            FROM supplier WHERE s_acctbal > 8000)
        |SELECT cust_nation, supp_nation
        |FROM cn FULL OUTER JOIN sn ON cust_nation = supp_nation
        |ORDER BY cust_nation NULLS FIRST, supp_nation NULLS FIRST""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "join_theta" ->
      s"""SELECT $liKeySql, l_shipdate, o_orderdate
         |FROM lineitem JOIN orders
         |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
         |ORDER BY $liKeySql""".stripMargin,

    "join_interval" ->
      // DATE − DATE is BIGINT days in DuckDB; Spark's datediff INT is
      // cast long to match.
      """WITH i AS (SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      + (o_orderkey % 60) + 1 AS e
        |  FROM orders)
        |SELECT a.o_custkey AS custkey, a.o_orderkey AS k1, b.o_orderkey AS k2,
        |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_days
        |FROM i a JOIN i b ON a.o_custkey = b.o_custkey
        |  AND a.o_orderkey < b.o_orderkey
        |  AND a.s < b.e AND b.s < a.e
        |ORDER BY custkey, k1, k2""".stripMargin,

    "join_range_nonequi" ->
      """SELECT a.p_brand AS brand, a.p_partkey AS k1, b.p_partkey AS k2,
        |       a.p_size AS s1, b.p_size AS s2
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size < b.p_size
        |ORDER BY brand, k1, k2""".stripMargin,

    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "join_asof_tolerance" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events WHERE event_type IN ('purchase','signup')),
        |     s AS (SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'signup'),
        |     p AS (SELECT user_id, ts_us FROM e WHERE event_type = 'purchase')
        |SELECT s.user_id, s.event_id, s.ts_us,
        |  CASE WHEN s.ts_us - p.ts_us <= 86400000000 THEN p.ts_us END
        |    AS prev_purchase_ts
        |FROM s ASOF LEFT JOIN p
        |  ON s.user_id = p.user_id AND s.ts_us > p.ts_us
        |ORDER BY s.user_id, s.ts_us, s.event_id""".stripMargin,

    "join_asof" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events WHERE event_type IN ('purchase','signup')),
        |     s AS (SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'signup'),
        |     p AS (SELECT user_id, ts_us FROM e WHERE event_type = 'purchase')
        |SELECT s.user_id, s.event_id, s.ts_us, p.ts_us AS prev_purchase_ts
        |FROM s ASOF LEFT JOIN p
        |  ON s.user_id = p.user_id AND s.ts_us > p.ts_us
        |ORDER BY s.user_id, s.ts_us, s.event_id""".stripMargin,

    "join_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "join_asof_native" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events WHERE event_type IN ('purchase','signup')),
        |     s AS (SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'signup'),
        |     p AS (SELECT user_id, ts_us FROM e WHERE event_type = 'purchase')
        |SELECT s.user_id, s.event_id, s.ts_us, p.ts_us AS prev_purchase_ts
        |FROM s ASOF LEFT JOIN p
        |  ON s.user_id = p.user_id AND s.ts_us > p.ts_us
        |ORDER BY s.user_id, s.ts_us, s.event_id""".stripMargin,

    "join_multiway" ->
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin
  )
}
