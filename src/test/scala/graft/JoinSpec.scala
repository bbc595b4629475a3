package graft

import org.apache.spark.sql.functions._

/** Group C specs — semantics invariants + the physical plans that matter
  * at scale (SURVEY.md §2.C, §4).
  */
class JoinSpec extends SparkSpec {

  test("join_inner_hash broadcasts the customer side") {
    val p = plan(q("join_inner_hash"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("join_sort_merge picks SMJ for fact-fact join") {
    assert(plan(q("join_sort_merge")).contains("SortMergeJoin"))
  }

  test("join_range_nonequi keeps brand as equi key (no cartesian)") {
    val p = plan(q("join_range_nonequi"))
    assert(!p.contains("CartesianProduct"),
      "same-brand range join must hash on p_brand, not go O(n^2)")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("join_bucketed: co-located SMJ, no exchange between scan and join") {
    val df = q("join_bucketed")
    val p = plan(df)
    assert(p.contains("SortMergeJoin"), "bucketed fact-fact join must SMJ")
    // in the plan tree, everything below the SMJ line is its subtree
    // (scans + optional in-partition sorts) — it must be exchange-free;
    // the aggregation shuffle above the join is legitimate
    val tree = p.split("\n\n")(0).split("\n")
    val smjIdx = tree.indexWhere(_.contains("SortMergeJoin"))
    assert(smjIdx >= 0, "SMJ missing from plan tree:\n" + p)
    assert(!tree.drop(smjIdx).exists(_.contains("Exchange")),
      "bucketed layout must eliminate the join-side shuffles:\n" + p)
    assert(p.contains("Bucketed: true"),
      "scan must recognize the bucket layout")
  }

  test("agg_bucketed: single-stage aggregate, no exchange below the agg") {
    val p = plan(q("agg_bucketed"))
    val tree = p.split("\n\n")(0).split("\n")
    val aggIdx = tree.indexWhere(_.contains("HashAggregate"))
    assert(aggIdx >= 0, "HashAggregate missing:\n" + p)
    // everything below the (lowest) aggregate is its subtree — the scan
    // must feed it directly, with no shuffle; the only exchange allowed
    // in the whole plan is the presentation sort above
    val lastAgg = tree.lastIndexWhere(_.contains("HashAggregate"))
    assert(!tree.drop(lastAgg).exists(_.contains("Exchange")),
      "bucketed layout must satisfy the groupBy distribution:\n" + p)
    assert(p.contains("Bucketed: true"), "scan must use the bucket layout")
  }

  test("semi + anti partition the customer set") {
    val semi = q("join_semi").count()
    val anti = q("join_anti").count()
    val all = Tables.table(spark, sfDir, "customer").count()
    assert(semi + anti == all)
  }

  test("join_asof: every prev_purchase_ts is strictly earlier") {
    import org.apache.spark.sql.functions.col
    val df = q("join_asof")
    assert(df.filter(col("prev_purchase_ts") >= col("ts_us")).count() == 0)
    assert(df.count() ==
      Tables.events(spark, sfDir).filter(col("event_type") === "signup").count(),
      "as-of join must preserve every signup row (left semantics)")
  }

  test("join_cross is exactly |region| x |nation|") {
    assert(q("join_cross").count() == 5L * 25L)
  }

  test("join_multiway returns per-nation revenue for ASIA only") {
    val rows = q("join_multiway").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    // revenues are sorted descending
    val revs = rows.map(_.getDouble(1))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("set ops: union count adds, intersect bounded by dims") {
    val c = Tables.table(spark, sfDir, "customer").count()
    val s = Tables.table(spark, sfDir, "supplier").count()
    assert(q("set_union_all").count() == c + s)
    assert(q("set_intersect").count() <= 25)
  }

  test("sort_multikey: top-100 ordered by price desc") {
    val rows = q("sort_multikey").collect()
    assert(rows.length == 100)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-(_: Double))))
  }

  test("join_asof_tolerance == join_asof with stale matches nulled") {
    val TolUs = 86400000000L
    def rows(name: String) = q(name).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }
    val base = rows("join_asof")
    val bounded = rows("join_asof_tolerance")
    assert(base.length == bounded.length, "same signup rows either way")
    base.zip(bounded).foreach { case ((u, e, ts, prev), (u2, e2, ts2, p2)) =>
      assert((u, e, ts) == (u2, e2, ts2))
      val expect = prev.filter(p => ts - p <= TolUs)
      assert(p2 == expect, s"signup $e: base=$prev bounded=$p2")
    }
    // the bound must actually discard something on the fixtures
    assert(bounded.count(_._4.isEmpty) > base.count(_._4.isEmpty))
  }

  test("join_nullsafe: NULL bucket matches NULL, non-null rows equal the plain join") {
    // sf0.01: sf0.001 has zero nation-10 suppliers, so only the larger
    // fixture exercises the NULL×NULL match this query exists for
    val dir = sfDir01
    val rows = q("join_nullsafe", dir).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1)))
    val nCust10 = Tables.table(spark, dir, "customer")
      .filter(col("c_nationkey") === 10).count()
    val nSupp10 = Tables.table(spark, dir, "supplier")
      .filter(col("s_nationkey") === 10).count()
    // under <=> the two masked sides cross-match: |C10| × |S10| pairs
    assert(rows.find(_._1.isEmpty).map(_._2).contains(nCust10 * nSupp10),
      "null-bucket pair count")
    assert(nCust10 * nSupp10 > 0, "fixture exercises the NULL bucket")
    // non-null groups agree with a plain (null-dropping) equi join
    val plain = Tables.table(spark, dir, "customer")
      .filter(col("c_nationkey") =!= 10)
      .join(Tables.table(spark, dir, "supplier")
        .filter(col("s_nationkey") =!= 10),
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("c_nationkey").cast("long").as("k"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (Some(r.getLong(0)), r.getLong(1))).toSet
    assert(rows.filter(_._1.isDefined).toSet == plain)
  }

  test("join_bloom: result identical to plain exact join; filter reduces the probe") {
    val dir = sfDir01
    val bloomed = q("join_bloom", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = Tables.table(spark, dir, "lineitem")
      .join(Tables.table(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        Canon.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bloomed == plain, "bloom pre-filter must not change the result")
    // the pre-filter must actually reduce: urgent is ~1/5 of orders, so
    // survivors ≈ 20% + fpp; assert well under half the probe passes
    val li = Tables.table(spark, dir, "lineitem")
    val urgent = Tables.table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val bf = urgent.stat.bloomFilter("o_orderkey", 100000L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mc = udf((k: Long) => bfB.value.mightContain(k))
    val passed = li.filter(mc(col("l_orderkey"))).count()
    assert(passed.toDouble / li.count() < 0.5,
      s"bloom should prune most of the probe side (passed $passed)")
  }
}
