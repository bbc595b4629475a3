package graft

import org.apache.spark.sql.functions._

/** Plan + behavioral invariants for the TPC-H completion group (value
  * correctness is the driver's DuckDB hash compare; these pin the plan
  * shapes that decide 100 TB viability and the semantic properties a
  * hash mismatch can't localize).
  */
class TpchSpec extends SparkSpec {

  private def p(name: String): String = plan(q(name))

  test("q6: pure scan-aggregate — no join, filters pushed, partial+final") {
    val s = p("tpch_q6")
    assert(!s.contains("Join"), "Q6 must not join anything")
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "map-side partial aggregation")
    assert(s.contains("PushedFilters") && s.contains("l_shipdate"),
      "shipdate range must reach the parquet scan")
  }

  test("q2: correlated-min decorrelation — broadcast dims, top-10 heap") {
    val s = p("tpch_q2")
    assert(s.contains("TakeOrderedAndProject"), "top-10 must be a heap")
    assert(s.contains("BroadcastHashJoin"), "part/supplier dims broadcast")
    assert(!s.contains("CartesianProduct"))
    val rows = q("tpch_q2").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val bals = rows.map(_.getAs[Double]("s_acctbal"))
    assert(bals.sameElements(bals.sortBy(-(_: Double))), "acctbal desc")
  }

  test("q4: EXISTS compiles to one LEFT SEMI join on the order key") {
    val s = p("tpch_q4")
    assert(s.contains("LeftSemi"), "EXISTS must be a semi join")
    assert("Join".r.findAllIn(s).count(_ => true) >= 1 &&
      !s.contains("LeftOuter") && !s.contains("Inner"),
      "the one join is the semi — no inner/outer materialization of matches")
    // every output priority is from the real domain; counts positive
    val rows = q("tpch_q4").collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("order_count") > 0))
  }

  test("q8: share in [0,1] per year, exactly the window's years") {
    val rows = q("tpch_q8").collect()
    assert(rows.map(_.getAs[Long]("o_year")).toSet.subsetOf(Set(1996L, 1997L)))
    assert(rows.forall { r =>
      val s = r.getAs[Double]("mkt_share"); s >= 0.0 && s <= 1.0
    })
  }

  test("q11: scalar threshold broadcasts back; above-mean set is plausible") {
    val s = p("tpch_q11")
    assert(s.contains("BroadcastExchange"), "1-row threshold broadcast")
    assert(!s.contains("CartesianProduct"))
    val rows = q("tpch_q11").collect()
    assert(rows.nonEmpty && rows.length <= 30)
    val vals = rows.map(_.getAs[Double]("value"))
    assert(vals.sameElements(vals.sortBy(-(_: Double))), "value desc")
  }

  test("q13: orders aggregate to per-customer counts BEFORE the outer join") {
    val s = p("tpch_q13")
    // the left join's right side must be an aggregate, never raw orders:
    // at 100 TB the outer join input is |customers|, not |orders|
    val joinAt = s.indexOf("Join LeftOuter")
    assert(joinAt >= 0, "agg-then-left-outer shape")
    assert("HashAggregate".r.findAllIn(s).length >= 4,
      "per-customer count + histogram, each partial+final")
    val rows = q("tpch_q13").collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    val nCust = Tables.table(spark, sfDir, "customer").count()
    assert(total == nCust, "every customer lands in exactly one bucket")
  }

  test("q15: all reported suppliers share the exact maximum revenue") {
    val rows = q("tpch_q15").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_revenue")).distinct.length == 1,
      "equality against the scalar max ⇒ one revenue value")
  }

  test("q17: correlated avg-qty decorrelates to broadcast joins only") {
    val s = p("tpch_q17")
    assert(!s.contains("SortMergeJoin"),
      "both the brand filter and the per-part aggregate are dim-sized " +
        "⇒ broadcast, never a fact-side shuffle join")
    assert(q("tpch_q17").collect().length == 1)
  }

  test("q20: nested-IN becomes co-keyed pair aggregates + LEFT SEMI") {
    val s = p("tpch_q20")
    assert(s.contains("LeftSemi"), "supplier IN (qualifying) is a semi join")
    assert(!s.contains("CartesianProduct"))
    val rows = q("tpch_q20").collect()
    assert(rows.nonEmpty)
    // EUROPE = region 3 ⇒ nations ≡ 3 (mod 5) — NATION_{3,8,13,18,23}
    assert(rows.forall(r =>
      r.getAs[String]("n_name").stripPrefix("NATION_").toInt % 5 == 3))
  }

  test("q21: sole-last-shipper counts bounded by multi-supplier F orders") {
    val rows = q("tpch_q21").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val nw = rows.map(_.getAs[Long]("numwait"))
    assert(nw.sameElements(nw.sortBy(-(_: Long))), "numwait desc")
    // independent upper bound: total waiting incidents can't exceed the
    // number of F orders
    val fOrders = Tables.table(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(nw.sum <= fOrders)
  }

  test("q9 and q12: derived-predicate composites stay single-fact-shuffle") {
    Seq("tpch_q9", "tpch_q12").foreach { name =>
      val s = p(name)
      assert(!s.contains("CartesianProduct"), name)
      // exactly one fact⋈fact shuffle join (lineitem⋈orders); dims ride
      // broadcast — at most one SortMergeJoin/ShuffledHashJoin pair
      val shuffleJoins = "SortMergeJoin".r.findAllIn(s).length +
        "ShuffledHashJoin".r.findAllIn(s).length
      assert(shuffleJoins <= 1, s"$name: one co-keyed fact join, got $shuffleJoins")
    }
  }
}
