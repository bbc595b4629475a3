package graft.operators

import graft.{Canon, QueryGroup, Tables}
import org.apache.spark.sql.functions._

/** Groups F (sorts/limits/top-k) + G (set ops) — SURVEY.md §2.F/G.
  *
  * Scale notes: `orderBy(...).limit(k)` compiles to
  * TakeOrderedAndProjectExec — per-partition top-k then a single merge of
  * k-sized heaps on the driver; no global sort of 100 TB ever happens.
  * The Q3-shape query aggregates *before* the top-k, so the heavy part is
  * a partial-agg shuffle of group rows, not raw lineitems.
  */
object SortsSets extends QueryGroup {

  def queries = Map(
    "sort_multikey" -> { (spark, dir) =>
      Tables.table(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    "sort_paginate" -> { (spark, dir) =>
      // OFFSET pagination — the serving "page 2" read: rows 21-40 of
      // customers by (acctbal desc, custkey). Spark plans
      // offset+limit into one GlobalLimit over a TakeOrdered-style
      // bounded sort: each partition keeps only its top offset+limit
      // candidates, the driver merges 40 rows per partition — never a
      // full global sort. (Deep pagination at 100 TB switches to
      // keyset predicates — WHERE (acctbal, key) < last-seen — which
      // pushes into the scan; OFFSET is the shallow-page shape.)
      // The unique custkey tiebreak makes the page deterministic.
      Tables.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .offset(20).limit(20)
    },

    "topk_group_limit" -> { (spark, dir) =>
      // TPC-H Q3 shape: top-10 open-revenue orders in BUILDING segment.
      Tables.table(spark, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp_ntz"))
        .join(Tables.table(spark, dir, "orders")
            .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.table(spark, dir, "customer")
            .filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(Canon.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    "set_union_all" -> { (spark, dir) =>
      val c = Tables.table(spark, dir, "customer")
        .select(lit("cust").as("kind"), col("c_custkey").as("key_id"),
          col("c_acctbal").as("acctbal"))
      val s = Tables.table(spark, dir, "supplier")
        .select(lit("supp").as("kind"), col("s_suppkey").as("key_id"),
          col("s_acctbal").as("acctbal"))
      c.unionByName(s).orderBy("kind", "key_id")
    },

    "set_intersect" -> { (spark, dir) =>
      Tables.table(spark, dir, "customer")
        .select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.table(spark, dir, "supplier")
          .select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    "set_except" -> { (spark, dir) =>
      // top-100 by balance EXCEPT top-100 by order spend. Both top-100s
      // carry unique tiebreakers; spend ranks via exact decimal sum so
      // partial-agg fold order can't flip ties (SURVEY.md §5.3).
      val byBal = Tables.table(spark, dir, "customer")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(100).select("c_custkey")
      val bySpend = Tables.table(spark, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(Canon.Dec)).as("spend"))
        .orderBy(col("spend").desc, col("o_custkey"))
        .limit(100).select(col("o_custkey").as("c_custkey"))
      byBal.except(bySpend).orderBy("c_custkey")
    },

    "set_union_distinct" -> { (spark, dir) =>
      // UNION (distinct) — vs set_union_all's bag union: one hash-agg
      // dedup after the concat, keyed on the full row. At scale the
      // dedup is partial+final (map-side combine shrinks the shuffle).
      Tables.table(spark, dir, "customer")
        .select(col("c_nationkey").as("nationkey"))
        .union(Tables.table(spark, dir, "supplier")
          .select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")
    },

    "set_intersect_all" -> { (spark, dir) =>
      // INTERSECT ALL — MULTISET intersection (min of the two
      // multiplicities per row), the bag semantics set_intersect's
      // distinct form erases. Spark plans intersectAll as a
      // count-compare aggregate, partial+final — no row explosion
      // beyond min(counts). Inputs are two dup-heavy projections of
      // lineitem (overlapping ship-date halves), so multiplicities
      // genuinely exceed 1 and differ between sides.
      val li = Tables.table(spark, dir, "lineitem")
      def half(lo: String, hi: String) = li
        .filter(col("l_shipdate") >= lit(lo).cast("timestamp_ntz")
          && col("l_shipdate") < lit(hi).cast("timestamp_ntz"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("int").as("qty"))
      half("1995-01-01", "1998-01-01")
        .intersectAll(half("1997-01-01", "2002-01-01"))
        .orderBy("l_returnflag", "l_linestatus", "qty")
    },

    "set_except_all" -> { (spark, dir) =>
      // EXCEPT ALL — multiset difference (multiplicities subtract,
      // floored at zero). Same dup-heavy halves; the result keeps
      // max(count_a − count_b, 0) copies per row, which the distinct
      // EXCEPT collapses to 0/1.
      // operand order matters for non-degeneracy: the LATE half minus
      // the EARLY half keeps the 1998-2002 surplus at every SF (the
      // other direction is empty at sf0.01+ — the late half dominates
      // every multiplicity)
      val li = Tables.table(spark, dir, "lineitem")
      def half(lo: String, hi: String) = li
        .filter(col("l_shipdate") >= lit(lo).cast("timestamp_ntz")
          && col("l_shipdate") < lit(hi).cast("timestamp_ntz"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("int").as("qty"))
      half("1997-01-01", "2002-01-01")
        .exceptAll(half("1995-01-01", "1998-01-01"))
        .orderBy("l_returnflag", "l_linestatus", "qty")
    }
  )

  def oracle = Map(
    "sort_paginate" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 20 OFFSET 20""".stripMargin,

    "sort_multikey" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "topk_group_limit" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "set_union_all" ->
      """SELECT 'cust' AS kind, c_custkey AS key_id, c_acctbal AS acctbal FROM customer
        |UNION ALL
        |SELECT 'supp' AS kind, s_suppkey AS key_id, s_acctbal AS acctbal FROM supplier
        |ORDER BY kind, key_id""".stripMargin,

    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_except" ->
      """WITH by_bal AS (SELECT c_custkey FROM customer
        |                ORDER BY c_acctbal DESC, c_custkey LIMIT 100),
        |     by_spend AS (SELECT o_custkey AS c_custkey FROM orders
        |                  GROUP BY o_custkey
        |                  ORDER BY sum(CAST(o_totalprice AS DECIMAL(18,6))) DESC, o_custkey
        |                  LIMIT 100)
        |SELECT c_custkey FROM by_bal
        |EXCEPT
        |SELECT c_custkey FROM by_spend
        |ORDER BY c_custkey""".stripMargin,

    "set_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_intersect_all" ->
      """SELECT l_returnflag, l_linestatus, CAST(l_quantity AS INT) AS qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |INTERSECT ALL
        |SELECT l_returnflag, l_linestatus, CAST(l_quantity AS INT) AS qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '2002-01-01'
        |ORDER BY l_returnflag, l_linestatus, qty""".stripMargin,

    "set_except_all" ->
      """SELECT l_returnflag, l_linestatus, CAST(l_quantity AS INT) AS qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '2002-01-01'
        |EXCEPT ALL
        |SELECT l_returnflag, l_linestatus, CAST(l_quantity AS INT) AS qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |ORDER BY l_returnflag, l_linestatus, qty""".stripMargin
  )
}
