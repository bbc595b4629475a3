package graft.operators

import graft.{Canon, QueryGroup, Tables}
import org.apache.spark.sql.functions._

/** TPC-H completion group — the 12 decision-support shapes not already
  * covered by earlier waves, adapted to the fixture schema (FIXTURES.md:
  * no partsupp table, no l_commitdate/l_receiptdate/l_shipmode, so Q2/
  * Q4/Q9/Q11/Q12/Q20 substitute lineitem-derived supply facts and
  * ship-latency predicates while keeping each query's CLASSIC PLAN SHAPE
  * intact — the correlated-min subquery, the EXISTS semi-join, the
  * nested-aggregate NOT-EXISTS, the scalar-subquery threshold). With Q1
  * ≡ `agg_pricing_summary`, Q16 ≡ `part_supplier_counts`, and
  * Q3/Q5/Q7/Q10/Q14/Q18/Q19/Q22 in Reporting, this closes all 22.
  *
  * Scale discipline is the Reporting contract: fact⋈fact meets in ONE
  * co-keyed shuffle, every dimension arrives broadcast, filters sit on
  * base scans (PushedFilters), aggregates reduce before any ordering,
  * and every top-k is TakeOrderedAndProject. Decorrelation is done BY
  * HAND the way Catalyst would: each correlated subquery becomes an
  * aggregate joined back on its correlation key, so the oracle's
  * EXISTS/IN/scalar-subquery text and the DataFrame plan are the same
  * relational algebra.
  */
object Tpch extends QueryGroup {

  private def ntz(d: String) = lit(d).cast("timestamp_ntz")

  /** revenue = Σ extprice·(1-disc), exact decimal (Canon money policy) */
  private def revenue = Canon.moneySum(
    col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  def queries = Map(
    "tpch_q2" -> { (spark, dir) =>
      // Minimum-cost supplier (TPC-H Q2 shape). No partsupp fixture, so
      // the supply relation is DERIVED: per (part, supplier) the minimum
      // observed unit price l_extendedprice/l_quantity over lineitem.
      // The correlated subquery ("cost = min cost among EUROPE suppliers
      // of that part") decorrelates into a per-part min aggregate joined
      // back on (partkey, exact cost equality) — unit cost is one IEEE
      // division and min is selection, so the equality is deterministic
      // cross-engine. Plan: part (size band) + supplier⋈nation⋈region
      // both broadcast; the pair aggregate and the per-part min are
      // co-keyed on l_partkey (one exchange reused); top-10 via
      // TakeOrderedAndProject under a total order.
      val pf = Tables.table(spark, dir, "part")
        .filter(col("p_size").between(10, 20)).select("p_partkey", "p_name")
      val eu = Tables.table(spark, dir, "supplier").as("s")
        .join(Tables.table(spark, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.table(spark, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val eps = Tables.table(spark, dir, "lineitem")
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal",
          "n_name")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      val mc = eps.groupBy(col("l_partkey").as("mc_pk"))
        .agg(min("unit_cost").as("min_cost"))
      eps.join(mc, col("l_partkey") === col("mc_pk")
          && col("unit_cost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("s_suppkey"),
          col("n_name"), col("l_partkey").as("p_partkey"), col("p_name"),
          Canon.round6(col("unit_cost")).as("unit_cost"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"), col("p_partkey"))
        .limit(10)
    },

    "tpch_q4" -> { (spark, dir) =>
      // Order-priority checking (TPC-H Q4 shape). The fixture has no
      // commit/receipt dates, so "problem order" = EXISTS a lineitem
      // shipped more than 60 days after the order date. The EXISTS is a
      // LEFT SEMI join whose condition references both sides (the
      // correlated predicate rides the join), keyed on orderkey — the
      // one fact⋈fact shuffle; the quarter filter is pushed to the
      // orders scan; output is ≤5 rows.
      val ord = Tables.table(spark, dir, "orders")
        .filter(col("o_orderdate") >= ntz("1996-07-01")
          && col("o_orderdate") < ntz("1996-10-01"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = Tables.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
      ord.join(li, col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL '60' DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    "tpch_q6" -> { (spark, dir) =>
      // Forecasting-revenue-change (TPC-H Q6): pure scan-aggregate —
      // year + discount band + quantity cap all pushed to the parquet
      // scan (range predicates on plain columns), one partial+final
      // decimal aggregate, ONE output row. The canonical "is the scan
      // path clean" probe: no join, no shuffle beyond the 1-row final.
      Tables.table(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ntz("1996-01-01")
          && col("l_shipdate") < ntz("1997-01-01")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_items"),
          Canon.moneySum(col("l_extendedprice") * col("l_discount"))
            .as("revenue"))
    },

    "tpch_q8" -> { (spark, dir) =>
      // National market share (TPC-H Q8): of the AMERICA-region ECONOMY
      // market (customer region defines the market), the revenue share
      // supplied by NATION_8, per order year. One lineitem⋈orders
      // shuffle; part (type prefix), customer⋈nation⋈region, and
      // supplier all broadcast. Share = conditional/total decimal sums
      // in one aggregate — the tpch_q14 ratio pattern — so the division
      // is one IEEE op on exact operands.
      val vol = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(Canon.Dec)
      val amCust = Tables.table(spark, dir, "customer").as("c")
        .join(Tables.table(spark, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .join(Tables.table(spark, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "AMERICA")
        .select("c_custkey")
      val ord = Tables.table(spark, dir, "orders")
        .filter(col("o_orderdate") >= ntz("1996-01-01")
          && col("o_orderdate") < ntz("1998-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val part = Tables.table(spark, dir, "part")
        .filter(col("p_type").startsWith("ECONOMY")).select("p_partkey")
      val supp = Tables.table(spark, dir, "supplier")
        .select("s_suppkey", "s_nationkey")
      Tables.table(spark, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(amCust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("s_nationkey") === 8, vol)
            .otherwise(lit(0).cast(Canon.Dec))).as("nat"),
          sum(vol).as("tot"))
        .select(col("o_year"),
          Canon.round6(col("nat").cast("double") / col("tot").cast("double"))
            .as("mkt_share"))
        .orderBy("o_year")
    },

    "tpch_q9" -> { (spark, dir) =>
      // Product-type profit (TPC-H Q9 shape). No ps_supplycost, so cost
      // is the stated proxy 0.5·p_retailprice·l_quantity; profit =
      // revenue − cost summed exactly in DECIMAL per (supplier nation,
      // order year) for parts matching '%gear%'. One lineitem⋈orders
      // shuffle; part (name filter), supplier, nation broadcast. Output
      // ≤ |nations|·|years|.
      val profit = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(Canon.Dec) -
        (lit(0.5) * col("p_retailprice") * col("l_quantity")).cast(Canon.Dec)
      val part = Tables.table(spark, dir, "part")
        .filter(col("p_name").contains("gear"))
        .select("p_partkey", "p_retailprice")
      val supp = Tables.table(spark, dir, "supplier")
        .select("s_suppkey", "s_nationkey")
      val nat = Tables.table(spark, dir, "nation")
        .select("n_nationkey", "n_name")
      val ord = Tables.table(spark, dir, "orders")
        .select("o_orderkey", "o_orderdate")
      Tables.table(spark, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum(profit), 4).cast("double").as("sum_profit"))
        .orderBy("nation", "o_year")
    },

    "tpch_q11" -> { (spark, dir) =>
      // Important-stock identification (TPC-H Q11 shape). Stock value is
      // derived (no partsupp): per part, the shipped revenue from
      // NATION_13's suppliers; report parts whose value exceeds the
      // all-part average — the scalar-subquery threshold decorrelated
      // into a 1-row aggregate BROADCAST back (the tpch_q22 pattern;
      // TPC-H's own 0.0001/SF fraction is scale-dependent, the mean is
      // not). Supplier side broadcast; one partkey aggregate; top-30
      // via TakeOrderedAndProject under (value desc, partkey).
      val supp13 = Tables.table(spark, dir, "supplier")
        .filter(col("s_nationkey") === 13).select("s_suppkey")
      val pv = Tables.table(spark, dir, "lineitem")
        .join(broadcast(supp13), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(Canon.Dec)).as("val"))
      val thr = pv.agg((sum(col("val")).cast("double") / count(lit(1)))
        .as("t"))
      pv.crossJoin(broadcast(thr))
        .filter(col("val").cast("double") > col("t"))
        .select(col("l_partkey"), Canon.decRound4(col("val")).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
        .limit(30)
    },

    "tpch_q12" -> { (spark, dir) =>
      // Shipping-mode / order-priority (TPC-H Q12 shape). No l_shipmode,
      // so the two classes are ship-latency derived: LATE = shipped
      // more than 90 days after order date. One co-keyed
      // lineitem⋈orders shuffle (year filter pushed to the lineitem
      // scan), one conditional-count aggregate, two rows out.
      val ord = Tables.table(spark, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.table(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ntz("1996-01-01")
          && col("l_shipdate") < ntz("1997-01-01"))
        .select("l_orderkey", "l_shipdate")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(when(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL '90' DAY"), "LATE")
          .otherwise("ONTIME").as("ship_class"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_count"))
        .orderBy("ship_class")
    },

    "tpch_q13" -> { (spark, dir) =>
      // Customer order-count distribution (TPC-H Q13). The fixture is
      // referentially total (every customer has orders — FIXTURES.md
      // density caveat), so the outer-join path is made non-degenerate
      // by the priority exclusion; customers with zero qualifying
      // orders land in the c_count=0 bucket. Written aggregate-first:
      // orders reduce to per-customer counts BEFORE meeting customer
      // (never an outer join of raw fact rows — at 100 TB the join
      // input is |customers|, not |orders|), then the histogram is a
      // second tiny aggregate.
      val perCust = Tables.table(spark, dir, "orders")
        .filter(!col("o_orderpriority").startsWith("4"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      Tables.table(spark, dir, "customer").select("c_custkey")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    "tpch_q15" -> { (spark, dir) =>
      // Top supplier (TPC-H Q15): suppliers whose quarter revenue equals
      // the maximum — the scalar-subquery max kept as an EXACT DECIMAL
      // so the equality is engine-deterministic (a double max could
      // round-trip differently). Revenue aggregate is the only
      // fact-sized work; the 1-row max broadcasts back; supplier
      // attaches broadcast.
      val rev = Tables.table(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ntz("1996-01-01")
          && col("l_shipdate") < ntz("1996-04-01"))
        .groupBy("l_suppkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(Canon.Dec)).as("tr"))
      val mx = rev.agg(max(col("tr")).as("mx"))
      val supp = Tables.table(spark, dir, "supplier")
        .select("s_suppkey", "s_name")
      rev.crossJoin(broadcast(mx)).filter(col("tr") === col("mx"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          Canon.decRound4(col("tr")).as("total_revenue"))
        .orderBy("s_suppkey")
    },

    "tpch_q17" -> { (spark, dir) =>
      // Small-quantity-order revenue (TPC-H Q17): Brand#3 lineitems
      // below 20% of their part's average quantity; report yearly-ized
      // revenue. The correlated avg-quantity subquery decorrelates into
      // a per-part aggregate (≤|parts| rows) joined BROADCAST back onto
      // the brand-filtered scan — the fact table is read twice but
      // never shuffled on partkey; at 100 TB the aggregate side is
      // dimension-sized. One output row.
      val pa = Tables.table(spark, dir, "lineitem")
        .groupBy(col("l_partkey").as("pk"))
        .agg((sum(col("l_quantity").cast(Canon.Dec)).cast("double")
          / count(lit(1))).as("avg_qty"))
      val b3 = Tables.table(spark, dir, "part")
        .filter(col("p_brand") === "Brand#3").select("p_partkey")
      Tables.table(spark, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(b3), col("l_partkey") === col("p_partkey"))
        .join(broadcast(pa), col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(count(lit(1)).as("n_items"),
          Canon.round4(sum(col("l_extendedprice").cast(Canon.Dec))
            .cast("double") / 7.0).as("avg_yearly"))
    },

    "tpch_q20" -> { (spark, dir) =>
      // Potential-part promotion (TPC-H Q20 shape). "Excess stock"
      // derives from lineitem (no ps_availqty): a (part, supplier) pair
      // qualifies when its 1996 shipped quantity exceeds 30% of its
      // lifetime shipped quantity, for 'cold%' parts; report EUROPE
      // suppliers having any qualifying pair. The nested IN-subqueries
      // become: two co-keyed pair aggregates (year + lifetime — same
      // (partkey, suppkey) grouping, one exchange reused), broadcast
      // part-name filter, then a LEFT SEMI from the EUROPE supplier dim
      // onto the qualifying-supplier keys.
      val pairKey = Seq("l_partkey", "l_suppkey")
      val coldParts = Tables.table(spark, dir, "part")
        .filter(col("p_name").startsWith("cold")).select("p_partkey")
      val li = Tables.table(spark, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(broadcast(coldParts), col("l_partkey") === col("p_partkey"))
      val y96 = li.filter(col("l_shipdate") >= ntz("1996-01-01")
          && col("l_shipdate") < ntz("1997-01-01"))
        .groupBy(pairKey.head, pairKey.tail: _*)
        .agg(sum(col("l_quantity").cast(Canon.Dec)).as("q96"))
      val tot = li.groupBy(col("l_partkey").as("tpk"),
          col("l_suppkey").as("tsk"))
        .agg(sum(col("l_quantity").cast(Canon.Dec)).as("qall"))
      val qual = y96.join(tot, col("l_partkey") === col("tpk")
          && col("l_suppkey") === col("tsk"))
        .filter(col("q96").cast("double") > lit(0.3) * col("qall").cast("double"))
        .select(col("l_suppkey").as("qk")).distinct()
      Tables.table(spark, dir, "supplier").as("s")
        .join(Tables.table(spark, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.table(spark, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .join(qual, col("s_suppkey") === col("qk"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    },

    "tpch_q21" -> { (spark, dir) =>
      // Suppliers-who-kept-orders-waiting (TPC-H Q21 shape, receipt
      // dates substituted by ship dates): for finalized ('F') orders
      // with MULTIPLE suppliers, count per supplier the orders where it
      // alone shipped last — the EXISTS (another supplier) / NOT EXISTS
      // (another equally-late supplier) pair becomes two order-keyed
      // aggregates (max shipdate + distinct-supplier counts, overall
      // and at-the-max), all joined co-keyed on orderkey with the
      // lineitem rows — one hash partitioning reused across every step;
      // orders' status filter pushed; supplier broadcast; top-20 via
      // TakeOrderedAndProject.
      val li = Tables.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val os = li.groupBy(col("l_orderkey").as("ok"))
        .agg(max("l_shipdate").as("ms"),
          countDistinct("l_suppkey").as("ns"))
      val lastL = li.join(os, col("l_orderkey") === col("ok")
        && col("l_shipdate") === col("ms"))
      val am = lastL.groupBy(col("ok").as("ok2"))
        .agg(countDistinct("l_suppkey").as("nm"))
      val ordF = Tables.table(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      val supp = Tables.table(spark, dir, "supplier")
        .select("s_suppkey", "s_name")
      lastL.join(am, col("ok") === col("ok2"))
        .filter(col("ns") > 1 && col("nm") === 1)
        .join(ordF, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }
  )

  def oracle = Map(
    "tpch_q2" ->
      """WITH pf AS (SELECT p_partkey, p_name FROM part
        |  WHERE p_size BETWEEN 10 AND 20),
        |eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |eps AS (SELECT l_partkey, p_name, s_suppkey, s_name, s_acctbal,
        |    n_name, min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem JOIN pf ON l_partkey = p_partkey
        |  JOIN eu ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |mc AS (SELECT l_partkey AS pk, min(unit_cost) AS min_cost
        |  FROM eps GROUP BY 1)
        |SELECT s_acctbal, s_name, s_suppkey, n_name,
        |  l_partkey AS p_partkey, p_name,
        |  CAST(round(unit_cost, 6) AS DOUBLE) AS unit_cost
        |FROM eps JOIN mc ON l_partkey = pk AND unit_cost = min_cost
        |ORDER BY s_acctbal DESC, s_suppkey, p_partkey
        |LIMIT 10""".stripMargin,

    "tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "tpch_q6" ->
      """SELECT count(*) AS n_items,
        |  CAST(round(sum(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(round(
        |    CAST(sum(CASE WHEN s_nationkey = 8
        |      THEN CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(18,6))) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE r_name = 'AMERICA' AND p_type LIKE 'ECONOMY%'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "tpch_q9" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(round(sum(
        |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
        |    - CAST(0.5 * p_retailprice * l_quantity AS DECIMAL(18,6))),
        |    4) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year""".stripMargin,

    "tpch_q11" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,6))) AS val
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey = 13 GROUP BY 1),
        |thr AS (SELECT CAST(sum(val) AS DOUBLE) / count(*) AS t FROM pv)
        |SELECT l_partkey, CAST(round(val, 4) AS DOUBLE) AS value
        |FROM pv, thr
        |WHERE CAST(val AS DOUBLE) > t
        |ORDER BY value DESC, l_partkey
        |LIMIT 30""".stripMargin,

    "tpch_q12" ->
      """SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |    THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY ship_class""".stripMargin,

    "tpch_q13" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4%'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,6))) AS tr
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  CAST(round(tr, 4) AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE tr = (SELECT max(tr) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "tpch_q17" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pk,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_items,
        |  CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
        |    AS DOUBLE) / 7.0, 4) AS DOUBLE) AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN pa   ON pk = l_partkey
        |WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty""".stripMargin,

    "tpch_q20" ->
      """WITH cold AS (SELECT p_partkey FROM part
        |  WHERE p_name LIKE 'cold%'),
        |y96 AS (SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS q96
        |  FROM lineitem JOIN cold ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2),
        |tot AS (SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS qall
        |  FROM lineitem JOIN cold ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |qual AS (SELECT DISTINCT y96.l_suppkey AS qk
        |  FROM y96 JOIN tot ON y96.l_partkey = tot.l_partkey
        |    AND y96.l_suppkey = tot.l_suppkey
        |  WHERE CAST(q96 AS DOUBLE) > 0.3 * CAST(qall AS DOUBLE))
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (SELECT qk FROM qual)
        |ORDER BY s_suppkey""".stripMargin,

    "tpch_q21" ->
      """WITH os AS (SELECT l_orderkey AS ok, max(l_shipdate) AS ms,
        |    count(DISTINCT l_suppkey) AS ns
        |  FROM lineitem GROUP BY 1),
        |am AS (SELECT l.l_orderkey AS ok2,
        |    count(DISTINCT l_suppkey) AS nm
        |  FROM lineitem l JOIN os ON l.l_orderkey = os.ok
        |    AND l.l_shipdate = os.ms
        |  GROUP BY 1)
        |SELECT s_name, count(*) AS numwait
        |FROM lineitem l
        |JOIN os ON l.l_orderkey = os.ok AND l.l_shipdate = os.ms
        |JOIN am ON l.l_orderkey = am.ok2
        |JOIN orders   ON o_orderkey = l.l_orderkey
        |JOIN supplier ON s_suppkey = l.l_suppkey
        |WHERE os.ns > 1 AND am.nm = 1 AND o_orderstatus = 'F'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin
  )
}
