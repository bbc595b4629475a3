package graft

import org.apache.spark.sql.functions._

/** Round-6 wave 35: source_text roundtrip fidelity and events_top_movers
  * vs naive recomputation.
  */
class Wave35Spec extends SparkSpec {

  test("source_text roundtrips every document byte-exactly") {
    val orig = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = q("source_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == orig)
  }

  test("events_top_movers is the global top-10 by absolute day-over-day delta") {
    val daily = Tables.events(spark, sfDir)
      .select(expr("ts_us div 86400000000").as("day"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day", "event_type").agg(sum("c").as("tot"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byType = daily.groupBy(_._2).view.mapValues(_.sortBy(_._1)).toMap
    val deltas = byType.toSeq.flatMap { case (ty, days) =>
      days.sliding(2).collect { case Array((_, _, p), (d, _, t)) =>
        (d, ty, t, p, t - p)
      }
    }
    val expected = deltas
      .sortBy { case (d, ty, _, _, dl) => (-math.abs(dl), d, ty) }.take(10)
    val got = q("events_top_movers").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("supplier_scorecard metrics match a naive per-supplier fold") {
    val li = Tables.table(spark, sfDir, "lineitem")
      .join(Tables.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lat"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getString(3), r.getLong(4)))
    val bySup = li.groupBy(_._1)
    val rows = q("supplier_scorecard").collect()
    assert(rows.length == math.min(20, bySup.size))
    var prevRev = Double.MaxValue
    for (r <- rows) {
      val g = bySup(r.getLong(0))
      assert(r.getLong(3) == g.length, s"supplier ${r.getLong(0)} n_items")
      val rev = g.map { case (_, p, d, _, _) =>
        BigDecimal(p).setScale(6) * (BigDecimal(1) - BigDecimal(d).setScale(6))
      }.sum
      assert((BigDecimal(r.getDouble(4)) - rev.setScale(4,
        BigDecimal.RoundingMode.HALF_UP)).abs < 1e-9,
        s"supplier ${r.getLong(0)} revenue")
      val retRate = g.count(_._4 == "R").toDouble / g.length
      assert(math.abs(r.getDouble(5) - retRate) < 1e-6)
      val avgLat = g.map(_._5).sum.toDouble / g.length
      assert(math.abs(r.getDouble(6) - avgLat) < 1e-6)
      assert(r.getDouble(4) <= prevRev); prevRev = r.getDouble(4)
    }
  }
}