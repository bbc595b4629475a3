package graft

import org.apache.spark.sql.functions._

/** Round-8 wave 100: the count-min sketch's conservative-count law and
  * the hazard table's risk-set algebra, both against brute JVM
  * recomputes.
  */
class Wave100Spec extends SparkSpec {

  test("agg_countmin never underestimates, is exact for tokens with " +
    "collision-free rows, and matches a brute JVM sketch") {
    val rows = q("agg_countmin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10)
    rows.foreach { case (t, exact, est, over) =>
      assert(est >= exact, s"'$t' underestimated: $est < $exact")
      assert(over == est - exact)
    }
    // brute JVM sketch over the same tokens/hashes
    val P = 2147483647L
    val toks = Tables.table(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .withColumn("h", graft.operators.TextDedup.hash56(col("t")) % P)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val counters = Array.fill(4, 256)(0L)
    toks.foreach { case (_, h) =>
      (0 until 4).foreach { j =>
        counters(j)((((2 * j + 3) * h + (5 * j + 7)) % P % 256).toInt) += 1
      }
    }
    val hOf = toks.toMap
    val exactCnt = toks.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    rows.foreach { case (t, exact, est, _) =>
      assert(exactCnt(t) == exact)
      val h = hOf(t)
      val brute = (0 until 4).map(j =>
        counters(j)((((2 * j + 3) * h + (5 * j + 7)) % P % 256).toInt)).min
      assert(est == brute, s"'$t': sketch said $est, brute $brute")
    }
  }

  test("orders_hazard risk sets telescope (at_risk(b) = events(b) + " +
    "at_risk(b+1)) and match a brute JVM gap scan") {
    val got = q("orders_hazard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byWk = got.map(g => g._1 -> g).toMap
    got.foreach { case (wk, atRisk, events, hz) =>
      val nextRisk = byWk.get(wk + 1).map(_._2)
        .orElse(got.filter(_._1 > wk).sortBy(_._1).headOption.map(_._2))
        .getOrElse(0L)
      assert(atRisk == events + nextRisk,
        s"wk $wk: $atRisk != $events + $nextRisk")
      assert(math.abs(hz - events.toDouble / atRisk) < 5.01e-7)
    }
    // brute: per-customer consecutive day gaps
    val days = Tables.table(spark, sfDir, "orders")
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("day"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val gaps = days.values.flatMap { rs =>
      val s = rs.sortBy(r => (r._2, r._3))
      s.zip(s.tail).map { case (a, b) => math.min((b._2 - a._2) / 7, 12L) }
    }.toSeq
    val brute = gaps.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    got.foreach { case (wk, _, events, _) => assert(brute(wk) == events) }
    assert(got.map(_._3).sum == gaps.size)
  }
}
