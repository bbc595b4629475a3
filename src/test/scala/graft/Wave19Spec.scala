package graft

import org.apache.spark.sql.functions._

/** Brute-force cross-checks for the wave-19/20 additions: each query's
  * semantics recomputed naively on the driver at sf0.001.
  */
class Wave19Spec extends SparkSpec {

  test("win_ewma matches a naive per-user EWMA over the 10-frame") {
    val series = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._2, t._3))).toMap
    val got = q("win_ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(4))
      .toMap
    for ((u, vs) <- series; i <- vs.indices) {
      val frame = vs.slice(math.max(0, i - 9), i + 1).map(_._4)
      val n = frame.length
      val s = frame.zipWithIndex.map { case (v, j) =>
        v * math.pow(0.5, n - 1 - j)
      }.sum
      val wsum = (0 until n).map(j => math.pow(0.5, n - 1 - j)).sum
      val naive = s / wsum
      val key = (u, vs(i)._2, vs(i)._3)
      assert(math.abs(got(key) - naive) < 1e-6,
        s"ewma for $key: ${got(key)} vs $naive")
    }
  }

  test("features_pit_assemble: strictly-before semantics, no leakage") {
    val rows = q("features_pit_assemble").collect()
    assert(rows.nonEmpty)
    val events = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3))).toMap
    for (r <- rows) {
      val (u, ts, eid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val hist = events(u).takeWhile(t =>
        t._2 < ts || (t._2 == ts && t._3 < eid))
      val views = hist.filter(_._4 == "view")
      if (views.nonEmpty) {
        assert(r.getDouble(3) == views.last._5, s"last_view_value for $eid")
        assert(r.getLong(4) == ts - views.last._2, s"us_since_view for $eid")
      } else assert(r.isNullAt(3) && r.isNullAt(4))
      // range frame: views with ts in [ts-1h, ts-1] regardless of order key
      val v1h = events(u).count(t =>
        t._4 == "view" && t._2 >= ts - 3600000000L && t._2 <= ts - 1)
      assert(r.getLong(5) == v1h, s"views_1h for $eid")
    }
  }

  test("bpe_merge_apply: rule is the bpe_pair_counts top pair; merged symbols are consistent") {
    val top = q("bpe_pair_counts").filter(col("rnk") === 1)
      .head().getString(1)
    val rows = q("bpe_merge_apply").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1) == top), "rule column must be the top pair")
    // every post-merge pair is symbol+symbol where symbols are single
    // chars or the merged rule
    for (r <- rows) {
      val Array(a, b) = r.getString(2).split("\\+", 2)
      for (s <- Seq(a, b))
        assert(s.length == 1 || s == top, s"unexpected symbol '$s'")
      // the merged pair 'rule+x' can only follow a merge boundary; and
      // no pair can be the two halves of the rule adjacent unmerged
      // UNLESS separated by the left-to-right convention (overlap), so
      // the raw rule pair may only survive with count <= its original
      assert(r.getLong(3) > 0)
    }
  }

  test("sample_balanced: every label keeps exactly the min class count") {
    val got = q("sample_balanced").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val byLabel = Tables.table(spark, sfDir, "embeddings")
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cap = byLabel.values.min
    val kept = got.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(kept.keySet == byLabel.keySet)
    assert(kept.values.forall(_ == cap), s"kept=$kept cap=$cap")
    // ranks dense 1..cap
    got.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq == (1L to cap))
    }
  }

  test("dq_referential: totals match table counts, zero orphans on the total fixture") {
    val rows = q("dq_referential").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Set("customer.nationkey", "lineitem.orderkey",
      "lineitem.partkey", "lineitem.suppkey", "orders.custkey"))
    val li = Tables.table(spark, sfDir, "lineitem").count()
    assert(rows("lineitem.orderkey")._1 == li)
    assert(rows.values.forall(_._3 == 0L), "fixture is referentially total")
  }

  test("dedup_media_exact: candidate groups honest about content distinctness") {
    val rows = q("dedup_media_exact").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, d) = (r.getLong(3), r.getLong(4))
      assert(n >= 2 && d >= 1 && d <= n)
    }
    // this corpus has no byte-identical docs: distinct == candidates
    val docs = Tables.table(spark, sfDir, "documents")
      .select("text").distinct().count()
    if (docs == Tables.table(spark, sfDir, "documents").count())
      assert(rows.forall(r => r.getLong(4) == r.getLong(3)))
  }
}
