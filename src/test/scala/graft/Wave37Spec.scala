package graft

/** Round-6 wave 37: text_oov_rate vs a naive vocabulary fold. */
class Wave37Spec extends SparkSpec {

  test("text_oov_rate matches the naive top-16 vocabulary coverage") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val freq = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length).toMap
    val vocab = freq.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(16).map(_._1).toSet
    val rows = q("text_oov_rate").collect()
    assert(rows.length == docs.length)
    val byId = docs.toMap
    var sawOov = false
    for (r <- rows) {
      val toks = byId(r.getLong(0))
      val oov = toks.count(!vocab(_))
      assert(r.getLong(1) == toks.length)
      assert(r.getLong(2) == oov, s"doc ${r.getLong(0)} oov")
      if (oov > 0) sawOov = true
      assert(math.abs(r.getDouble(3) - oov.toDouble / toks.length) < 1e-6)
    }
    assert(sawOov, "the 16-token cut must leave real OOV mass")
  }

  test("events_state_dwell conserves each user's total span") {
    // sum of all dwell intervals across states = sum over users of
    // (last ts - first ts): intervals tile each user's span exactly
    val spans = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("ts_us").minus(
        org.apache.spark.sql.functions.min("ts_us")).as("span"))
      .collect().map(_.getLong(1)).sum
    val rows = q("events_state_dwell").collect()
    assert(rows.map(_.getLong(2)).sum == spans)
    // intervals = events - users (every event but each user's last)
    val nEvents = Tables.events(spark, sfDir).count()
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nEvents - nUsers)
  }

  test("ivm_join_delta: term decomposition tiles the direct join exactly") {
    import org.apache.spark.sql.functions._
    val rows = q("ivm_join_delta").collect()
    // direct view: one join + agg, no split
    val li = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(Canon.Dec).as("r"))
    val direct = li.join(Tables.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), round(sum("r"), 4).cast("double").as("rev"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.length == direct.size)
    var sawMultiTerm = false
    for (r <- rows) {
      val (n, rev) = direct(r.getLong(0))
      assert(r.getLong(1) == n && r.getDouble(2) == rev,
        s"customer ${r.getLong(0)}")
      if (r.getLong(3) > 1) sawMultiTerm = true
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 4)
    }
    assert(sawMultiTerm, "the 10% hash split must produce real delta terms")
  }

  test("events_profile_drift matches the naive two-half chi-square") {
    val r = q("events_profile_drift").head()
    val ev = Tables.events(spark, sfDir)
      .select("ts_us", "event_type").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val lo = ev.map(_._1).min; val hi = ev.map(_._1).max
    val mid = (lo + hi) / 2
    val cells = ev.map { case (us, ty) =>
      ((if (us < mid) 0 else 1,
        (((us / 86400000000L) % 7) + 7) % 7, ty), 1)
    }.groupBy(_._1).view.mapValues(_.size).toMap
    val n = ev.length.toDouble
    val byHalf = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val byCol = cells.groupBy(k => (k._1._2, k._1._3)).view
      .mapValues(_.values.sum).toMap
    val naive = cells.map { case ((h, d, ty), o) =>
      val e = byHalf(h) * byCol((d, ty)) / n
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(r.getDouble(0) - naive) < 1e-3,
      s"engine ${r.getDouble(0)} vs naive $naive")
    assert(r.getLong(1) == cells.size)
    assert(r.getLong(2) == ev.length)
  }

  test("sort_paginate returns exactly rows 21-40 of the global order") {
    import org.apache.spark.sql.functions._
    val all = Tables.table(spark, sfDir, "customer")
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (k, b) => (-b, k) }
    val expected = all.slice(20, 40).map(_._1).toSeq
    val got = q("sort_paginate").collect().map(_.getLong(0)).toSeq
    assert(got == expected)
    // the plan must stay a bounded top-(offset+limit), not a global sort
    val s = plan(q("sort_paginate"))
    assert(s.contains("TakeOrderedAndProject") || s.contains("GlobalLimit"),
      "pagination must plan through a bounded limit operator")
  }
}
