package graft

import org.apache.spark.sql.functions._

/** Group E/H specs — window semantics + scalar function invariants. */
class WindowSpec extends SparkSpec {

  test("win_topk_per_group: ≤3 rows per customer, rank ordered") {
    val df = q("win_topk_per_group")
    val over = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(over == 0)
    assert(df.filter(col("rn") > 3).count() == 0)
  }

  test("windows never change row counts") {
    val orders = Tables.table(spark, sfDir, "orders").count()
    assert(q("win_running_sum").count() == orders)
    assert(q("win_moving_avg").count() == orders)
    assert(q("win_ntile").count() ==
      Tables.table(spark, sfDir, "customer").count())
    assert(q("win_lag_delta").count() ==
      Tables.events(spark, sfDir).count())
  }

  test("win_rank_dense: dense_rank ≤ rank everywhere") {
    assert(q("win_rank_dense").filter(col("drnk") > col("rnk")).count() == 0)
  }

  test("win_ntile quartiles are balanced") {
    val sizes = q("win_ntile").groupBy("quartile").count()
      .collect().map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
  }

  test("win_ntile == single-window ntile row-for-row (distributed rewrite)") {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("c_acctbal", "c_custkey")
    val ref = Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"))
    val got = q("win_ntile")
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
  }

  test("win_lag_delta: deltas non-negative (ordered per user)") {
    assert(q("win_lag_delta")
      .filter(col("delta_us") < 0).count() == 0)
  }

  test("fn_array: l2 norm of unit vectors is 1.0") {
    val bad = q("fn_array").filter(abs(col("l2_norm") - 1.0) > 1e-4).count()
    assert(bad == 0, "embeddings are unit-norm by fixture contract")
  }

  test("events_downsample keeps exactly every 10th report per user") {
    val df = q("events_downsample")
    assert(df.filter((col("rn") - 1) % 10 =!= 0).count() == 0)
    // per-user row count must be ceil(n_user/10); first kept rank is 1
    val kept = df.groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Tables.events(spark, sfDir).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kept.keySet == full.keySet)
    full.foreach { case (u, n) => assert(kept(u) == (n + 9) / 10, s"user $u") }
  }

  test("fn_string/fn_math/fn_datetime/fn_json run with expected shapes") {
    assert(q("fn_string").count() == 200)
    assert(q("fn_math").count() == 1500)
    val months = q("fn_datetime").collect()
    assert(months.length == 80) // 1995-01 .. 2001-08
    val json = q("fn_json").collect()
    assert(json.map(_.getAs[Long]("n")).sum == 1000)
  }

  test("win_percent_rank: fractions in [0,1], max per brand is 1") {
    val rows = q("win_percent_rank").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    rows.foreach { case (_, pr, cd) =>
      assert(pr >= 0.0 && pr <= 1.0)
      assert(cd > 0.0 && cd <= 1.0)
    }
    rows.groupBy(_._1).foreach { case (brand, rs) =>
      assert(rs.map(_._2).max == 1.0, s"percent_rank max for $brand")
      assert(rs.map(_._3).max == 1.0, s"cume_dist max for $brand")
    }
  }

  test("fn_struct: facets read back through structs equal the raw columns") {
    import org.apache.spark.sql.functions.col
    val got = q("fn_struct")
      .select("l_orderkey", "l_linenumber", "charge2_amt", "charge3_amt")
      .collect().map(r =>
        ((r.getLong(0), r.getInt(1)), (r.getDouble(2), r.getDouble(3))))
    val raw = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (-col("l_extendedprice") * col("l_discount")).as("d"),
        (col("l_extendedprice") * col("l_tax")).as("t"))
      .collect().map(r =>
        ((r.getLong(0), r.getInt(1)), (r.getDouble(2), r.getDouble(3))))
      .groupBy(_._1)
    got.foreach { case (k, v) =>
      assert(raw(k).map(_._2).contains(v), s"struct facet mismatch at $k")
    }
  }

  test("events_heatmap: buckets in range, counts cover the table exactly") {
    val rows = q("events_heatmap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (dow, hour, n, users) =>
      assert(dow >= 0 && dow <= 6 && hour >= 0 && hour <= 23)
      assert(users >= 1 && users <= n)
    }
    assert(rows.map(_._3).sum == Tables.events(spark, sfDir).count(),
      "every event lands in exactly one cell")
    // spot-check one cell against an independent recompute
    val (d0, h0, n0, u0) = rows.head
    val cell = Tables.events(spark, sfDir)
      .filter(expr(s"(ts_us div 86400000000 + 4) % 7 = $d0" +
        s" AND (ts_us % 86400000000) div 3600000000 = $h0"))
    assert(cell.count() == n0)
    assert(cell.select("user_id").distinct().count() == u0)
  }

  test("win_streak == per-user sequential longest-run recompute") {
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val brute = evs.groupBy(_._1).view.mapValues { arr =>
      val hot = arr.sortBy(e => (e._2, e._3)).map(_._4 > 35)
      val starts = arr.sortBy(e => (e._2, e._3)).map(_._2)
      // walk runs of consecutive true, tracking (len, start)
      var best = (0L, Long.MaxValue); var cur = 0L; var curStart = 0L
      hot.indices.foreach { i =>
        if (hot(i)) {
          if (cur == 0) curStart = starts(i)
          cur += 1
          if (cur > best._1) best = (cur, curStart)
        } else cur = 0
      }
      best
    }.filter(_._2._1 > 0).toMap
    val got = q("win_streak").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("events_trend == brute-force least-squares slope per vehicle") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val truth = rows.groupBy(_._1).map { case (u, rs) =>
      val minTs = rs.map(_._2).min
      val xs = rs.map(r => ((r._2 - minTs) / 1000000L).toDouble)
      val ys = rs.map(_._3)
      val n = rs.length.toDouble
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(x => x * x).sum
      val den = n * sxx - sx * sx
      u -> (rs.length.toLong, if (den > 0) (n * sxy - sx * sy) / den else 0.0)
    }
    val got = q("events_trend").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == truth.size)
    got.foreach { case (u, n, slope) =>
      val (tn, tslope) = truth(u)
      assert(n == tn, s"count for vehicle $u")
      // JVM double sums differ from exact-decimal staging by float
      // accumulation order only — tolerance, not equality
      assert(math.abs(slope - tslope) < 1e-6, s"slope drift for $u")
    }
  }

  test("win_pattern_vshape matches a naive per-user scan") {
    import org.apache.spark.sql.functions._
    val series = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._2, t._3)).map(t => (t._2, t._4)))
    val truth = series.toMap.view.mapValues { vs =>
      val hits = vs.indices.drop(2).filter(i =>
        vs(i - 2)._2 > vs(i - 1)._2 && vs(i - 1)._2 < vs(i)._2)
      (hits.length.toLong,
        if (hits.nonEmpty) Some(vs(hits.head)._1) else None)
    }.toMap
    val got = q("win_pattern_vshape").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == truth.filter(_._2._1 > 0).keySet)
    got.foreach { case (u, (n, first)) =>
      assert(n == truth(u)._1, s"vshape count for $u")
      assert(first == truth(u)._2.get, s"first match ts for $u")
    }
  }

  test("events_coverage: bounds and single-event-island consistency") {
    import org.apache.spark.sql.functions._
    val rows = q("events_coverage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val counts = Tables.events(spark, sfDir).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == counts.size)
    rows.foreach { case (u, islands, covered) =>
      assert(islands >= 1 && islands <= counts(u))
      // every island lasts at least the 30-min hold; coverage can never
      // exceed one hold per event
      assert(covered >= islands * 1800, s"vehicle $u covered=$covered")
      assert(covered <= counts(u) * 1800, s"vehicle $u covered=$covered")
    }
  }

  test("features_target_encode: shrinkage pulls every segment toward the prior") {
    import org.apache.spark.sql.functions._
    val rows = q("features_target_encode").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 5, "five market segments")
    // recompute the global mean the same way
    val j = Tables.table(spark, sfDir, "orders")
      .join(Tables.table(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
    val g = j.agg(sum(col("o_totalprice").cast(Canon.Dec)).cast("double"),
      count(lit(1))).head()
    val gmean = g.getDouble(0) / g.getLong(1)
    rows.foreach { case (seg, n, segMean, enc) =>
      assert(n > 0)
      // encoded must lie between the segment mean and the global mean
      // (convex combination with weight n/(n+m)) — allow rounding slack
      val lo = math.min(segMean, gmean) - 1e-4
      val hi = math.max(segMean, gmean) + 1e-4
      assert(enc >= lo && enc <= hi, s"$seg: enc=$enc outside [$lo,$hi]")
      // and be strictly closer to the segment mean than the prior is,
      // since n >> 0 here
      assert(math.abs(enc - segMean) <= math.abs(gmean - segMean) + 1e-4)
    }
  }
}
