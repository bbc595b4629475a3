package graft

import org.apache.spark.sql.functions._

/** Round-7 waves 63+: rolling-slope feature (and siblings). The oracle
  * proves cross-engine hash equality; here the MATH is pinned against a
  * from-scratch JVM least squares on the same frames.
  */
class Wave63Spec extends SparkSpec {

  test("features_rolling_slope matches a JVM least squares per trailing frame") {
    val got = q("features_rolling_slope").collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    val events = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    var checked = 0
    events.foreach { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val t0 = sorted.map(_._2).min
      sorted.indices.foreach { i =>
        val frame = sorted.slice(math.max(0, i - 9), i + 1)
        val xs = frame.map(r => ((r._2 - t0) / 1000000L).toDouble)
        val ys = frame.map(_._4)
        val n = frame.length.toDouble
        val sx = xs.sum; val sy = ys.sum
        val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
        val sxx = xs.map(a => a * a).sum
        val det = n * sxx - sx * sx
        val expect = if (det > 0) Some((n * sxy - sx * sy) / det) else None
        val key = (u, sorted(i)._2, sorted(i)._3)
        val (gn, gs) = got(key)
        assert(gn == frame.length, s"$key frame size")
        (gs, expect) match {
          case (None, None) => ()
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-4, s"$key slope $a vs $b")
          case other => fail(s"$key nullability mismatch: $other")
        }
        checked += 1
      }
    }
    assert(checked == got.size && checked > 0)
  }

  test("agg_histogram_equidepth: depths balanced, bounds contiguous, no single-task sort") {
    val rows = q("agg_histogram_equidepth").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).sameElements(1L to 8L))
    val total = Tables.table(spark, sfDir, "orders").count()
    assert(rows.map(_._2).sum == total)
    // SQL ntile law: depths differ by at most one, larger tiles first
    val depths = rows.map(_._2)
    assert(depths.max - depths.min <= 1)
    assert(depths.sameElements(depths.sortBy(-_)))
    // bounds are monotone and contiguous: each tile's lo ≥ previous hi
    rows.sliding(2).foreach { case Array((_, _, _, hi1), (_, _, lo2, _)) =>
      assert(lo2 >= hi1, s"tile bounds overlap: $hi1 then $lo2")
    }
    rows.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    // plan guard (win_ntile's law): an unpartitioned window may only run
    // over the tiny B-row bucket aggregate, never the input table
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val sp = q("agg_histogram_equidepth").queryExecution.sparkPlan
    sp.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      .foreach { w =>
        assert(w.find {
          case _: BaseAggregateExec => true; case _ => false
        }.isDefined, "global window must sit over the B-row aggregate only")
      }
    assert(sp.collect { case w: WindowExec if w.partitionSpec.nonEmpty => w }
      .nonEmpty, "the per-bucket local rank must be a partitioned window")
  }

  test("events_twap: bounded by day min/max value; uniform cadence degenerates to the mean") {
    val rows = q("events_twap").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(r => (r._1, r._2 / 86400000000L))
    rows.foreach { case ((u, d), (nHolds, spanUs, twap)) =>
      val day = ev((u, d)).sortBy(r => (r._2, r._3))
      assert(nHolds == day.length - 1, s"($u,$d) holds")
      assert(spanUs == day.last._2 - day.head._2, s"($u,$d) span")
      // TWAP is a convex combination of the held values (all but last)
      val held = day.dropRight(1).map(_._4)
      assert(twap >= held.min - 1e-6 && twap <= held.max + 1e-6,
        s"($u,$d) twap $twap outside [${held.min},${held.max}]")
      // JVM recompute with the same integer staging
      val dts = day.sliding(2).map(p => p(1)._2 - p(0)._2).toSeq
      val cents = held.map(v => math.floor(v * 100 + 0.5).toLong)
      val expect = cents.zip(dts).map { case (c, t) =>
        BigDecimal(c) * BigDecimal(t) }.sum.toDouble / spanUs / 100.0
      assert(math.abs(twap - expect) < 1e-5, s"($u,$d) $twap vs $expect")
    }
    // every (user, day) with ≥2 events must appear
    assert(rows.size == ev.count(_._2.length >= 2))
  }

  test("source_compaction: 64 shards collapse to ≤4 files, zero row drift") {
    val df = q("source_compaction")
    assert(df.count() == Tables.table(spark, sfDir, "lineitem").count())
    def parquetFiles(name: String): Int = {
      val dir = operators.ArtifactCache.path(name,
        Seq(s"$sfDir/lineitem.parquet"))(_ => fail("must already exist"))
      new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    }
    val frag = parquetFiles("fragmented_lineitem")
    val comp = parquetFiles("compacted_lineitem")
    assert(frag == 64, s"fragmented layout should be 64 shards, was $frag")
    assert(comp <= 4, s"compacted layout should be ≤4 files, was $comp")
  }

  test("dq_value_drift: chisq nonnegative, zero on an identical-halves stream") {
    val rows = q("dq_value_drift").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4)))
    assert(rows.length == 5)
    rows.foreach { case (t, bands, n, chisq, status) =>
      assert(chisq >= 0, s"$t chisq $chisq")
      assert(bands >= 2 && n > 0)
      assert(status == (if (chisq > 30.0) "drift" else "stable"), t)
    }
    // construction check: a stream whose two halves have IDENTICAL band
    // histograms must score chisq == 0 under this statistic
    val spark2 = spark
    import spark2.implicits._
    val sym = (0 until 400).map { i =>
      // same 4-band pattern in each half: ts 0..399 vs 400..799
      (1L, (i % 400).toLong * 1000000L + (if (i < 200) 0L else 400000000L),
        (i % 4) * 100.0 + 50.0)
    }
    // fold the same math in the JVM: both halves have 50 rows per band
    // → expected == observed in every cell → statistic is exactly 0
    val cells = sym.map { case (_, ts, v) =>
      (if (ts >= (sym.map(_._2).min + sym.map(_._2).max) / 2) 1 else 0,
        math.floor(v / 100).toLong) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byHalf = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val byBand = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val tot = cells.values.sum.toDouble
    val chi = cells.map { case ((h, b), o) =>
      val e = byHalf(h) * byBand(b) / tot
      (o - e) * (o - e) / e }.sum
    assert(chi == 0.0, s"symmetric stream must score zero, got $chi")
  }

  test("dq_id_gaps: reported ranges are truly empty and are the largest ones") {
    val gaps = q("dq_id_gaps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gaps.nonEmpty && gaps.length <= 10)
    val present = Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey").distinct().collect().map(_.getLong(0)).toSet
    gaps.foreach { case (after, next, miss) =>
      assert(next - after - 1 == miss && miss >= 1)
      assert(present(after) && present(next), "gap endpoints must be present")
      ((after + 1) until next).foreach(id =>
        assert(!present(id), s"id $id inside reported gap [$after,$next]"))
    }
    // the top entry is the genuine maximum run of absent ids
    val sorted = present.toSeq.sorted
    val trueMax = sorted.sliding(2).map(p => p(1) - p(0) - 1).max
    assert(gaps.head._3 == trueMax)
  }

  test("events_theilsen matches a JVM median-of-slopes; robust where LS is not") {
    // the declared query is wave 82's INCOMPLETE estimator: reading i
    // pairs with reading i + n/2 in (ts, event_id) order (ts ties
    // dropped) — mirror that exact pair set here
    val gotMap = q("events_theilsen").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val byUser = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      val s = rows.sortBy(r => (r._2, r._3))
      val h = s.length / 2
      val slopes = (0 until s.length - h).flatMap { i =>
        val (a, b) = (s(i), s(i + h))
        if (b._2 > a._2)
          Some((b._4 - a._4) / ((b._2 - a._2).toDouble / 1e6))
        else None
      }.sorted
      val med =
        if (slopes.length % 2 == 1) slopes(slopes.length / 2)
        else (slopes(slopes.length / 2 - 1) + slopes(slopes.length / 2)) / 2
      val (n, ts) = gotMap(u)
      assert(n == slopes.length, s"user $u pair count")
      assert(math.abs(ts - med) < 1e-5, s"user $u: $ts vs $med")
    }
    // robustness: a clean ramp with ONE wild spike — Theil-Sen holds the
    // true slope, least squares does not
    val clean = (0 until 40).map(i => (i.toDouble, i * 2.0))
    val spiked = clean.updated(39, (39.0, 5000.0))
    def theil(ps: Seq[(Double, Double)]): Double = {
      val sl = (for { i <- ps.indices; j <- (i + 1) until ps.length }
        yield (ps(j)._2 - ps(i)._2) / (ps(j)._1 - ps(i)._1)).sorted
      if (sl.length % 2 == 1) sl(sl.length / 2)
      else (sl(sl.length / 2 - 1) + sl(sl.length / 2)) / 2
    }
    def ls(ps: Seq[(Double, Double)]): Double = {
      val n = ps.length.toDouble
      val sx = ps.map(_._1).sum; val sy = ps.map(_._2).sum
      val sxy = ps.map(p => p._1 * p._2).sum
      val sxx = ps.map(p => p._1 * p._1).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    assert(math.abs(theil(spiked) - 2.0) < 0.1, "Theil-Sen shrugs the spike")
    assert(math.abs(ls(spiked) - 2.0) > 1.0, "LS is dragged by the spike")
  }

  test("sql_not_in_nulls: NOT IN with a NULL is empty; the rewrites agree with join_anti semantics") {
    // sf0.01: sf0.001 has no nation-10 supplier, so no NULL enters the
    // set and the trap would not spring
    val rows = q("sql_not_in_nulls", sfDir01).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("not_in") == 0L,
      "one NULL in the subquery set must empty the NOT IN result")
    assert(rows("not_exists") == rows("not_in_nullsafe"))
    assert(rows("not_exists") > 0)
    // cross-check against a DataFrame left-anti join on the same keys
    val k = Tables.table(spark, sfDir01, "supplier")
      .select(expr("nullif(s_nationkey, 10)").as("sk")).filter(col("sk").isNotNull)
    val anti = Tables.table(spark, sfDir01, "customer")
      .join(k, col("c_nationkey") === col("sk"), "left_anti").count()
    assert(rows("not_exists") == anti)
  }

  test("orders_rev_recognition: proration conserves every cent") {
    val months = q("orders_rev_recognition").collect()
    val recognized = months.map(r => BigDecimal(r.getDouble(2))).sum
    val totalCents = Tables.table(spark, sfDir, "orders")
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
      .collect().map(_.getLong(0)).sum
    // Σ monthly revenue must equal Σ order totals TO THE CENT — the
    // integer remainder distribution guarantees zero proration drift
    assert((recognized * 100).toLongExact == totalCents,
      s"recognized $recognized vs cents $totalCents")
    // day counts: every order contributes exactly len = key%60+1 days
    val expectDays = Tables.table(spark, sfDir, "orders")
      .select((col("o_orderkey") % 60 + 1)).collect().map(_.getLong(0)).sum
    assert(months.map(_.getLong(1)).sum == expectDays)
  }

  test("orders_fulfillment: grid partitions every order exactly once") {
    val rows = q("orders_fulfillment").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4))))
    val stages = rows.map(_._1._1).toSet
    assert(stages.subsetOf(Set("fulfilled", "open", "partial")))
    val li = Tables.table(spark, sfDir, "lineitem")
    assert(rows.map(_._2._1).sum ==
      li.select("l_orderkey").distinct().count(), "orders partition")
    assert(rows.map(_._2._2).sum == li.count(), "lines partition")
    // value rolls up to the exact corpus total
    val total = BigDecimal(li.agg(
      round(sum(col("l_extendedprice").cast(Canon.Dec)), 4).cast("double"))
      .head().getDouble(0))
    assert((rows.map(t => BigDecimal(t._2._3)).sum - total).abs < 0.01)
  }

  test("pricing_waterfall: the bridge reconciles (net == gross - disc + tax)") {
    val rows = q("pricing_waterfall").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (yr, gross, disc, tax, net) =>
      assert(gross > 0 && disc > 0 && tax > 0, s"year $yr empty component")
      assert(disc < gross && tax < gross)
      // components were rounded independently → cent-scale slack only
      val bridged = BigDecimal(gross) - BigDecimal(disc) + BigDecimal(tax)
      assert((bridged - BigDecimal(net)).abs < 0.05,
        s"year $yr: bridged $bridged vs net $net")
    }
  }

  test("events_weekend_effect: calendar split is correct; t matches a JVM Welch") {
    val rows = q("events_weekend_effect").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(rows.length == 5)
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "ts_us", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { case (t, n1, n0, tStat) =>
      val mine = ev.filter(_._1 == t)
      val (we, wd) = mine.partition(e => (e._2 / 86400000000L + 4) % 7 >= 5)
      assert(n1 == we.length && n0 == wd.length, s"$t split sizes")
      def welchHalf(xs: Seq[Double]) = {
        val n = xs.length.toDouble
        val m = xs.sum / n
        val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
        (m, v / n)
      }
      val (m1, se1) = welchHalf(we.map(_._3))
      val (m0, se0) = welchHalf(wd.map(_._3))
      val expect = (m1 - m0) / math.sqrt(se1 + se0)
      assert(math.abs(tStat - expect) < 1e-3, s"$t: $tStat vs $expect")
    }
  }

  test("supplier_hhi: index laws — 1/n ≤ hhi ≤ 1 and top_share² ≤ hhi") {
    val rows = q("supplier_hhi").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (nat, n, hhi, top) =>
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-6,
        s"nation $nat: hhi $hhi outside [1/$n, 1]")
      assert(top * top <= hhi + 1e-6, s"nation $nat: top² > hhi")
      assert(top <= 1.0 + 1e-9 && top >= 1.0 / n - 1e-6)
    }
    // shares within a nation sum to 1 — recompute one nation end-to-end
    val (nat0, n0, hhi0, _) = rows.head
    val shares = Tables.table(spark, sfDir, "lineitem")
      .join(Tables.table(spark, sfDir, "supplier")
        .filter(col("s_nationkey") === nat0),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey")
      .agg(sum(col("l_extendedprice").cast(Canon.Dec)).as("r"))
      .collect().map(_.getDecimal(1))
    assert(shares.length == n0)
    val tot = shares.map(BigDecimal(_)).sum
    val jvmHhi = shares.map(s => {
      val sh = (BigDecimal(s) / tot).toDouble; sh * sh }).sum
    assert(math.abs(jvmHhi - hhi0) < 1e-4, s"nation $nat0: $jvmHhi vs $hhi0")
  }
}
