package graft

import org.apache.spark.sql.functions._

/** Round-3 Analytics group specs — funnel/retention/pivot/percentile/
  * range-frame semantics plus the SQL-entry subquery forms, and the
  * HammingDist expression + banded prefix dedup.
  */
class AnalyticsSpec extends SparkSpec {

  test("events_funnel: step counts are monotonically non-increasing") {
    val rows = q("events_funnel").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("step1_view", "step2_click", "step3_purchase"))
    assert(rows("step1_view") >= rows("step2_click"))
    assert(rows("step2_click") >= rows("step3_purchase"))
    // funnels are per-user: no step can exceed the user universe
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows("step1_view") <= users)
  }

  test("events_funnel milestones are strictly ordered per user") {
    // recompute the per-user milestones independently with a sequential
    // per-user fold and compare step-2 membership
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = e.groupBy(_._1)
    val expected2 = byUser.count { case (_, evs) =>
      val t1 = evs.filter(_._2 == "view").map(_._3).minOption
      t1.exists(t => evs.exists(x => x._2 == "click" && x._3 > t))
    }
    val got = q("events_funnel").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("step2_click") == expected2)
  }

  test("Funnel.conversion generalizes: N-step funnels match a sequential fold") {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = e.groupBy(_._1)
    def brute(steps: Seq[String]): Seq[Long] = {
      // per user: walk milestones sequentially, count users per prefix
      val milestones = byUser.values.map { evs =>
        steps.foldLeft(Seq.empty[Option[Long]]) { (acc, st) =>
          val after = acc.lastOption.getOrElse(Some(Long.MinValue))
          val m = after.flatMap(t =>
            evs.filter(x => x._2 == st && x._3 > t).map(_._3).minOption)
          acc :+ m
        }
      }
      steps.indices.map(i => milestones.count(_(i).isDefined).toLong)
    }
    for (steps <- Seq(Seq("signup", "purchase"),
        Seq("error", "view", "click", "purchase"))) {
      val got = operators.Funnel.conversion(
        Tables.events(spark, sfDir), "user_id", "event_type", "ts_us", steps)
        .collect().map(_.getLong(1)).toSeq
      assert(got == brute(steps), s"steps $steps")
    }
  }

  test("events_retention: week 0 contains every cohort member") {
    val df = q("events_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every user is active in their own cohort week ⇒ offset-0 row exists
    // per cohort and dominates later offsets of the same cohort
    val byCohort = df.groupBy(_._1)
    byCohort.foreach { case (_, rows) =>
      val w0 = rows.find(_._2 == 0L)
      assert(w0.isDefined, "cohort without week-0 row")
      rows.foreach(r => assert(r._3 <= w0.get._3))
    }
    // total cohort sizes = distinct user universe
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum == users)
  }

  test("agg_pivot: cells sum back to the unpivoted totals") {
    val df = q("agg_pivot")
    val nCols = (1 to 5).map(p => s"${p}_n")
    val total = df.select(nCols.map(c => sum(col(c))): _*).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).sum
    assert(total == Tables.table(spark, sfDir, "orders").count())
  }

  test("agg_percentile: quartiles ordered, median within min/max") {
    q("agg_percentile").collect().foreach { r =>
      val (p25, p75, p95) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p25 <= p75 && p75 <= p95)
    }
  }

  test("win_range_frame: frame counts match a brute-force recount") {
    val rows = q("win_range_frame")
      .select("user_id", "ts_us", "n_1h").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1).map { case (u, rs) =>
      u -> rs.map(_._2).sorted
    }
    rows.take(2000).foreach { case (u, t, n) =>
      val expected = byUser(u).count(x => x >= t - 3600000000L && x <= t)
      assert(n == expected, s"user $u ts $t")
    }
  }

  test("sql_exists plans as a semi join, not a per-row subquery") {
    val p = plan(q("sql_exists"))
    assert(p.contains("LeftSemi"), p.linesIterator.take(12).mkString("\n"))
  }

  test("sql_scalar_agg: every surviving price beats the threshold") {
    val avg = Tables.table(spark, sfDir, "orders")
      .agg(sum(col("o_totalprice").cast(Canon.Dec)).cast("double")
        / count(lit(1))).collect()(0).getDouble(0)
    val df = q("sql_scalar_agg")
    assert(df.filter(col("o_totalprice") <= 1.5 * avg).count() == 0)
    assert(df.count() > 0)
  }

  test("hamming_dist: expression matches a reference implementation") {
    def ref(a: String, b: String): Long = {
      val n = math.min(a.length, b.length)
      (0 until n).count(i => a(i) != b(i)).toLong + math.abs(a.length - b.length)
    }
    val cases = Seq(
      ("karolin", "kathrin"), ("", ""), ("abc", "abc"),
      ("abc", "abd"), ("abc", "abcdef"), ("xyz", ""))
    import spark.implicits._
    val df = cases.toDF("a", "b")
      .select(graft.functions.HammingDist.hamming(col("a"), col("b")).as("d"))
    val got = df.collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (a, b) => ref(a, b) })
    // the SQL registration path is covered in GraftExtensionsSpec
  }

  test("dedup_prefix_hamming: banding loses no pair vs brute force") {
    val d = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), rpad(substring(col("text"), 1, 48), 48, ".").as("p"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ia, pa) <- d; (ib, pb) <- d if ia < ib
      dist = (0 until 48).count(k => pa(k) != pb(k))
      if dist <= 2
    } yield (ia, ib, dist.toLong)).sortBy(x => (x._1, x._2)).toSeq
    val got = q("dedup_prefix_hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("dedup_prefix_hamming precondition: doc prefixes are pure ASCII") {
    // the query slices by CHARACTER (substring/rpad, 16-char segments)
    // but HammingDist compares UTF-8 BYTES; the two only agree when the
    // 48-char prefix is ASCII (1 byte per char). That holds on this
    // corpus — this guard makes a future non-ASCII fixture fail loudly
    // here instead of silently diverging from the DuckDB oracle.
    val nonAscii = Tables.table(spark, sfDir, "documents")
      .filter(not(substring(col("text"), 1, 48).rlike("^[\\x00-\\x7F]*$")))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii docs have non-ASCII chars in the 48-char prefix; " +
        "dedup_prefix_hamming's char-sliced segments no longer align with " +
        "byte-based HammingDist — switch the query to byte slicing")
  }

  test("agg_corr: moment-form correlation matches built-in corr()") {
    val got = q("agg_corr").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ref = Tables.table(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (k, v) =>
      assert(v >= -1.0 && v <= 1.0)
      assert(math.abs(v - ref(k)) < 1e-6, s"$k: $v vs builtin ${ref(k)}")
    }
  }

  test("events_anomaly: flags exactly the |z| > 2.5 rows of a recount") {
    val vals = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byUser = vals.groupBy(_._1)
    val expected = byUser.iterator.flatMap { case (_, rs) =>
      val xs = rs.map(_._3)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      rs.filter(r => sd > 0 && math.abs((r._3 - mean) / sd) > 2.5).map(_._2)
    }.toSet
    val got = q("events_anomaly").select("event_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("agg_mode: the mode really is the max count, ties break low") {
    val brute = Tables.table(spark, sfDir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val got = q("agg_mode").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    got.foreach { case (st, pri, n) =>
      val grp = brute.filter(_._1 == st)
      assert(n == grp.map(_._3).max, s"status $st")
      val winners = grp.filter(_._3 == n).map(_._2)
      assert(pri == winners.min, s"tie-break for $st")
    }
    assert(got.map(_._1).toSet ==
      brute.map(_._1).toSet, "one row per status")
  }

  test("win_first_last: values constant per user and match the extremes") {
    val rows = q("win_first_last").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4)))
    rows.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.map(_._3).distinct.length == 1, s"first_type varies for $u")
      assert(rs.map(_._4).distinct.length == 1, s"last_type varies for $u")
    }
  }

  test("source_sorted_pruned: the range filter pushes into the re-laid scan") {
    val p = plan(q("source_sorted_pruned"))
    assert(p.contains("PushedFilters") &&
      p.contains("l_shipdate"), "expected shipdate pushdown on the sorted copy")
  }

  test("sql_recursive == in-JVM BFS over the same transition DAG") {
    // plan shape: the recursion must be a genuine UnionLoop, and each
    // iteration's body an ordinary join (no cartesian)
    val p = plan(q("sql_recursive"))
    assert(p.contains("UnionLoop"), "WITH RECURSIVE must plan as UnionLoop")
    assert(!p.contains("CartesianProduct"))
    // semantics: min_hops per reachable pair == BFS shortest path
    val events = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts_us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val edges = events.groupBy(_._1).values.flatMap { arr =>
      arr.sortBy(e => (e._3, e._2)).map(_._4).toSeq.sliding(2).collect {
        case Seq(a, b) if a < b => (a, b)
      }
    }.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val bfs = scala.collection.mutable.Map.empty[(String, String), Long]
    for (src <- adj.keys) {
      var frontier = Set(src); var hops = 0L
      val seen = scala.collection.mutable.Set(src)
      while (frontier.nonEmpty) {
        hops += 1
        frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .filterNot(seen.contains)
        frontier.foreach { d => seen += d; bfs((src, d)) = hops }
      }
    }
    val got = q("sql_recursive").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == bfs.toMap)
    assert(got.nonEmpty)
  }

  test("events_dau_wau == brute-force trailing-7-day distinct") {
    val DayUs = 86400000000L
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts_us div $DayUs").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = pairs.groupBy(_._2)
    val got = q("events_dau_wau").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == byDay.keySet)
    got.foreach { case (day, dau, wau, stick) =>
      assert(dau == byDay(day).length.toLong)
      val expectWau = pairs.collect {
        case (u, d) if d <= day && d >= day - 6 => u
      }.distinct.length.toLong
      assert(wau == expectWau, s"day $day")
      assert(wau >= dau && stick > 0 && stick <= 1)
    }
  }

  test("events_concurrency == sequential sweep over collected sessions") {
    val GapUs = 30L * 60 * 1000 * 1000
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sessionize sequentially per user, then one global sweep
    val sessions = evs.groupBy(_._1).values.flatMap { arr =>
      val sorted = arr.sortBy(e => (e._3, e._2)).map(_._3)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = sorted.head; var prev = sorted.head
      sorted.tail.foreach { t =>
        if (t - prev >= GapUs) { out += ((start, prev + GapUs)); start = t }
        prev = t
      }
      out += ((start, prev + GapUs))
      out
    }
    val deltas = sessions.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }
      .toSeq.sortBy(d => (d._1, d._2))
    var c = 0L
    val peaks = scala.collection.mutable.Map.empty[Long, Long]
    deltas.foreach { case (ts, d) =>
      c += d
      val day = ts / 86400000000L
      if (c > peaks.getOrElse(day, Long.MinValue)) peaks(day) = c
    }
    assert(c == 0L, "every session must close")
    val got = q("events_concurrency").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == peaks.toMap)
    assert(got.values.max >= 1)
  }

  test("source_zorder: both dims push into the Z-ordered scan") {
    val p = plan(q("source_zorder"))
    assert(p.contains("PushedFilters") && p.contains("l_partkey")
      && p.contains("l_suppkey"),
      "expected part AND supplier pushdown on the Morton-clustered copy")
  }

  test("dedup_survivors: one survivor per cluster, longest wins, sizes conserve") {
    val surv = q("dedup_survivors").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(surv.map(_._1).distinct.length == surv.length, "one row per cluster")
    assert(surv.map(_._4).sum ==
      Tables.table(spark, sfDir, "documents").count(),
      "cluster sizes must partition the corpus")
    val clusters = q("dedup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2)
    val chars = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    surv.foreach { case (canon, sid, schars, size) =>
      val members = clusters(canon).map(_._1)
      assert(members.length.toLong == size, s"size mismatch for $canon")
      assert(schars == members.map(chars).max, s"survivor not longest in $canon")
      val best = members.filter(m => chars(m) == schars).min
      assert(sid == best, s"tie-break violated in $canon")
    }
  }

  test("curation_summary: per-lang rollup matches a recompute from clusters") {
    // recompute the summary from dedup_clusters (shared component
    // definition) + the raw documents, applying the same keep rule
    // (longest n_chars, tie -> smallest doc_id, per cluster)
    val clusters = q("dedup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val meta = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tok"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    val keep = clusters.groupBy(_._2).values.flatMap { members =>
      val winner = members.map(_._1)
        .minBy(id => (-meta(id)._2, id))
      members.map { case (id, _) => id -> (id == winner) }
    }.toMap
    val truth = meta.toSeq.groupBy { case (_, (lang, _, _)) => lang }
      .map { case (lang, docs) =>
        (lang, docs.size.toLong,
          docs.count { case (id, _) => keep(id) }.toLong,
          docs.collect { case (id, (_, _, tok)) if keep(id) => tok }.sum,
          docs.collect { case (id, (_, ch, _)) if !keep(id) => ch }.sum)
      }.toSeq.sortBy(_._1)
    val got = q("curation_summary").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == truth)
    assert(got.map(_._2).sum == meta.size, "n_docs must cover the corpus")
  }

  test("events_session_paths: top-20 equals a sequential recompute") {
    val gap = 30L * 60 * 1000 * 1000
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = evs.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[String]())
      var prev = Long.MinValue
      sorted.foreach { case (_, ts, _, typ) =>
        if (prev != Long.MinValue && ts - prev >= gap)
          sessions += scala.collection.mutable.ArrayBuffer[String]()
        sessions.last += typ
        prev = ts
      }
      sessions.map(_.mkString(">"))
    }
    val truth = paths.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20)
    val got = q("events_session_paths").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == truth)
  }

  test("sql_lateral decorrelates to a window group-limit, and matches win_topk") {
    val p = plan(q("sql_lateral"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "lateral subquery must decorrelate, not re-execute per outer row")
    assert(p.contains("WindowGroupLimit"),
      "expected the per-key top-N pruning operator")
    // semantic cross-check: top-2 orders per customer via plain windows
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expect = Tables.table(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(Tables.table(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(_.toSeq).toSeq
    val got = q("sql_lateral").collect().map(_.toSeq).toSeq
    assert(got == expect)
  }

  test("curation_filters: rule counts consistent, kept + any_rule partition") {
    val rows = q("curation_filters").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val total = Tables.table(spark, sfDir, "documents").count()
    assert(rows.keySet == Set("any_rule", "kept", "lang_other",
      "no_stopword", "repetitive", "too_short"))
    assert(rows("kept")._1 + rows("any_rule")._1 == total)
    Seq("lang_other", "no_stopword", "repetitive", "too_short").foreach { r =>
      assert(rows(r)._1 <= rows("any_rule")._1, s"$r exceeds any_rule")
    }
    // lang_other is exactly the zh count — independently recomputed
    val zh = Tables.table(spark, sfDir, "documents")
      .filter(col("lang") === "zh").count()
    assert(rows("lang_other")._1 == zh)
    rows.foreach { case (rule, (n, pct)) =>
      assert(math.abs(pct - n.toDouble / total) < 1e-6, s"pct off for $rule")
    }
  }

  test("corpus_mixture: weights normalize and order with token mass") {
    val rows = q("corpus_mixture").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20, "one row per source")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "weights sum to 1")
    // temperature scaling preserves token-mass order but compresses it:
    // weight ratio between any two sources is milder than the raw ratio
    val sorted = rows.sortBy(_._3)
    sorted.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._4, s"weight order breaks: $lo vs $hi")
      if (lo._3 < hi._3)
        assert(hi._4 / lo._4 <= hi._3.toDouble / lo._3 + 1e-9,
          "pow(0.7) must compress the ratio")
      case _ => ()
    }
  }

  test("dedup_prefix_hamming candidates come from the segment equi-join") {
    val p = plan(q("dedup_prefix_hamming"))
    // the join keys must include the banded segment columns — an
    // all-pairs (doc_id-only / nested-loop) degradation would show a
    // BroadcastNestedLoopJoin or a cartesian here
    assert(!p.contains("CartesianProduct"), "cartesian candidate join")
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop candidates")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), "expected an equi-join on segments")
  }

  test("basket_pairs == brute-force per-order pair counts, top-20") {
    val baskets = Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupMap(_._1)(_._2)
    val pc = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.valuesIterator.foreach { parts =>
      val ps = parts.toArray
      for (i <- ps.indices; j <- ps.indices
           if ps(i) < ps(j))
        pc.update((ps(i), ps(j)), pc.getOrElse((ps(i), ps(j)), 0L) + 1)
    }
    val truth = pc.toSeq.map { case ((a, b), n) => (a, b, n) }
      .sortBy { case (a, b, n) => (-n, a, b) }.take(20)
      .zipWithIndex.map { case ((a, b, n), i) => (i + 1L, a, b, n) }
    val got = q("basket_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == truth)
  }

  test("events_changepoint == brute-force scaled-CUSUM argmax per user") {
    import org.apache.spark.sql.functions.col
    val got = q("events_changepoint").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getAs[Double]("peak_cusum"))).toMap
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.size == events.map(_._1).distinct.length, "one row per user")
    events.groupBy(_._1).foreach { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val cents = sorted.map(r => math.floor(r._4 * 100 + 0.5).toLong)
      val n = cents.length.toLong
      val s = cents.sum
      var run = 0L
      val scaled = cents.zipWithIndex.map { case (c, i) =>
        run += c; n * run - (i + 1) * s
      }
      val best = scaled.zipWithIndex
        .maxBy { case (v, i) =>
          (math.abs(v), -sorted(i)._2, -sorted(i)._3) }._2
      val (ts, ev, peak) = got(u)
      assert((ts, ev) == (sorted(best)._2, sorted(best)._3), s"user $u")
      assert(math.abs(peak - scaled(best).toDouble / (n * 100.0)) < 1e-3,
        s"user $u peak value")
    }
  }

  test("basket_rules: scores re-derive from independent set-count truth") {
    val baskets = Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val itemN = baskets.groupBy(_._2).map { case (p, xs) => (p, xs.length) }
    val pairN = baskets.groupBy(_._1).values.flatMap { b =>
      val ps = b.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => (k, v.size) }
    val nOrders = baskets.map(_._1).distinct.length
    val r6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    val rows = q("basket_rules").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.sameElements(lifts.sortBy(-(_: Double))), "lift desc")
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      val nab = pairN((a, b))
      assert(r.getAs[Long]("n_ab") == nab && nab >= 2)
      assert(r.getAs[Long]("n_a") == itemN(a).toLong)
      assert(r.getAs[Double]("conf_a_b") == r6(nab.toDouble / itemN(a)))
      assert(r.getAs[Double]("lift") ==
        r6(nab.toDouble * nOrders / (itemN(a).toDouble * itemN(b))))
    }
  }
}
