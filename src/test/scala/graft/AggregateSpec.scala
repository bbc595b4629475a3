package graft

/** Group D specs (SURVEY.md §2.D). */
class AggregateSpec extends SparkSpec {

  test("agg_pricing_summary has exactly 6 groups (all flag combos)") {
    val rows = q("agg_pricing_summary").collect()
    assert(rows.length == 6)
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(flags == Set(("A","F"),("N","F"),("N","O"),("R","F"),("A","O"),("R","O")))
    // counts must sum to the filtered row count (shipdate <= 2001-09-01)
    assert(rows.map(_.getAs[Long]("count_order")).sum == 5854)
  }

  test("agg_skewness: moment form tracks built-in skewness/kurtosis") {
    import org.apache.spark.sql.functions._
    val got = q("agg_skewness").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ref = Tables.table(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(skewness(col("l_quantity")).as("s"),
        kurtosis(col("l_quantity")).as("k"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    got.foreach { case (flag, (s, k)) =>
      assert(math.abs(s - ref(flag)._1) < 1e-3, s"skewness $flag")
      assert(math.abs(k - ref(flag)._2) < 1e-3, s"kurtosis $flag")
    }
    assert(got.size == 3)
  }

  test("agg_histogram: bins partition the table, sums conserved") {
    val rows = q("agg_histogram").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.map(_._2).sum ==
      Tables.table(spark, sfDir, "orders").count())
  }

  test("agg_hll_merge: union of partition sketches is lossless and accurate") {
    val r = q("agg_hll_merge").head()
    val (merged, direct, exact) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(merged == direct,
      "unioning per-nation sketches must equal sketching the whole table")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"HLL estimate $merged vs exact $exact outside 5%")
  }

  test("agg_rollup plan broadcasts both dim joins") {
    val p = plan(q("agg_rollup"))
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast, not shuffle")
    assert(!p.contains("SortMergeJoin"))
  }

  test("rollup/cube/grouping_sets row counts") {
    assert(q("agg_rollup").count() == 31)     // 25 nations + 5 regions + 1
    assert(q("agg_cube").count() == 12)       // 6 + 3 + 2 + 1
    assert(q("agg_grouping_sets").count() == 31) // 5 segments + 25 nations + 1
  }

  test("approx sketches within error bounds of exact values") {
    val ad = q("agg_approx_distinct").head()
    val (approx, exact) = (ad.getLong(0), ad.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"HLL++ rsd default 5%: approx=$approx exact=$exact")
    val aq = q("agg_approx_quantile").head()
    assert(aq.getDouble(0) > 0 && aq.getDouble(1) > aq.getDouble(0))
  }

  test("profile_columns_approx within HLL error of the exact profile, no Expand") {
    val exact = q("profile_columns").collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = q("profile_columns_approx")
    // the whole point of the sibling: the 11-way multi-distinct Expand
    // is gone — one partial+final aggregation over HLL sketches
    assert(!plan(approx).contains("Expand"),
      "approx profile must not multiply rows through Expand")
    approx.collect().foreach { r =>
      val (name, nd) = (r.getString(0), r.getLong(3))
      val e = exact(name)
      assert(r.getLong(1) == e.getLong(1) && r.getLong(2) == e.getLong(2),
        s"$name: row/non-null counts are exact aggregates, must match")
      val ed = e.getLong(3)
      assert(math.abs(nd - ed).toDouble / math.max(ed, 1) < 0.1,
        s"$name: approx_distinct=$nd vs exact=$ed beyond rsd=2% ×5 margin")
    }
  }

  test("agg_distinct counts are consistent") {
    val rows = q("agg_distinct").collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 6000)
    rows.foreach(r => assert(r.getAs[Long]("n_supp") <= 10)) // 10 suppliers at sf0.001
  }

  test("profile_columns: grouped scans each pruned to their own " +
    "columns, sane per-column stats") {
    val df = q("profile_columns")
    val p = plan(df)
    // the r9 form (r8 VERDICT item 5, measured 3.5 s → 0.8-1.0 s warm
    // at sf0.1): 6 groups of 2 distinct-aggregates, each its own small
    // Expand. The scans stay ~free at any scale because每 each group's
    // scan is column-pruned to its own two columns — total bytes ≈
    // one full pass; assert exactly that.
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).length == 6,
      "profile must read once per 2-column group")
    assert(p.contains("Expand"), "multi-distinct rewrite must engage")
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(schemas.size == 6 &&
      schemas.forall(_.split(',').length <= 2),
      s"a group scan reads more than its own 2 columns: $schemas")
    val rows = df.collect()
    assert(rows.length == 11)
    val total = Tables.table(spark, sfDir, "lineitem").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == total)
      assert(r.getAs[Long]("n_nonnull") == total, "fixtures are dense")
      assert(r.getAs[Long]("n_distinct") <= total)
    }
    val nd = rows.map(r =>
      r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    assert(nd("l_returnflag") == 3 && nd("l_linestatus") == 2)
  }

  test("agg_boolean: conditional counts and boolean folds match a recompute") {
    val got = q("agg_boolean").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4))).toMap
    val orders = Tables.table(spark, sfDir, "orders")
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    orders.groupBy(_._1).foreach { case (st, rows) =>
      val (n, nBig, allPos, anyHuge) = got(st)
      assert(n == rows.length.toLong)
      assert(nBig == rows.count(_._2 > 300000).toLong)
      assert(allPos == rows.forall(_._2 > 0))
      assert(anyHuge == rows.exists(_._2 > 499500))
    }
    assert(got.size == orders.map(_._1).distinct.length)
  }

  test("misra-gries: underestimate, n/(m+1) error bound, heavy-hitter coverage") {
    import org.apache.spark.sql.functions._
    val m = 64
    val docs = Tables.table(spark, sfDir, "documents")
    val sketch = operators.Sketches.misraGriesTokens(docs, "text", m)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val bound = n.toDouble / (m + 1)
    // law 1+2: every estimate is a lower bound within n/(m+1) of truth
    sketch.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t: est $est > exact ${exact(t)}")
      assert(exact(t) - est <= bound,
        s"$t: error ${exact(t) - est} exceeds n/(m+1) = $bound")
    }
    // law 3: the sketch is a superset of the true heavy hitters
    val heavy = exact.filter(_._2 > bound).keySet
    assert(heavy.nonEmpty, "fixture must contain at least one heavy hitter")
    assert(heavy.subsetOf(sketch.keySet),
      s"missing heavy hitters: ${heavy -- sketch.keySet}")
    // and the declared query returns the sketch's top-20 deterministically
    val top = q("agg_topk_approx").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = sketch.toSeq.sortBy { case (t, e) => (-e, t) }.take(20)
    assert(top.toSeq == want.toSeq)
  }

  test("set_intersect_all / set_except_all follow multiset algebra") {
    import org.apache.spark.sql.functions.col
    def half(lo: String, hi: String) =
      Tables.table(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") >= org.apache.spark.sql.functions
          .lit(lo).cast("timestamp_ntz")
          && col("l_shipdate") < org.apache.spark.sql.functions
          .lit(hi).cast("timestamp_ntz"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("int").as("qty"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    def counts(xs: Array[(String, String, Int)]) =
      xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val a = counts(half("1995-01-01", "1998-01-01"))
    val b = counts(half("1997-01-01", "2002-01-01"))
    val inter = (a.keySet & b.keySet).toSeq
      .map(k => math.min(a(k), b(k))).sum
    assert(q("set_intersect_all").count() == inter,
      "INTERSECT ALL keeps min(count_a, count_b) copies")
    val diff = b.map { case (k, cb) => math.max(cb - a.getOrElse(k, 0L), 0L) }
      .sum
    assert(q("set_except_all").count() == diff,
      "EXCEPT ALL keeps max(count_late - count_early, 0) copies")
    assert(inter > 0 && diff > 0, "both results non-degenerate")
  }

  test("agg_minmax_by: arg-max verified brute-force, key precondition holds") {
    import org.apache.spark.sql.functions.col
    val maxKey = Tables.table(spark, sfDir, "lineitem")
      .agg(org.apache.spark.sql.functions.max("l_orderkey"))
      .collect().head.getLong(0)
    assert(maxKey < 10000000L,
      "cents*10^7 + orderkey uniqueness requires orderkey < 10^7")
    val rows = q("agg_minmax_by").collect()
    assert(rows.length == 6, "all six (returnflag, linestatus) combos")
    val li = Tables.table(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_orderkey", "l_extendedprice")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    rows.foreach { r =>
      val g = li.filter(x => x._1 == r.getString(0) && x._2 == r.getString(1))
      val top = g.maxBy(x => (x._4, x._3))
      assert(r.getAs[Long]("top_order") == top._3)
      assert(r.getAs[Double]("max_price") == top._4)
      val bot = g.minBy(x => (x._4, x._3))
      assert(r.getAs[Long]("bottom_order") == bot._3)
    }
  }

  test("agg_kmv_distinct: estimate re-derives from the k-th hash; " +
      "error inside the KMV bound") {
    val k = 64
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def h56(s: String): Long = {
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (0 until 7).foldLeft(0L)((v, i) => (v << 8) | (d(i) & 0xffL))
    }
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = q("agg_kmv_distinct").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val hs = ev.filter(_._1 == t).map(p => h56(s"kmv|${p._2}"))
        .distinct.sorted
      val exact = ev.count(_._1 == t).toLong
      assert(r.getAs[Long]("n_exact") == exact)
      val est =
        if (hs.length < k) exact.toDouble
        else (k - 1).toDouble * 7.2057594037927936e16 / hs(k - 1).toDouble
      assert(math.abs(r.getAs[Double]("kmv_est")
        - math.floor(est * 100 + 0.5) / 100) < 1e-9)
      // KMV std error ≈ 1/sqrt(k-2) ≈ 12.7%; 4σ bound with headroom
      assert(r.getAs[Double]("rel_err") < 0.5,
        s"$t rel_err ${r.getAs[Double]("rel_err")}")
    }
  }
}
