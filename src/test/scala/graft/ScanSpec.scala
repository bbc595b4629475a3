package graft

/** Group A/B specs — scan path behavior that matters at 100 TB:
  * predicate pushdown reaching the parquet reader and column pruning
  * visible in ReadSchema (SURVEY.md §2.A).
  */
class ScanSpec extends SparkSpec {

  test("scan_full returns all lineitem rows and columns") {
    val df = q("scan_full")
    assert(df.columns.length == 11)
    assert(df.count() == 6000)
  }

  test("filter_string_search pushes string predicates to the scan") {
    val p = plan(q("filter_string_search"))
    val pushed = p.split("\n").find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("StringContains"), pushed)
    assert(pushed.contains("StringStartsWith"), pushed)
    // the negated suffix stays a post-scan filter; the other two prune
  }

  test("scan_pruned pushes filter down and prunes columns") {
    val df = q("scan_pruned")
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("l_quantity"),
      "filter must reach the parquet scan")
    assert(p.contains("ReadSchema"))
    // pruned scan must not read unreferenced money columns
    assert(!p.split("ReadSchema")(1).split("\n")(0).contains("l_tax"),
      "ReadSchema must exclude unused columns")
    assert(df.columns.toSeq == Seq("l_orderkey", "l_extendedprice"))
  }

  test("scan_events_typed canonicalizes ns → µs") {
    val df = q("scan_events_typed")
    val first = df.head()
    assert(first.getLong(0) == 0L)
    assert(df.schema("ts_us").dataType.typeName == "long")
    assert(df.count() == 1000)
  }

  test("source_partitioned prunes partitions at the driver") {
    val df = q("source_partitioned")
    val p = plan(df)
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      "lang filter must resolve against partition directories")
    // one lang out of five → scan must declare a single-partition read
    assert(!p.contains("lang = en) OR") && df.count() > 0)
    val line = p.split("\n").find(_.contains("PartitionFilters")).get
    assert(line.contains("en"), s"expected lang=en partition filter, got: $line")
  }

  test("events_bbox pushes both range edges to the scan, rows inside box") {
    val df = q("events_bbox")
    val p = plan(df)
    val pushed = p.split("\n").find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("ts") && pushed.contains("value"),
      s"both box edges must reach the parquet reader, got: $pushed")
    import org.apache.spark.sql.functions.col
    assert(df.filter(col("value") < 20.0 || col("value") >= 60.0).count() == 0)
    val rows = df.select("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.sameElements(rows.sorted), "output must be (user_id, ts) ordered")
  }

  test("filter_complex and project_case run and stay ordered") {
    assert(q("filter_complex").count() > 0)
    val pc = q("project_case")
    assert(pc.columns.contains("revenue") && pc.columns.contains("qty_bucket"))
    assert(pc.count() == 6000)
  }

  test("dynamic partition pruning engages on the partitioned layout") {
    // the cluster-scale complement of source_partitioned's STATIC
    // pruning: when the partition filter only materializes through a
    // join (dim filtered at runtime), Spark injects a dynamicpruning
    // subquery into the fact scan so only matching partitions are read.
    // useStats=false + high fallback ratio make the tiny fixture pass
    // the planner's benefit estimate — at real scale the defaults fire.
    import org.apache.spark.sql.functions._
    val out = s"/tmp/graft_dpp/p${ProcessHandle.current().pid()}"
    Tables.table(spark, sfDir, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val prevStats =
      spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      // the dim must be a FILTERED non-local plan (a filtered literal
      // relation constant-folds before the PartitionPruning rule sees
      // it), so lay a tiny parquet dim and filter it
      val dimPath = s"${out}_dim"
      spark.createDataFrame(Seq(("en", 1L), ("de", 2L), ("fr", 3L)))
        .toDF("lang", "tag").write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath).filter(col("tag") === 1L)
      val fact = spark.read.parquet(out)
      val joined = fact.join(dim, Seq("lang")).groupBy("source")
        .agg(count(lit(1)).as("n"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("dynamicpruning"),
        s"expected a dynamicpruning subquery in the fact scan:\n$physical")
      assert(joined.agg(sum("n")).head().getLong(0) ==
        Tables.table(spark, sfDir, "documents")
          .filter(col("lang") === "en").count())
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", prevStats)
  }

  test("knn_search_ivf probes the persisted ANN index partition-pruned") {
    // r4 VERDICT item 3: the IVF index is a bucket-partitioned layout
    // written once (Knn.persistedIndex); a probe's scan must carry a
    // dynamicpruning subquery on `bucket` so only the probed buckets
    // (probes·bits + 1 of 2^bits dirs) are read — never the full index.
    // useStats=false lets the tiny fixture pass the planner's benefit
    // estimate, same as the DPP test above; at real scale defaults fire.
    val prevStats =
      spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val physical = q("knn_search_ivf").queryExecution.executedPlan.toString
      assert(physical.contains("PartitionFilters: [isnotnull(bucket"),
        s"bucket must be a partition column of the index scan:\n$physical")
      assert(physical.contains("dynamicpruning"),
        s"probe join must dynamically prune bucket partitions:\n$physical")
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", prevStats)
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // the row-level complement of dynamic partition pruning: when a
    // selective dim filter can't prune partitions, Spark can still build
    // a bloom filter over the dim's join keys at runtime and push
    // might_contain into the fact scan — at 100 TB this turns a full
    // probe-side shuffle into a pre-filtered one. Fixture scans are
    // far below the 10 GB application-side threshold, so lower it (and
    // force the shuffle join the rule targets); at real scale the
    // defaults fire on their own.
    import org.apache.spark.sql.functions._
    val prevScan = spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sel = Tables.table(spark, sfDir, "orders")
        .filter(col("o_totalprice") > 450000)
      val joined = Tables.table(spark, sfDir, "lineitem")
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("might_contain"),
        s"expected a runtime bloom filter on the lineitem scan:\n$physical")
      // the filter is pruning-only — results match the unfiltered plan
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        prevScan)
      val expected = Tables.table(spark, sfDir, "lineitem")
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        expected.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    } finally {
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        prevScan)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
    }
  }

  test("source_orc: the ORC roundtrip agg equals the parquet-side agg") {
    import org.apache.spark.sql.functions._
    val viaOrc = q("source_orc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val direct = Tables.table(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 100000.0)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        Canon.moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(viaOrc.toSeq == direct.toSeq)
    assert(viaOrc.nonEmpty)
  }

  test("source_csv / source_json: text roundtrips are value-lossless") {
    // every value — BIGINT keys, shortest-repr DOUBLE money, ISO
    // timestamps, free strings — must survive serialization bit-exactly;
    // compares the full row set against the parquet original
    val direct = Tables.table(spark, sfDir, "orders")
      .orderBy("o_orderkey").collect().map(_.toSeq)
    Seq("source_csv", "source_json").foreach { k =>
      val back = q(k).collect().map(_.toSeq)
      assert(back.length == direct.length, k)
      back.zip(direct).zipWithIndex.foreach { case ((b, d), i) =>
        assert(b == d, s"$k row $i: $b != $d")
      }
    }
  }

  test("scan_agg_pushdown: aggregates answered from parquet footers") {
    import org.apache.spark.sql.functions._
    val df = q("scan_agg_pushdown")
    val p = plan(df)
    assert(p.contains("PushedAggregation: [COUNT(*)"),
      "COUNT/MIN/MAX must reach the scan, not run as HashAggregate:\n" + p)
    assert(p.contains("MIN(l_orderkey)") && p.contains("MAX(l_partkey)"),
      "all five aggregates pushed:\n" + p)
    // and the pushed plan agrees with the plain (v1, unpushed) aggregate
    val r = df.head()
    val e = Tables.table(spark, sfDir, "lineitem")
      .agg(count(lit(1)), min("l_orderkey"), max("l_orderkey"),
        min("l_partkey"), max("l_partkey")).head()
    assert(r.toSeq == e.toSeq, s"pushed $r vs plain $e")
  }

  test("scan_agg_pushdown_grouped: per-partition aggregates pushed with GROUP BY lang") {
    import org.apache.spark.sql.functions._
    val df = q("scan_agg_pushdown_grouped")
    val p = plan(df)
    assert(p.contains("PushedAggregation: [COUNT(*)"),
      "grouped COUNT/MIN/MAX must reach the scan:\n" + p)
    assert(p.contains("PushedGroupBy: [lang]"),
      "the partition column must be the pushed grouping key:\n" + p)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val expect = Tables.table(spark, sfDir, "documents")
      .groupBy("lang").agg(count(lit(1)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect)
  }
}
