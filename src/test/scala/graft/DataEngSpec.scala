package graft

import org.apache.spark.sql.functions._

/** Round-4 DataEng group specs: CDC compaction, SCD-2 intervals,
  * transitions, gap fill, sequence packing.
  */
class DataEngSpec extends SparkSpec {

  test("cdc_latest: one row per key, and it really is the newest") {
    val rows = q("cdc_latest").collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
    assert(rows.map(_._1).distinct.length == rows.length, "key uniqueness")
    val maxTs = Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type").agg(max("ts_us").as("m"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    rows.foreach { case (k, ts) => assert(ts == maxTs(k), s"stale row for $k") }
    assert(rows.nonEmpty)
  }

  test("scd2_intervals: versions chain — valid_to = next valid_from") {
    val rows = q("scd2_intervals").collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq,
        s"version gap for $k")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 == b._2, s"interval break for $k at version ${a._4}")
        case _ => ()
      }
      assert(sorted.last._3 == -1L, s"open interval missing for $k")
    }
  }

  test("events_transitions: counts sum to rows-with-successor") {
    val total = q("events_transitions").agg(sum("n")).collect()(0).getLong(0)
    val events = Tables.events(spark, sfDir).count()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    // each user contributes (n_events_of_user − 1) transitions
    assert(total == events - users)
  }

  test("events_gap_fill: dense hour axis, zero-filled, sums preserved") {
    val rows = q("events_gap_fill").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hs = rows.map(_._1)
    assert(hs.toSeq == (hs.min to hs.max).toSeq, "hour axis has holes")
    assert(rows.map(_._2).sum == Tables.events(spark, sfDir).count())
    assert(rows.exists(_._2 == 0L), "expected at least one gap hour")
  }

  test("cdc_latest absorption: recompacting log+compaction changes nothing") {
    import org.apache.spark.sql.expressions.Window
    val compacted = q("cdc_latest")
    val log = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts_us"),
        col("event_id"), col("value"))
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val again = log.unionByName(compacted)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("user_id", "event_type")
    val a = again.collect().map(_.toSeq).toSeq
    val b = compacted.collect().map(_.toSeq).toSeq
    assert(a == b, "compaction must be absorbing (MERGE-safe to re-apply)")
  }

  test("merge_apply: balance deltas conserve the credit total, actions partition") {
    val rows = q("merge_apply").collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == Tables.table(spark, sfDir, "customer").count())
    assert(rows.forall(r => r._1 == "K" || r._1 == "U"),
      "referentially-total fixture: no inserts expected")
    val delta = BigDecimal(rows.map(r => BigDecimal(r._3) - BigDecimal(r._2)).sum
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val credits = q("merge_apply").filter(col("action") === "U").count()
    assert(credits > 0, "some customers must receive credit")
    val expected = Tables.table(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .groupBy(col("o_custkey"))
      .agg(Canon.moneySum(col("o_totalprice") * 0.001).as("c"))
      .agg(sum("c")).collect()(0).getDouble(0)
    assert((delta - BigDecimal(expected)).abs < 0.01,
      s"delta $delta vs credit total $expected")
  }

  test("pack_chunks: offsets are exact prefix sums and packs cover the stream") {
    val rows = q("pack_chunks").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_._1)
      var off = 0L
      sorted.foreach { case (id, _, nTok, o, first, nPacks) =>
        assert(o == off, s"offset drift at doc $id ($lang)")
        assert(first == o / 2048, s"pack_first wrong at doc $id")
        val last = (o + math.max(nTok, 1) - 1) / 2048
        assert(nPacks == last - first + 1, s"span wrong at doc $id")
        off += nTok
      }
    }
    assert(rows.nonEmpty)
  }

  test("scd2_merge == scd2_intervals rebuild, and the merge really merges") {
    def rows(name: String) = q(name).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows("scd2_merge").toSeq == rows("scd2_intervals").toSeq)
    // both sides of the T-split are populated, and at least one open
    // head was closed by the batch (else the merge path went untested)
    val T = 1705708800000000L
    val ev = Tables.events(spark, sfDir)
    assert(ev.filter(col("ts_us") < T).count() > 0, "history non-empty")
    assert(ev.filter(col("ts_us") >= T).count() > 0, "batch non-empty")
    val touched = ev.filter(col("ts_us") >= T)
      .join(ev.filter(col("ts_us") < T)
        .select("user_id", "event_type").distinct(),
        Seq("user_id", "event_type"))
    assert(touched.count() > 0, "batch touches existing keys")
  }

  test("agg_incremental: merged partials are bit-identical to a full recompute") {
    val full = Tables.table(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        Canon.moneySum(col("o_totalprice")).as("total_price"),
        Canon.round4(sum(col("o_totalprice").cast(Canon.Dec)).cast("double")
          / count(lit(1))).as("avg_price"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val got = q("agg_incremental").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == full.toSeq)
    // both sides of the split must be non-empty for the test to mean
    // anything (otherwise "incremental" degenerates to the full agg)
    val split = lit("1997-01-01").cast("timestamp")
    val orders = Tables.table(spark, sfDir, "orders")
    assert(orders.filter(col("o_orderdate") < split).count() > 0)
    assert(orders.filter(col("o_orderdate") >= split).count() > 0)
  }
}
