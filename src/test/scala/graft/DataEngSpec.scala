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
}
