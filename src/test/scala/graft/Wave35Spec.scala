package graft

import org.apache.spark.sql.functions._

/** Round-6 wave 35: source_text roundtrip fidelity and events_top_movers
  * vs naive recomputation.
  */
class Wave35Spec extends SparkSpec {

  test("source_text roundtrips every document byte-exactly") {
    val orig = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = q("source_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == orig)
  }

  test("events_top_movers is the global top-10 by absolute day-over-day delta") {
    val daily = Tables.events(spark, sfDir)
      .select(expr("ts_us div 86400000000").as("day"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day", "event_type").agg(sum("c").as("tot"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byType = daily.groupBy(_._2).view.mapValues(_.sortBy(_._1)).toMap
    val deltas = byType.toSeq.flatMap { case (ty, days) =>
      days.sliding(2).collect { case Array((_, _, p), (d, _, t)) =>
        (d, ty, t, p, t - p)
      }
    }
    val expected = deltas
      .sortBy { case (d, ty, _, _, dl) => (-math.abs(dl), d, ty) }.take(10)
    val got = q("events_top_movers").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }
}
