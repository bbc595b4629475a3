package graft

import org.apache.spark.sql.functions._

/** Round-8 wave 101: the count-min MERGE law — two shards' counters
  * sum to the global sketch (the property that makes it a distributed/
  * streaming structure), plus stream ≡ batch sanity.
  */
class Wave101Spec extends SparkSpec {

  test("count-min counters are addition-mergeable: shard sketches sum " +
    "to the corpus sketch") {
    val P = 2147483647L
    def sketch(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type").as("t"))
      .withColumn("h", graft.operators.TextDedup.hash56(col("t")) % P)
      .select(col("h"), explode(sequence(lit(0L), lit(3L))).as("j"))
      .withColumn("bucket",
        ((lit(2L) * col("j") + 3L) * col("h")
          + (lit(5L) * col("j") + 7L)) % P % 256)
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val ev = Tables.events(spark, sfDir)
    val whole = sketch(ev)
    val a = sketch(ev.filter(col("event_id") % 2 === 0))
    val b = sketch(ev.filter(col("event_id") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole, "shard counters must sum to the global sketch")
  }

  test("stream_countmin estimates are conservative and match the " +
    "batch recompute end to end") {
    val rows = q("stream_countmin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, exact, est, over) =>
      assert(est >= exact && over == est - exact, s"$t: $est vs $exact")
    }
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (t, e, _, _) => assert(exact(t) == e) }
  }
}
