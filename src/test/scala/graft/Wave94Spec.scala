package graft

import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** Round-8 wave 94: content-defined chunking and peak detection — the
  * CDC shift-stability claim (the whole reason CDC exists) and a brute
  * JVM recompute of the peak scan.
  */
class Wave94Spec extends SparkSpec {

  test("CDC chunk boundaries are shift-stable: an insertion at the " +
    "front leaves every downstream chunk identical") {
    import spark.implicits._
    // deterministic ~400-token doc; the twin prepends 5 tokens
    val base = (0 until 400).map(i => s"w${(i * 37 + 11) % 97}x$i")
    val edited = Seq("ins0", "ins1", "ins2", "ins3", "ins4") ++ base
    val docs = Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextDedup.cdcChunks(docs)
      .groupBy("doc_id").agg(collect_list("chunk").as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val a = chunks(1L)
    val b = chunks(2L)
    // chunks re-concatenate to the exact documents (losslessness)
    assert(a.mkString(" ") == base.mkString(" "))
    assert(b.mkString(" ") == edited.mkString(" "))
    // shift-stability: all of A's chunks from its second boundary on
    // reappear verbatim in B — the insertion can only perturb the
    // chunk(s) overlapping it, never downstream ones
    val shared = a.toSet.intersect(b.toSet)
    assert(a.length >= 4, s"doc too short for the claim: ${a.length} chunks")
    assert(shared.size >= a.length - 2,
      s"only ${shared.size} of ${a.length} chunks survived a 5-token " +
        "front insertion — boundaries are not content-defined")
    // a FIXED-size chunker (every 64 tokens) shares nothing after a
    // 5-token shift — the contrast that motivates CDC
    val fixedA = base.grouped(64).map(_.mkString(" ")).toSet
    val fixedB = edited.grouped(64).map(_.mkString(" ")).toSet
    assert(fixedA.intersect(fixedB).size <= 1,
      "fixed-size chunking unexpectedly survived the shift")
  }

  test("events_peaks matches a brute JVM scan and every peak clears " +
    "the prominence floor") {
    val got = q("events_peaks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val byUser = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
      .groupBy(_._1)
    val brute = byUser.flatMap { case (u, rows) =>
      val s = rows.sortBy(r => (r._2, r._3))
      (2 until s.length - 2).flatMap { i =>
        val c = s(i)._4
        val sh = Seq(s(i - 2)._4, s(i - 1)._4, s(i + 1)._4, s(i + 2)._4).max
        if (c > sh && c - sh >= 500)
          Some((u, s(i)._2, s(i)._3, c / 100.0, (c - sh) / 100.0))
        else None
      }
    }.toSet
    assert(got.toSet == brute, s"${got.length} peaks vs ${brute.size} brute")
    assert(got.forall(_._5 >= 5.0))
  }
}
