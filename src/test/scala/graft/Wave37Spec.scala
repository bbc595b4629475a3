package graft

/** Round-6 wave 37: text_oov_rate vs a naive vocabulary fold. */
class Wave37Spec extends SparkSpec {

  test("text_oov_rate matches the naive top-16 vocabulary coverage") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val freq = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length).toMap
    val vocab = freq.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(16).map(_._1).toSet
    val rows = q("text_oov_rate").collect()
    assert(rows.length == docs.length)
    val byId = docs.toMap
    var sawOov = false
    for (r <- rows) {
      val toks = byId(r.getLong(0))
      val oov = toks.count(!vocab(_))
      assert(r.getLong(1) == toks.length)
      assert(r.getLong(2) == oov, s"doc ${r.getLong(0)} oov")
      if (oov > 0) sawOov = true
      assert(math.abs(r.getDouble(3) - oov.toDouble / toks.length) < 1e-6)
    }
    assert(sawOov, "the 16-token cut must leave real OOV mass")
  }

  test("events_state_dwell conserves each user's total span") {
    // sum of all dwell intervals across states = sum over users of
    // (last ts - first ts): intervals tile each user's span exactly
    val spans = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("ts_us").minus(
        org.apache.spark.sql.functions.min("ts_us")).as("span"))
      .collect().map(_.getLong(1)).sum
    val rows = q("events_state_dwell").collect()
    assert(rows.map(_.getLong(2)).sum == spans)
    // intervals = events - users (every event but each user's last)
    val nEvents = Tables.events(spark, sfDir).count()
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nEvents - nUsers)
  }
}
