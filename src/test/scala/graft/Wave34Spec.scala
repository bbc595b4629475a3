package graft

/** Round-6 wave 34: features_rolling_stats vs a naive trailing-10 scan. */
class Wave34Spec extends SparkSpec {

  test("features_rolling_stats matches naive trailing-window statistics") {
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2, e._3)).map(_._4)).toMap
    val rows = q("features_rolling_stats").collect()
    val byUser = rows.groupBy(_.getLong(0))
    for ((u, vals) <- ev) {
      val rs = byUser(u) // already ordered by (ts_us, event_id)
      assert(rs.length == vals.length)
      for (i <- vals.indices) {
        val frame = vals.slice(math.max(0, i - 9), i + 1)
        val r = rs(i)
        assert(r.getLong(3) == frame.length, s"user $u row $i n_win")
        val mean = frame.sum / frame.length
        assert(math.abs(r.getDouble(4) - mean) < 1e-5, s"user $u row $i mean")
        if (frame.length > 1) {
          val m = mean
          val sd = math.sqrt(frame.map(x => (x - m) * (x - m)).sum
            / (frame.length - 1))
          assert(math.abs(r.getDouble(5) - sd) < 1e-4, s"user $u row $i std")
        } else assert(r.isNullAt(5))
        assert(r.getDouble(6) == frame.min && r.getDouble(7) == frame.max)
      }
    }
  }
}
