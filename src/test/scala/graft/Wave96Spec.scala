package graft

import org.apache.spark.sql.functions._

/** Round-8 wave 96: duplication-aware soft dedup and the
  * two-proportion z — mass conservation and a brute JVM recompute.
  */
class Wave96Spec extends SparkSpec {

  test("curation_soft_dedup conserves training mass: every cluster " +
    "contributes ~1 document's worth, singletons keep weight 1.0") {
    val rows = q("curation_soft_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // weight is exactly round6(1/size)
    rows.foreach { case (_, _, s, w) =>
      assert(math.abs(w - math.floor(1.0 / s * 1e6 + 0.5) / 1e6) == 0.0)
    }
    assert(rows.filter(_._3 == 1).forall(_._4 == 1.0))
    assert(rows.exists(_._3 > 1), "fixture must contain near-dup clusters")
    // per-cluster mass: Σ weight = size·round6(1/size) ∈ [1 − s·5e-7, 1 + s·5e-7]
    rows.groupBy(_._2).foreach { case (c, g) =>
      val mass = g.map(_._4).sum
      val s = g.head._3
      assert(g.forall(_._3 == s), s"cluster $c sizes disagree")
      assert(math.abs(mass - 1.0) <= s * 5e-7 + 1e-12,
        s"cluster $c (size $s) mass $mass")
    }
    // agreement with the hard-dedup clusters
    val hard = q("dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (d, c, _, _) => assert(hard(d) == c) }
  }

  test("stat_ztest_prop matches a brute JVM two-proportion z on the " +
    "same calendar split") {
    val r = q("stat_ztest_prop").head()
    val (n1, x1, n0, x0) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val ev = Tables.events(spark, sfDir)
      .select("ts_us", "event_type").collect()
      .map(row => ((row.getLong(0) / 86400000000L + 4) % 7 >= 5,
        row.getString(1) == "error"))
    assert(n1 == ev.count(_._1) && n0 == ev.count(!_._1))
    assert(x1 == ev.count(t => t._1 && t._2) &&
      x0 == ev.count(t => !t._1 && t._2))
    val (p1, p0) = (x1.toDouble / n1, x0.toDouble / n0)
    val p = (x1 + x0).toDouble / (n1 + n0)
    val z = (p1 - p0) / math.sqrt(p * (1.0 - p) * (1.0 / n1 + 1.0 / n0))
    assert(math.abs(r.getDouble(6) - z) < 5.01e-7,
      s"z: got ${r.getDouble(6)}, brute $z")
    assert(math.abs(r.getDouble(4) - p1) < 5.01e-7)
    assert(math.abs(r.getDouble(5) - p0) < 5.01e-7)
  }
}
