package graft

/** Round-6 wave 30: events_stl_lite decomposition identity + plan audits
  * for the round-6 additions (no cartesian degradation, the span miner
  * stays pair-join-free).
  */
class Wave30Spec extends SparkSpec {

  private def p(name: String): String = plan(q(name))

  test("events_stl_lite: trend + seasonal + resid reconstructs the series") {
    val rows = q("events_stl_lite").collect()
    assert(rows.nonEmpty)
    var fullWindows = 0
    for (r <- rows) {
      val tot = r.getLong(2).toDouble
      if (!r.isNullAt(3)) {
        fullWindows += 1
        val recon = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
        assert(math.abs(tot - recon) < 1e-3,
          s"day ${r.getLong(0)}: tot $tot vs trend+seasonal+resid $recon")
      } else {
        // boundary day (centered window incomplete): resid null too
        assert(r.isNullAt(5))
      }
    }
    assert(fullWindows == rows.length - 6,
      "exactly the 3+3 boundary days lack a full centered window")
  }

  test("events_stl_lite: seasonal effects sum to ~zero across phases") {
    val seas = q("events_stl_lite").collect()
      .filter(!_.isNullAt(4)).map(r => r.getLong(1) -> r.getDouble(4))
      .toMap.values.toSeq
    assert(seas.size == 7)
    // detrended values are deviations from the local mean, so their
    // per-phase means roughly cancel (not exactly: phases have
    // different day counts)
    assert(math.abs(seas.sum) < seas.map(math.abs).max * 7 + 1e-6)
  }

  test("dedup_substring plan: no pair join, no cartesian") {
    val s = p("dedup_substring")
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoop"), "span mining must stay join-lean")
  }

  test("graph_kcore and curation_pipeline plans: no cartesian degradation") {
    for (name <- Seq("graph_kcore", "curation_pipeline")) {
      val s = p(name)
      assert(!s.contains("CartesianProduct"), name)
    }
  }

  test("knn_range_search plan: queries broadcast, index side exchanged") {
    val s = p("knn_range_search")
    assert(s.contains("BroadcastNestedLoopJoin"),
      "threshold scan is the lazy broadcast NL join by design")
    assert(s.contains("hashpartitioning"),
      "index side must be pinned-repartitioned (the allPairsCos discipline)")
  }
}
