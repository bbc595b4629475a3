package graft

/** Round-8 plan audit: the scaladoc plan claims of the new operators,
  * asserted on the formatted physical plans (the PlanSpec discipline)
  * so a regression in Catalyst or a refactor can't silently break the
  * at-scale shapes.
  */
class Wave106Spec extends SparkSpec {

  private def exchanges(p: String, kind: String): Int =
    kind.r.findAllIn(p).length

  test("stat_spearman: ONE user_id hash exchange feeds the four " +
    "windows and the keyed agg — no per-window reshuffle") {
    val p = plan(q("stat_spearman"))
    val hashEx = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(hashEx == 1, s"expected 1 user_id exchange, plan has $hashEx")
  }

  test("events_peaks: one entity-keyed exchange feeds the four lags " +
    "(unpartitioned-window bounds are WindowGuardSpec's job)") {
    val p = plan(q("events_peaks"))
    val hashEx = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(hashEx == 1, s"expected 1 user_id exchange, plan has $hashEx")
  }

  test("knn_mips: both the seed pass and the pruned scan broadcast " +
    "the small side — no sort-merge join, no cartesian") {
    val p = plan(q("knn_mips"))
    assert(exchanges(p, "BroadcastExchange") >= 2,
      "seed and query sides must broadcast")
    assert(!p.contains("SortMergeJoin"), "MIPS must not sort-merge")
    assert(!p.contains("CartesianProduct"))
  }

  test("knn_rerank: the rerank joins broadcast the |Q|x20 shortlist " +
    "side, never shuffling the index by content") {
    val p = plan(q("knn_rerank"))
    assert(exchanges(p, "BroadcastExchange") >= 2)
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup_cdc_chunks: exactly one corpus scan feeds the chunker " +
    "(no self-join, no cartesian)") {
    val p = plan(q("dedup_cdc_chunks"))
    // formatted plans print each node in the tree AND the detail
    // section — count the numbered detail entries only
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).length == 1,
      "the chunker must be a single corpus pass")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("ivm_manifest_delta: the refresh plan scans the stored view " +
    "and the delta files only — two scans, no wide join") {
    val p = plan(q("ivm_manifest_delta"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }
}
