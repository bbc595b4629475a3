package graft

/** Corpus-wide degeneracy guard: every declared BATCH query must return
  * at least one row on the smallest fixture. An empty result silently
  * passes the driver's hash compare (both sides empty) while
  * demonstrating nothing — this spec is the tripwire that caught
  * graph_link_predict's first (transitively-closed n-gram graph) edge
  * source, and it guards every future fixture regeneration.
  *
  * Streaming queries are excluded here: each costs seconds of
  * state-store replay and their non-emptiness is pinned by
  * StreamingSpec's per-query assertions.
  */
class NonDegeneracySpec extends SparkSpec {

  private val streamingKeys =
    operators.Streaming.queries.keySet

  /** Empty at sf0.001 for a verified data reason, non-empty at the
    * oracle SF and above (the full sf0.01 dump has zero empty results):
    *  - er_blocked: 200 parts yield no Levenshtein-close name pair
    *    within any (brand, size) block — fuzzy duplicates only appear
    *    from sf0.01's 2 000 parts up.
    */
  private val emptyAtSmallestSf = Set("er_blocked", "er_golden_record")

  test("every batch query returns rows at sf0.001") {
    val empties = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(streamingKeys)
      .filterNot(emptyAtSmallestSf)
      .filter { name =>
        q(name).limit(1).collect().isEmpty
      }
    assert(empties.isEmpty,
      s"degenerate (empty) at sf0.001: ${empties.mkString(", ")}")
  }

  test("dq_volume_drift flags at least one anomaly at the oracle SF") {
    // the rare-slice + zero-filled-grid design exists so the monitor
    // actually trips on the fixtures; all-'ok' would be the degenerate
    // all-zero report this spec family guards against
    val statuses = q("dq_volume_drift", sfDir01)
      .select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses.contains("spike") || statuses.contains("drop"),
      s"monitor never fired: $statuses")
  }
}
