package graft

/** Round-6 wave 26: dedup_substring (ExactSubstr-style span dedup)
  * cross-checked against a naive JVM recomputation at sf0.001, plus
  * span-structure invariants the relational plan must preserve.
  */
class Wave26Spec extends SparkSpec {

  private val K = 8

  /** Naive duplicated-span mining: hash every width-K word shingle,
    * mark those in ≥2 distinct docs, merge per-doc start positions into
    * maximal spans (merge when nextStart <= prevStart + K).
    */
  private lazy val naive: Map[Long, (Long, Long, Long, Long)] = {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val occ = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    for ((id, t) <- docs; i <- 0 to t.length - K)
      occ.getOrElseUpdate(t.slice(i, i + K).mkString(" "),
        scala.collection.mutable.Set.empty) += id
    val dup = occ.filter(_._2.size >= 2).keySet
    docs.flatMap { case (id, t) =>
      val starts = (0 to t.length - K)
        .filter(i => dup(t.slice(i, i + K).mkString(" "))).map(_ + 1)
      if (starts.isEmpty) None
      else {
        // gaps-and-islands merge
        var spans = List.empty[(Int, Int)] // (st, en) inclusive token idx
        for (p <- starts) spans = spans match {
          case (st, en) :: rest if p <= en + 1 => (st, math.max(en, p + K - 1)) :: rest
          case _ => (p, p + K - 1) :: spans
        }
        val lens = spans.map { case (s, e) => (e - s + 1).toLong }
        Some(id -> (spans.size.toLong, lens.sum, lens.max, t.length.toLong))
      }
    }.toMap
  }

  test("dedup_substring matches naive span mining at sf0.001") {
    val rows = q("dedup_substring").collect()
    assert(rows.nonEmpty, "fixture corpus has known near-dups — spans expected")
    assert(rows.length == naive.size,
      s"engine ${rows.length} docs vs naive ${naive.size}")
    for (r <- rows) {
      val id = r.getLong(0)
      val (ns, dt, ls, nt) = naive(id)
      assert(r.getLong(1) == ns, s"doc $id n_spans")
      assert(r.getLong(2) == dt, s"doc $id dup_tokens")
      assert(r.getLong(3) == ls, s"doc $id longest_span")
      assert(r.getLong(4) == nt, s"doc $id n_tokens")
    }
  }

  test("dedup_substring invariants: spans bounded by doc length, frac in (0,1]") {
    for (r <- q("dedup_substring").collect()) {
      val (nSpans, dupT, longest, nTok, frac) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nSpans >= 1 && dupT >= K && longest >= K)
      assert(longest <= dupT && dupT <= nTok)
      // spans are disjoint maximal islands, each at least one shingle wide
      assert(dupT >= nSpans * K)
      assert(frac > 0 && frac <= 1.0)
    }
  }

  test("dedup_substring_scrub is consistent with the span report") {
    val report = q("dedup_substring").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    val rows = q("dedup_substring_scrub").collect()
    // every scrubbed doc is an affected doc, removal = reported dup span
    // mass, and kept + removed tiles the doc
    for (r <- rows) {
      val (dupTokens, nTok) = report(r.getLong(0))
      assert(r.getLong(1) == nTok)
      assert(r.getLong(3) == dupTokens, s"doc ${r.getLong(0)} removed")
      assert(r.getLong(2) + r.getLong(3) == nTok)
      assert(r.getLong(2) > 0)
    }
    // docs missing from the scrub output are exactly the fully-covered
    // ones (dup_tokens == n_tokens): nothing unique remains to keep
    val scrubbed = rows.map(_.getLong(0)).toSet
    for ((id, (dupT, nT)) <- report if !scrubbed(id))
      assert(dupT == nT, s"doc $id dropped but not fully covered")
  }
}
