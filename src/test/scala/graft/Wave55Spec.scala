package graft

import org.apache.spark.sql.functions._

/** Round-7 waves 55-57: bloom semi-join reduction, target encoding,
  * feature hashing. join_bloom's equivalence test lives in JoinSpec;
  * target-encode shrinkage in WindowSpec. Here: the hashing-trick
  * invariants that the oracle's hash-compare can't express.
  */
class Wave55Spec extends SparkSpec {

  test("text_hashing_trick: bucket range, sign parity, token conservation") {
    val rows = q("text_hashing_trick").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, bucket, n, signed) =>
      assert(bucket >= 0 && bucket < 64, s"doc $doc bucket $bucket")
      assert(math.abs(signed) <= n, "signed sum bounded by token count")
      // each token contributes ±1: parity of the signed sum must match n
      assert(((n - signed) % 2 + 2) % 2 == 0, s"doc $doc parity")
    }
    // conservation: Σ n_tokens over buckets == plain token count per doc
    val perDoc = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expect = Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(perDoc == expect, "hashing must not drop or duplicate tokens")
  }

  test("text_hashing_trick: feature space is fixed-width (≤64 buckets/doc)") {
    val byDoc = q("text_hashing_trick").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    byDoc.values.foreach(b => assert(b.length <= 64))
  }

  test("dq_freshness: the data's own max ts anchors the lag; flags match the rule") {
    val rows = q("dq_freshness").collect().map(r =>
      (r.getString(0), r.getLong(3), r.getLong(4), r.getString(7)))
    assert(rows.nonEmpty)
    // at least one stream IS the global max → lag 0, fresh
    assert(rows.exists(_._2 == 0L), "freshest stream must have zero lag")
    rows.foreach { case (t, lagUs, lagDays, status) =>
      assert(lagUs >= 0, s"$t: negative lag")
      assert(lagDays == lagUs / 86400000000L, s"$t: day arithmetic")
      val expect = if (lagUs > 2 * 86400000000L) "stale" else "fresh"
      assert(status == expect, s"$t: status $status for lag $lagUs")
    }
  }

  test("stream_distinct_users: replay end-state equals the batch distinct count") {
    import org.apache.spark.sql.functions._
    val got = q("stream_distinct_users").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = Tables.events(spark, sfDir)
      .groupBy(expr("ts_us div 86400000000").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == batch, "set-union state must converge to the batch answer")
    got.foreach { case (_, _, n, u) => assert(u <= n && u >= 1) }
  }

  test("er_sorted_neighbors: sound (every pair truly matches) and window-complete") {
    val parts = Tables.table(spark, sfDir, "part")
      .select("p_partkey", "p_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = q("er_sorted_neighbors").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, _, b, dist) =>
      assert(parts(a).split(" ")(0) == parts(b).split(" ")(0),
        s"$a,$b cross first-word blocks")
      assert(lev(parts(a), parts(b)) == dist && dist <= 3)
    }
    // completeness within the declared window: brute-force the same
    // block-sorted gap≤3 neighbor scan and demand the identical pair set
    val expect = parts.toSeq.map { case (k, n) => (n.split(" ")(0), n, k) }
      .groupBy(_._1).values.flatMap { blk =>
        val sorted = blk.sortBy(t => (t._2, t._3))
        for (i <- sorted.indices; g <- 1 to 3 if i + g < sorted.length
             if lev(sorted(i)._2, sorted(i + g)._2) <= 3)
          yield (sorted(i)._3, g.toLong, sorted(i + g)._3)
      }.toSet
    assert(rows.map(t => (t._1, t._2, t._3)).toSet == expect)
  }
}
