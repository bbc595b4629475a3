package graft

import org.apache.spark.sql.functions._

/** Round-6 wave 28: curation_pipeline (end-to-end funnel) and
  * knn_range_search (threshold retrieval) vs naive recomputation.
  */
class Wave28Spec extends SparkSpec {

  test("curation_pipeline: funnel counts are monotone and weights sum to 1") {
    val rows = q("curation_pipeline").collect()
    assert(rows.nonEmpty)
    var wSum = 0.0
    for (r <- rows) {
      val (raw, gated, exact, kept) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(raw >= gated && gated >= exact && exact >= kept,
        s"${r.getString(0)}/${r.getString(1)}: $raw >= $gated >= $exact >= $kept")
      wSum += r.getDouble(7)
    }
    assert(math.abs(wSum - 1.0) < 1e-3, s"mixture weights sum to $wSum")
  }

  test("curation_pipeline: stage counts match naive recomputation") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val gate = docs.filter { case (_, t) =>
      val toks = t.split(" ", -1)
      toks.length >= 30 && (toks.contains("the") || toks.contains("a"))
    }
    // exact dedup: keep min doc_id per text
    val nExact = gate.groupBy(_._2).map(_._2.map(_._1).min).toSet.size
    val rows = q("curation_pipeline").collect()
    assert(rows.map(_.getLong(2)).sum == docs.length)
    assert(rows.map(_.getLong(3)).sum == gate.length)
    assert(rows.map(_.getLong(4)).sum == nExact)
    // near-dup selection can only drop further
    assert(rows.map(_.getLong(5)).sum <= nExact)
  }

  test("knn_range_search matches brute-force threshold scan") {
    val vecs = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val naive = (for {
      (qi, qv) <- vecs if qi % 50 == 0
      (ii, iv) <- vecs if ii != qi
      c = math.rint(cos(qv, iv) * 1e6) / 1e6 if c >= 0.35
    } yield (qi, ii) -> c).toMap
    val rows = q("knn_range_search").collect()
    assert(rows.length == naive.size,
      s"engine ${rows.length} matches vs naive ${naive.size}")
    for (r <- rows) {
      val key = (r.getLong(0), r.getLong(1))
      assert(naive.contains(key), s"pair $key")
      assert(math.abs(r.getDouble(2) - naive(key)) < 2e-6)
      assert(r.getDouble(2) >= 0.35)
    }
  }
}
