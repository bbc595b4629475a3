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
}
