package graft

/** Round-6 wave 31: sample_negative_mining vs brute force. */
class Wave31Spec extends SparkSpec {

  test("sample_negative_mining matches brute-force cross-label top-2") {
    val vecs = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val naive = vecs.filter(_._1 % 50 == 0).flatMap { case (qi, qv, ql) =>
      vecs.filter(v => v._1 != qi && v._3 != ql)
        .map(v => (v._1, v._3, math.rint(cos(qv, v._2) * 1e6) / 1e6))
        .sortBy { case (id, _, c) => (-c, id) }.take(2).zipWithIndex
        .map { case ((ii, il, c), r) => (qi, r + 1L) -> (ql, ii, il, c) }
    }.toMap
    val rows = q("sample_negative_mining").collect()
    assert(rows.length == naive.size)
    for (r <- rows) {
      val (ql, ii, il, c) = naive((r.getLong(0), r.getLong(1)))
      assert(r.getInt(2) == ql && r.getLong(3) == ii && r.getInt(4) == il,
        s"anchor ${r.getLong(0)} rank ${r.getLong(1)}")
      assert(math.abs(r.getDouble(5) - c) < 2e-6)
      // the defining property: a negative never shares the anchor label
      assert(r.getInt(2) != r.getInt(4))
    }
  }
}
