package graft

import org.apache.spark.sql.functions._

/** Round-7 wave 52: ADC search over PQ codes — the math is checked
  * bit-for-bit against a JVM brute force, and the recall of the
  * untrained 16-entry codebook is MEASURED (not assumed).
  */
class Wave52Spec extends SparkSpec {

  private def embMap = Tables.table(spark, sfDir, "embeddings")
    .select("vec_id", "embedding").collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  test("knn_search_pq: ADC distances match a JVM brute force exactly") {
    val emb = embMap
    val seeds = (0L until 16L).map(i => emb(i).map(_.toDouble))
    def sliceD2(a: Array[Double], b: Array[Double], j: Int): Double = {
      var acc = 0.0
      var i = j * 8
      while (i < j * 8 + 8) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    // codes: per (vec, j) the argmin codebook id (ties to smaller id)
    val codes = emb.map { case (id, v) =>
      val vd = v.map(_.toDouble)
      id -> Array.tabulate(8) { j =>
        var best = 0; var bd = Double.MaxValue
        for (s <- 0 until 16) {
          val d = sliceD2(vd, seeds(s), j)
          if (d < bd) { bd = d; best = s }
        }
        best
      }
    }
    val rows = q("knn_search_pq").collect()
    assert(rows.nonEmpty)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    rows.foreach { r =>
      val qv = emb(r.getAs[Long]("q_id")).map(_.toDouble)
      val cs = codes(r.getAs[Long]("idx_id"))
      var p = 0L
      for (j <- 0 until 8)
        p += math.floor(sliceD2(qv, seeds(cs(j)), j) * 1e12 + 0.5).toLong
      assert(r.getAs[Double]("adc_dist") == r6(p.toDouble / 1e12),
        s"q=${r.getAs[Long]("q_id")} idx=${r.getAs[Long]("idx_id")}")
    }
  }

  test("knn_search_pq: measured recall of ADC top-3 into exact top-10") {
    val emb = embMap
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    val exactTop10 = emb.keys.filter(_ % 50 == 0).map { qid =>
      qid -> emb.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (d2(emb(qid), v), id) }
        .sortBy(identity).take(10).map(_._2).toSet
    }.toMap
    val picks = q("knn_search_pq").collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("idx_id")).toSet }
    val hits = picks.map { case (k, p) => (p & exactTop10(k)).size }.sum
    val tot = picks.values.map(_.size).sum
    // the 16-entry UNTRAINED codebook on this near-uniform fixture
    // (cos ≤ 0.48 corpus-wide) is PQ's hardest case — measured 40% at
    // sf0.001; the floor guards against silent regressions to random
    // (expected ~1.5% for 3 picks of ~500)
    assert(hits * 5 >= tot, s"ADC recall collapsed: $hits/$tot")
  }

  test("vec_pq_train: one Lloyd step reduces error on every subspace") {
    val rows = q("vec_pq_train").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("improved"), s"subspace ${r.getAs[Long]("j")}")
      assert(r.getAs[Double]("err_after") < r.getAs[Double]("err_before"),
        "Lloyd monotonicity must hold strictly on this fixture")
    }
  }
}
