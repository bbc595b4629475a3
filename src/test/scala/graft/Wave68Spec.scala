package graft

import org.apache.spark.sql.functions._

/** Round-7 wave 68: IVF-PQ residual encoding. The oracle pins every
  * code and error cross-engine; here the ARCHITECTURE claim is
  * measured: encoding residuals must beat encoding raw vectors, and
  * the coarse assignment must be the true argmin.
  */
class Wave68Spec extends SparkSpec {

  test("residual encoding wins on clustered data (the architecture claim, JVM)") {
    // the fixture embeddings are near-uniform — PQ's adversarial case,
    // where subtracting an unrelated centroid inflates residual norms
    // (declaration-site note). The architecture claim needs CLUSTERS, so
    // build a deterministic clustered set: 4 centers, 25 members each,
    // member = center + small deterministic offset. Run the identical
    // algorithm (coarse argmin → residual → 16-entry PQ per 8-dim slice)
    // against raw PQ with the same codebook budget.
    val dim = 64
    def center(c: Int): Array[Double] =
      Array.tabulate(dim)(i => math.sin(c * 37 + i * 3).round.toDouble * 5 + c)
    val vecs: Seq[(Int, Array[Double])] = for {
      c <- 0 until 4; m <- 0 until 25
    } yield (c, Array.tabulate(dim)(i =>
      center(c)(i) + ((c * 97 + m * 13 + i) % 7 - 3) * 0.1))
    def sq(a: Array[Double], b: Array[Double], from: Int, n: Int): Double = {
      var s = 0.0; var i = from
      while (i < from + n) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val cents = (0 until 4).map(c => center(c))
    def encodeErr(data: Seq[Array[Double]], book: Seq[Array[Double]]): Double =
      data.map { v =>
        (0 until 8).map { j =>
          book.map(e => sq(v, e, j * 8, 8)).min
        }.sum
      }.sum / data.size
    // raw PQ: codebook = first 16 raw vectors
    val raws = vecs.map(_._2)
    val rawErr = encodeErr(raws, raws.take(16))
    // residual PQ: subtract the argmin center, codebook = 16 residuals
    val resids = vecs.map { case (_, v) =>
      val c = cents.minBy(ce => sq(v, ce, 0, dim))
      v.zip(c).map { case (a, b) => a - b }
    }
    val resErr = encodeErr(resids, resids.take(16))
    assert(resErr < rawErr / 2,
      s"on clustered data residual PQ ($resErr) must beat raw ($rawErr)")
  }

  test("vec_pq_residual: buckets are the exact coarse argmin; codes well-formed") {
    val emb = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cents = (0L until 4L).map(c => c -> emb(c).map(_.toDouble)).toMap
    val rows = q("vec_pq_residual").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(rows.length == emb.size)
    rows.foreach { case (id, bucket, code, err) =>
      val v = emb(id)
      val best = cents.map { case (c, ce) =>
        var s = 0.0
        var i = 0
        while (i < 64) { val d = v(i).toDouble - ce(i); s += d * d; i += 1 }
        (s, c)
      }.minBy(identity)._2
      assert(bucket == best, s"vec $id coarse-assigned to $bucket, true $best")
      val parts = code.split("-")
      assert(parts.length == 8 &&
        parts.forall(p => { val x = p.toLong; x >= 16 && x < 32 }),
        s"vec $id code $code")
      assert(err >= 0)
      // a codebook member's residual reconstructs itself exactly
      if (id >= 16 && id < 32) assert(err == 0.0, s"codebook vec $id err $err")
    }
  }

  test("graph_hits: integer conservation laws across the two rounds") {
    val rows = q("graph_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val n = rows.length.toLong
    assert(n == Tables.table(spark, sfDir, "embeddings").count())
    // every vector has out-degree 3 ⇒ Σ auth1 = |E| = 3n
    assert(rows.map(_._2).sum == 3 * n, "Σ in-degree must equal |E|")
    // h1 = Σ a1 over out-edges ⇒ Σ hub1 = Σ over edges of a1(dst)
    //    = Σ_v a1(v)² ; and Σ auth2 = Σ hub1 (each edge hands h1 on)
    assert(rows.map(_._4).sum == rows.map(t => t._2 * t._2).sum,
      "Σ hub1 must equal Σ auth1²")
    // Σ auth2 = Σ_edges h1(src) = Σ_u outdeg(u)·h1(u) = 3·Σ hub1
    assert(rows.map(_._3).sum == 3 * rows.map(_._4).sum,
      "Σ auth2 must equal 3·Σ hub1 (uniform out-degree edge-sum)")
    // hubs have out-degree 3 > 0 always ⇒ hub1 ≥ 3 (a1 ≥ 1 per target?
    // no — a target may have in-degree 0 only if never chosen; but a1 of
    // a CHOSEN target ≥ 1, and each vector chooses 3 targets)
    rows.foreach { case (id, _, _, h1, _) =>
      assert(h1 >= 3, s"vec $id hub1 $h1: 3 chosen targets each have a1 ≥ 1")
    }
  }

  test("knn_classify: per-class accuracies match a JVM 5-NN majority vote") {
    val all = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val labelOf = all.map(t => t._1 -> t._2).toMap
    val correctByLabel = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    // the declared query is wave 82's SAMPLED eval: only the
    // deterministic 1-in-10 query set (vec_id % 10 == 0), each judged
    // against the FULL index — mirror that here. Ranking uses round6
    // cosine with idx tie-break (the Knn.search contract).
    def r6(x: Double): Double =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    all.filter(_._1 % 10 == 0).foreach { case (id, lbl, v) =>
      val top5 = all.filter(_._1 != id)
        .map(o => (r6(cos(v, o._3)), o._1))
        .sortBy(t => (-t._1, t._2)).take(5)
      val votes = top5.groupBy(t => labelOf(t._2)).view.mapValues(_.length)
      val pred = votes.toSeq.sortBy(t => (-t._2, t._1)).head._1
      val (n, c) = correctByLabel.getOrElse(lbl, (0L, 0L))
      correctByLabel(lbl) = (n + 1, c + (if (pred == lbl) 1L else 0L))
    }
    val got = q("knn_classify").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == correctByLabel.toMap,
      s"got $got vs jvm ${correctByLabel.toMap}")
  }
}
