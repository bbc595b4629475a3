package graft

/** Exhaustive in-JVM ground truth for the kNN candidate-generation
  * machinery: recompute ALL pairwise cosines in plain Scala (independent
  * of both the mapPartitions pruning and the oracle) and compare the
  * top-20 under the exact output ordering (binary-round-6 desc, ids).
  */
class KnnExhaustiveSpec extends SparkSpec {

  test("knn_cosine == exhaustive all-pairs top-20") {
    val vecs = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6 else -math.floor(-x * 1e6 + 0.5) / 1e6
    val truth = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
    } yield (r6(cos(vecs(i)._2, vecs(j)._2)), vecs(i)._1, vecs(j)._1))
      .toArray
      .sortBy { case (c, a, b) => (-c, a, b) }
      .take(20)
      .map { case (c, a, b) => (a, b, c) }
    val got = q("knn_cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == truth.toSeq)
  }

  test("vec_centroid_assign == exhaustive nearest-centroid recompute") {
    val vecs = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Float]](2).map(_.toDouble).toArray))
    val dim = vecs.head._3.length
    val cents = vecs.groupBy(_._2).map { case (lbl, vs) =>
      val c = new Array[Double](dim)
      vs.foreach(v => (0 until dim).foreach(i => c(i) += v._3(i)))
      (0 until dim).foreach(i => c(i) /= vs.length)
      lbl -> c
    }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val truth = vecs
      .map { case (_, lbl, v) =>
        val assigned = cents.toSeq
          .map { case (cl, c) => (d2(v, c), cl) }.min._2
        (lbl, assigned)
      }
      .groupBy(identity).map { case ((l, a), xs) =>
        (l.toLong, a.toLong, xs.length.toLong)
      }.toSeq.sorted
    val got = q("vec_centroid_assign").collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2)))
      .toSeq.sorted
    assert(got == truth)
    assert(got.map(_._3).sum == vecs.length.toLong)
  }

  test("vec_kmeans == exhaustive 2-iteration Lloyd (sizes exact, inertia ~)") {
    val vecs = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray))
    val dim = vecs.head._2.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def centroids(assign: Map[Long, Long]): Map[Long, Array[Double]] =
      vecs.groupBy(v => assign(v._1)).map { case (cl, vs) =>
        val c = new Array[Double](dim)
        vs.foreach(v => (0 until dim).foreach(i => c(i) += v._2(i)))
        (0 until dim).foreach(i => c(i) /= vs.length)
        cl -> c
      }
    def estep(cents: Map[Long, Array[Double]])
        : (Map[Long, Long], Map[Long, Double]) = {
      val pairs = vecs.map { case (id, v) =>
        val (d, cl) = cents.toSeq.map { case (cl, c) => (d2(v, c), cl) }.min
        (id, cl, d)
      }
      (pairs.map(p => p._1 -> p._2).toMap, pairs.map(p => p._1 -> p._3).toMap)
    }
    val a0 = vecs.map(v => v._1 -> v._1 % 4).toMap
    val (a1, _) = estep(centroids(a0))
    val (a2, dists) = estep(centroids(a1))
    val truthSizes = a2.groupBy(_._2).map { case (cl, m) =>
      (cl, m.size.toLong) }
    val truthInertia = a2.groupBy(_._2).map { case (cl, m) =>
      (cl, m.keysIterator.map(dists).sum) }
    val got = q("vec_kmeans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(r => (r._1, r._2)).toSeq.sorted == truthSizes.toSeq.sorted,
      "cluster sizes")
    got.foreach { case (cl, _, inertia) =>
      assert(math.abs(inertia - truthInertia(cl)) < 1e-4,
        s"inertia drift for cluster $cl")
    }
    assert(got.map(_._2).sum == vecs.length.toLong, "partition of the corpus")
  }

  test("vec_norm_stats == sequential per-dimension moments") {
    val vecs = Tables.table(spark, sfDir, "embeddings")
      .select("embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toArray)
    val dims = vecs.head.length
    val got = q("vec_norm_stats").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.length == dims && got.map(_._1).toSeq == (0L until dims))
    got.foreach { case (pos, n, mean, sd, lo, hi) =>
      val xs = vecs.map(_(pos.toInt))
      assert(n == xs.length)
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      // query rounds to 1e-6; sequential double folding may differ by
      // ulps from the decimal-exact path near a bin edge
      assert(math.abs(mean - m) < 2e-6, s"mean dim $pos")
      assert(math.abs(sd - math.sqrt(v)) < 2e-6, s"sd dim $pos")
      assert(math.abs(lo - xs.min) < 2e-6 && math.abs(hi - xs.max) < 2e-6)
      assert(sd > 0 && hi > lo)
    }
  }
}
