package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Knn

/** Ground truth for the [[graft.operators.Knn.search]] serving API: the
  * exact mode must equal a plain JVM brute force under the full output
  * ordering (round-6 cosine desc, idx_id asc), on deterministic
  * pseudo-random vectors independent of the fixtures.
  */
class KnnSearchSpec extends SparkSpec {

  private def vecs(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(seed)
    (0L until n).map(i => (i, Array.fill(dim)(r.nextFloat() * 2f - 1f)))
  }

  private def df(data: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    data.toDF("vec_id", "embedding")
  }

  private def r6(x: Double): Double =
    if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6 else -math.floor(-x * 1e6 + 0.5) / 1e6

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("search(bits=0) == JVM brute-force top-k per query") {
    val data = vecs(300, 64, seed = 42)
    val d = df(data)
    val queries = data.filter(_._1 % 29 == 0)
    val truth = queries.flatMap { case (qid, qe) =>
      data.filter(_._1 != qid)
        .map { case (iid, ie) => (r6(cos(qe, ie)), iid) }
        .sortBy { case (c, iid) => (-c, iid) }
        .take(5)
        .zipWithIndex
        .map { case ((c, iid), r) => (qid, (r + 1).toLong, iid, c) }
    }.sortBy(t => (t._1, t._2))
    val got = Knn.search(d.filter(col("vec_id") % 29 === 0), d, k = 5)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == truth)
  }

  test("knn_graph == JVM brute-force self-kNN, no self-edges, n·k rows") {
    val data = vecs(120, 64, seed = 7)
    val d = df(data)
    val truth = data.flatMap { case (qid, qe) =>
      data.filter(_._1 != qid)
        .map { case (iid, ie) => (r6(cos(qe, ie)), iid) }
        .sortBy { case (c, iid) => (-c, iid) }
        .take(3)
        .zipWithIndex
        .map { case ((c, iid), r) => (qid, (r + 1).toLong, iid, c) }
    }.sortBy(t => (t._1, t._2))
    val got = Knn.search(d, d, k = 3).orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == truth)
    assert(got.forall { case (q, _, i, _) => q != i }, "no self-edges")
    assert(got.length == data.length * 3, "n·k rows")
  }

  test("filtered ANN: results drawn only from the filtered index") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val allowed = emb.filter(col("label") === 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = q("knn_search_filtered").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (_, _, iid) => allowed(iid) },
      "every neighbor must satisfy the metadata predicate")
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length))
    }
  }

  test("self-matches excluded; ranks dense 1..k per query") {
    val d = df(vecs(120, 64, seed = 7))
    val got = Knn.search(d.filter(col("vec_id") < 10), d, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.forall { case (qid, _, iid) => qid != iid })
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to 4L))
    }
    assert(got.map(_._1).distinct.length == 10)
  }

  test("knn_mutual == the symmetric subset of the knn_graph edge set") {
    val edges = SparkEntry.queries("knn_graph")(spark, sfDir).collect()
      .map(r => ((r.getAs[Long]("q_id"), r.getAs[Long]("idx_id")),
        r.getAs[Long]("rank")))
      .toMap
    val truth = edges.keySet.collect {
      case (a, b) if a < b && edges.contains((b, a)) => (a, b)
    }
    val got = SparkEntry.queries("knn_mutual")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("rank_ab"), r.getAs[Long]("rank_ba")))
    assert(got.map(t => (t._1, t._2)).toSet == truth,
      "mutual pairs = exactly the bidirectional edges")
    got.foreach { case (a, b, rab, rba) =>
      assert(edges((a, b)) == rab && edges((b, a)) == rba)
    }
  }
}
