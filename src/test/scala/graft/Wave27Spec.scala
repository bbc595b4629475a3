package graft

import org.apache.spark.sql.functions._

/** Round-6 wave 27: graph_kcore (bounded mutual-kNN peel) and
  * dq_key_skew (join-key skew audit) vs naive recomputation.
  */
class Wave27Spec extends SparkSpec {

  /** Mutual kNN edges at sf0.001, collected once (directed pairs where
    * each endpoint ranks the other in its top-3).
    */
  private lazy val mutualEdges: Set[(Long, Long)] = {
    val g = operators.Knn.sharedEdges(spark, sfDir, k = 3)
      .select("q_id", "idx_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    g.filter { case (a, b) => g.contains((b, a)) }
  }

  /** Full peel to the TRUE 2-core fixpoint. */
  private def trueCore: Set[Long] = {
    var e = mutualEdges
    var done = false
    while (!done) {
      val deg = e.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      val e2 = e.filter { case (a, b) => keep(a) && keep(b) }
      done = e2 == e
      e = e2
    }
    e.map(_._1)
  }

  test("graph_kcore: 4-round peel is a superset of the true 2-core") {
    val out = q("graph_kcore").collect().map(_.getLong(0)).toSet
    assert(out.nonEmpty, "mutual kNN graph has clusters — core expected")
    val core = trueCore
    assert(core.subsetOf(out),
      s"true core (${core.size}) must survive bounded peeling (${out.size})")
    // bounded peel only removes vertices outside the core's closure:
    // everything output is from the mutual graph
    val verts = mutualEdges.map(_._1)
    assert(out.subsetOf(verts))
  }

  test("graph_kcore: peel rounds monotonically shrink the edge set") {
    // recompute rounds naively and check each is <= the previous
    var e = mutualEdges
    var prev = e.size
    for (_ <- 1 to 4) {
      val deg = e.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      e = e.filter { case (a, b) => keep(a) && keep(b) }
      assert(e.size <= prev)
      prev = e.size
    }
    // engine degrees match the naive 4-round survivors' degrees
    val naiveDeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rows = q("graph_kcore").collect()
    assert(rows.length == naiveDeg.size)
    for (r <- rows)
      assert(naiveDeg(r.getLong(0)) == r.getLong(1),
        s"vertex ${r.getLong(0)} degree")
  }

  test("dq_key_skew matches naive frequency profiles") {
    val rows = q("dq_key_skew").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(rows.size == 5)
    val li = Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0))
    val freq = li.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (n, nk, mx) = (li.length.toLong, freq.size.toLong, freq.values.max)
    val (gn, gnk, gmx, skew, top1) = rows("lineitem.l_orderkey")
    assert(gn == n && gnk == nk && gmx == mx)
    assert(math.abs(skew - mx.toDouble * nk / n) < 1e-6)
    assert(math.abs(top1 - mx.toDouble / n) < 1e-6)
    // skew_factor >= 1 by construction (max >= avg) on every key
    for ((_, (_, _, _, sk, t1)) <- rows) { assert(sk >= 1.0); assert(t1 > 0) }
  }
}
