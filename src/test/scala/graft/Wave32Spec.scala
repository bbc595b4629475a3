package graft

/** Round-6 wave 32: dedup_threshold_sweep vs naive shingle-Jaccard
  * histogram.
  */
class Wave32Spec extends SparkSpec {

  test("dedup_threshold_sweep matches the naive decile histogram") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet))
      .filter(_._3.nonEmpty)
    val deciles = for {
      (ia, sa, sha) <- docs
      (ib, sb, shb) <- docs
      if ia < ib && sa == sb
      i = (sha & shb).size if i > 0
      j = math.rint(i.toDouble / (sha.size + shb.size - i) * 1e6) / 1e6
      if j >= 0.05
    } yield math.min((j * 10).toInt, 9)
    val hist = deciles.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = q("dedup_threshold_sweep").collect()
    assert(rows.map(_.getLong(0)).toSet == hist.keySet.map(_.toLong))
    var above = 0L
    for (r <- rows.sortBy(-_.getLong(0))) {
      assert(hist(r.getLong(0).toInt) == r.getLong(1), s"decile ${r.getLong(0)}")
      above += r.getLong(1)
      assert(r.getLong(2) == above, s"cumulative at decile ${r.getLong(0)}")
    }
  }

  test("dq_duplicate_orders matches the naive same-customer day-band scan") {
    val orders = Tables.table(spark, sfDir, "orders")
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS LONG) AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = (for {
      (ca, ka, da) <- orders
      (cb, kb, db) <- orders
      if ca == cb && ka < kb && math.abs(da - db) <= 1
    } yield (ca, ka, kb, math.abs(da - db))).toSet
    val rows = q("dq_duplicate_orders").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == naive, s"engine ${rows.size} vs naive ${naive.size}")
    assert(q("dq_duplicate_orders").collect()
      .forall(_.getDouble(4) >= 0), "price delta is absolute")
  }
}
