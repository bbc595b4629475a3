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
}
