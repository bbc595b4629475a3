package graft

import graft.operators.{ManifestOps, ManifestTable}
import org.apache.spark.sql.functions._

/** Round-8 wave 97: CDC-from-CoW view maintenance (file-diff deltas
  * with retractions) and the Poisson dispersion index — scan-scope
  * assertions and a brute JVM recompute.
  */
class Wave97Spec extends SparkSpec {

  test("ivm_manifest_cow_delta equals the direct merged aggregate and " +
    "its delta scans touch ONLY replaced + replacement files") {
    val orders = Tables.table(spark, sfDir, "orders")
    val root = ManifestOps.cowRoot(spark, sfDir)
    val refreshed = q("ivm_manifest_cow_delta").collect().toSeq
    val direct = ManifestTable.read(spark, root, 2, orders.schema)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        Canon.decRound4(sum(col("o_totalprice").cast(Canon.Dec))).as("rev"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(refreshed == direct)
    // the delta file sets are exactly the CoW band's lineage: v1∖v2 =
    // replaced, v2∖v1 = replacements, and the surviving files appear
    // in neither
    val v1 = ManifestTable.filesFor(root, 1).toSet
    val v2 = ManifestTable.filesFor(root, 2).toSet
    val survivors = v1.intersect(v2)
    assert(survivors.nonEmpty, "CoW must leave most files untouched")
    assert((v1 -- v2).nonEmpty && (v2 -- v1).nonEmpty)
    assert((v1 -- v2).intersect(survivors).isEmpty &&
      (v2 -- v1).intersect(survivors).isEmpty)
    // retraction really happened: the merge deletes band %19 keys, so
    // total n is LESS than the source count
    assert(refreshed.map(_.getLong(1)).sum < orders.count())
  }

  test("events_dispersion matches a brute JVM variance/mean of daily " +
    "counts") {
    val got = q("events_dispersion").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val daily = Tables.events(spark, sfDir)
      .select("event_type", "ts_us").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000L))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      .groupBy(_._1._1)
    daily.foreach { case (t, m) =>
      val cs = m.values.toSeq
      val n = cs.length
      val mean = cs.sum.toDouble / n
      val vr = (cs.map(c => c.toDouble * c).sum - cs.sum.toDouble * cs.sum / n) / (n - 1)
      val (gn, gm, gv, gd) = got(t)
      assert(gn == n)
      assert(math.abs(gm - mean) < 5.01e-7 && math.abs(gv - vr) < 5.01e-7)
      assert(math.abs(gd - vr / mean) < 5.01e-7)
    }
    // the fixture's uniform generator is not wildly overdispersed —
    // sanity that D is finite and positive everywhere
    assert(got.values.forall(v => v._4 > 0 && !v._4.isNaN))
  }
}
