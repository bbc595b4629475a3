package graft

import org.apache.spark.sql.functions._

/** Stats group: agreement with naive driver-side recomputation at
  * sf0.001 (within float tolerance — the queries themselves are
  * bit-deterministic; the tolerance covers the naive re-derivation),
  * plus the statistics' analytic invariants.
  */
class StatsSpec extends SparkSpec {

  private lazy val vals: Map[String, Array[Double]] =
    Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, a) => k -> a.map(_._2) }

  test("stat_ttest matches the naive Welch computation per type") {
    val rows = q("stat_ttest").collect()
    assert(rows.length == 5)
    val all = vals.values.flatten.toArray
    for (r <- rows) {
      val ty = r.getString(0)
      val in = vals(ty); val rest = all.length - in.length
      val restVals = vals.filterKeys(_ != ty).values.flatten.toArray
      def mean(a: Array[Double]) = a.sum / a.length
      def varS(a: Array[Double]) = {
        val m = mean(a); a.map(x => (x - m) * (x - m)).sum / (a.length - 1)
      }
      val t = (mean(in) - mean(restVals)) /
        math.sqrt(varS(in) / in.length + varS(restVals) / restVals.length)
      assert(r.getLong(1) == in.length && r.getLong(2) == rest)
      assert(math.abs(r.getDouble(5) - t) < 1e-3,
        s"$ty: engine t=${r.getDouble(5)} naive t=$t")
    }
  }

  test("stat_chisq: nonnegative, plausible dof, matches naive contingency") {
    val r = q("stat_chisq").head()
    val chisq = r.getDouble(0)
    assert(chisq >= 0)
    // naive recomputation
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"), floor(col("value") / 100).cast("long").as("b"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n = cells.length.toDouble
    val byCell = cells.groupBy(identity).view.mapValues(_.length).toMap
    val byRow = cells.groupBy(_._1).view.mapValues(_.length).toMap
    val byCol = cells.groupBy(_._2).view.mapValues(_.length).toMap
    val naive = byCell.map { case ((ty, b), o) =>
      val e = byRow(ty) * byCol(b) / n; (o - e) * (o - e) / e
    }.sum
    assert(math.abs(chisq - naive) < 1e-3, s"engine $chisq vs naive $naive")
    assert(r.getLong(1) == byCell.size - 1)
  }

  test("stat_ks: D in [0,1] and matches naive two-sample scan") {
    val r = q("stat_ks").head()
    val d = r.getDouble(0)
    assert(d >= 0 && d <= 1)
    val a = vals("click").sorted; val b = vals("view").sorted
    val support = (a ++ b).distinct.sorted
    val naive = support.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.length
        - b.count(_ <= x).toDouble / b.length)
    }.max
    assert(math.abs(d - naive) < 1e-6, s"engine $d vs naive $naive")
    assert(r.getLong(1) == a.length && r.getLong(2) == b.length)
  }
}
