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

  test("stat_mannwhitney matches naive rank-sum with tie-average ranks") {
    val r = q("stat_mannwhitney").head()
    val a = vals("click"); val b = vals("view")
    // naive: average ranks over the pooled sorted sample
    val pooled = (a.map((_, 1)) ++ b.map((_, 2))).sortBy(_._1)
    val rank = new Array[Double](pooled.length)
    var i = 0
    while (i < pooled.length) {
      var j = i
      while (j < pooled.length && pooled(j)._1 == pooled(i)._1) j += 1
      val avg = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1..j
      for (k <- i until j) rank(k) = avg
      i = j
    }
    val r1 = pooled.indices.filter(pooled(_)._2 == 1).map(rank).sum
    val u1 = r1 - a.length.toLong * (a.length + 1) / 2.0
    assert(r.getLong(0) == a.length && r.getLong(1) == b.length)
    assert(math.abs(r.getDouble(2) - u1) < 1e-6,
      s"engine U=${r.getDouble(2)} naive U=$u1")
    // z: mean n1n2/2, tie-corrected variance
    val n = pooled.length.toDouble
    val ties3 = pooled.groupBy(_._1).values.map(_.length.toLong)
      .map(t => t * t * t - t).sum
    val varU = a.length.toDouble * b.length / 12.0 *
      ((n + 1) - ties3 / (n * (n - 1)))
    val z = (u1 - a.length.toDouble * b.length / 2.0) / math.sqrt(varU)
    assert(math.abs(r.getDouble(3) - z) < 1e-5,
      s"engine z=${r.getDouble(3)} naive z=$z")
  }

  test("stat_anova matches naive one-way F over event types") {
    val r = q("stat_anova").head()
    val groups = vals.values.toArray
    val k = groups.length; val n = groups.map(_.length).sum
    val grand = groups.flatten.sum / n
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => {
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum
    }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(r.getLong(0) == k && r.getLong(1) == n)
    assert(math.abs(r.getDouble(2) - ssb) < math.abs(ssb) * 1e-5 + 1e-3)
    assert(math.abs(r.getDouble(3) - ssw) < math.abs(ssw) * 1e-5 + 1e-3)
    assert(math.abs(r.getDouble(4) - f) < 1e-3,
      s"engine F=${r.getDouble(4)} naive F=$f")
    assert(r.getDouble(4) >= 0)
  }
}
