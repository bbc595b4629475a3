package graft

import org.apache.spark.sql.functions._

/** Round-8 wave 92: Kruskal–Wallis H (grid-based global ranks) and the
  * temperature-mixture draw — brute-force recomputes and the policy
  * properties the oracles restate but don't explain.
  */
class Wave92Spec extends SparkSpec {

  test("stat_kruskal matches a plain Scala average-rank recompute " +
    "with tie correction") {
    val row = q("stat_kruskal").head()
    val (n, h, hTied) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    val vals = Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    assert(n == vals.length)
    // average ranks off the value grid
    val byC = vals.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sortedC = byC.keys.toArray.sorted
    val cums = sortedC.scanLeft(0L)((acc, c) => acc + byC(c)).tail
    val avgRank = sortedC.zip(cums).map { case (c, cum) =>
      c -> (cum - byC(c) / 2.0 + 0.5) }.toMap
    val groups = vals.groupBy(_._1)
    val s = groups.values.map { g =>
      val r = g.map(v => avgRank(v._2)).sum
      r * r / g.length
    }.sum
    val h0 = 12.0 / (n * (n + 1.0)) * s - 3 * (n + 1.0)
    val tsum = byC.values.map(t => t.toDouble * t * t - t).sum
    val corr = 1.0 - tsum / (n.toDouble * n * n - n)
    assert(math.abs(h - h0) < 2e-6, s"H: got $h, brute $h0")
    assert(math.abs(hTied - h0 / corr) < 2e-6,
      s"H': got $hTied, brute ${h0 / corr}")
    assert(h >= 0 && hTied >= h, "tie correction must not shrink H")
  }

  test("sample_temperature fills exactly floor(round6(weight)*200) " +
    "docs per source and upsamples the smallest source") {
    val got = q("sample_temperature").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perSource = got.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val toks = Tables.table(spark, sfDir, "documents")
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("t"),
        count(lit(1)).as("nd"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val raws = toks.map { case (s, t, _) => s -> math.pow(t, 0.7) }.toMap
    val z = raws.values.sum
    val quotas = raws.view.mapValues { r =>
      math.floor(math.floor(r / z * 1e6 + 0.5) / 1e6 * 200).toLong }.toMap
    toks.foreach { case (s, _, _) =>
      assert(perSource.getOrElse(s, 0L) == quotas(s),
        s"source $s: drew ${perSource.getOrElse(s, 0L)}, quota ${quotas(s)}")
    }
    // ranks are 1..quota (the hash draw fills, never skips)
    got.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to quotas(s)).toSeq)
    }
    // α = 0.7 < 1 upsamples: the smallest source's share of the draw
    // exceeds its token share
    val totalT = toks.map(_._2).sum
    val (smin, tmin, _) = toks.minBy(_._2)
    assert(quotas(smin).toDouble / quotas.values.sum >
      tmin.toDouble / totalT,
      "temperature draw failed to upsample the smallest source")
  }
}
