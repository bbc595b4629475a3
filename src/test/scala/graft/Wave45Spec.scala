package graft

import org.apache.spark.sql.functions._

/** Round-7 wave 45-46: Z-set retraction maintenance and the JL random
  * projection — invariants independent of the DuckDB oracle.
  */
class Wave45Spec extends SparkSpec {

  test("ivm_retract: signed-partial merge equals direct recompute") {
    val got = q("ivm_retract").collect()
    // direct recompute in Spark over surviving rows only
    val hash56 = operators.TextDedup.hash56 _
    val direct = Tables.table(spark, sfDir, "orders")
      .filter(!(hash56(concat(col("o_orderkey").cast("string"),
        lit("_del"))) % 20 === 1))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_live"),
        round(sum(col("o_totalprice").cast(Canon.Dec)), 4)
          .cast("double").as("total_price"))
      .orderBy("o_custkey")
      .collect()
    assert(got.length == direct.length)
    got.zip(direct).foreach { case (g, d) =>
      assert(g.getLong(0) == d.getLong(0))
      assert(g.getAs[Long]("n_live") == d.getAs[Long]("n_live"))
      assert(g.getAs[Double]("total_price") == d.getAs[Double]("total_price"))
    }
  }

  test("ivm_retract: some retractions actually happened") {
    val total = Tables.table(spark, sfDir, "orders").count()
    val live = q("ivm_retract").agg(sum("n_live")).head().getLong(0)
    assert(live < total, "the ~5% delete flag must be non-degenerate")
    assert(live > total * 8 / 10, "and must not delete most rows")
  }

  test("vec_random_projection: bitwise match vs a JVM brute force") {
    // independent re-derivation of the 56-bit hash parity (first 7
    // sha-256 bytes), NOT a call into the library under test
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def h56(s: String): Long = {
      val d = md.digest(s.getBytes("UTF-8"))
      (0 until 7).foldLeft(0L)((v, i) => (v << 8) | (d(i) & 0xffL))
    }
    val signs = Array.tabulate(8, 64)((j, i) =>
      if (h56(s"rp_${j}_$i") % 2 == 0) 1.0 else -1.0)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val emb = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    q("vec_random_projection").collect().foreach { r =>
      val v = emb(r.getAs[Long]("vec_id"))
      val ps = (0 until 8).map { j =>
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += signs(j)(i) * v(i).toDouble; i += 1 }
        acc
      }
      var n2 = 0.0
      v.foreach(x => n2 += x.toDouble * x.toDouble)
      (0 until 8).foreach(j =>
        assert(r.getAs[Double](s"p$j") == r6(ps(j)),
          s"p$j mismatch on vec ${r.getAs[Long]("vec_id")}"))
      assert(r.getAs[Double]("norm2") == r6(n2))
      var sp = 0.0
      ps.foreach(p => sp += p * p)
      assert(r.getAs[Double]("norm_ratio") == r6(sp / 8 / n2))
    }
  }

  test("vec_random_projection: JL norm preservation holds in aggregate") {
    val ratios = q("vec_random_projection")
      .agg(avg("norm_ratio"), count(lit(1))).head()
    val mean = ratios.getDouble(0)
    assert(ratios.getLong(1) > 0)
    // E[ratio] = 1; k = 8 gives wide per-vector variance but the mean
    // over hundreds of vectors concentrates
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
  }
}
