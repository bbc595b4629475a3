package graft

import graft.operators.Knn
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-8 wave 89: max-inner-product retrieval (norm-pruned, exact)
  * and the Spearman monotone-trend test — the claims the oracles can't
  * check: MIPS ≡ brute force on a magnitude-spread set where pruning
  * actually bites, the prune rate itself, and Spearman against a plain
  * Scala recompute plus its ±1 extremes.
  */
class Wave89Spec extends SparkSpec {

  private def brute(queries: DataFrame, index: DataFrame, k: Int) = {
    val ix = index.select(col("vec_id").as("idx_id"), col("embedding").as("ie"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    ix.join(broadcast(q), col("q_id") =!= col("idx_id"))
      .select(col("q_id"), col("idx_id"),
        Canon.round6(graft.functions.DotProduct.dot(col("qe"), col("ie")))
          .as("dot"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("dot").desc, col("idx_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("idx_id"), col("dot"))
  }

  /** Deterministic mixed-magnitude set: every 10th vector scaled ×6 —
    * the regime where MIPS differs from cosine and norm pruning bites.
    */
  private def mixed(): DataFrame = {
    val rows = (0 until 240).map { id =>
      val base = (0 until 8).map(j =>
        (((id * 31 + j * 17) % 13) - 6).toFloat / 6f)
      val s = if (id % 10 == 0) 6f else 1f
      Row(id.toLong, base.map(_ * s))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
  }

  test("mipsSearch equals brute force on the fixture AND on a " +
    "magnitude-spread set (where the bound is actually exercised)") {
    val emb = Tables.table(spark, sfDir01, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
    assert(Knn.mipsSearch(q, emb, k = 5).orderBy("q_id", "rank")
      .collect().toSeq ==
      brute(q, emb, 5).orderBy("q_id", "rank").collect().toSeq)
    val mx = mixed()
    val mq = mx.filter(col("vec_id") % 50 === 0)
    assert(Knn.mipsSearch(mq, mx, k = 5, m = 16).orderBy("q_id", "rank")
      .collect().toSeq ==
      brute(mq, mx, 5).orderBy("q_id", "rank").collect().toSeq)
  }

  test("the Cauchy-Schwarz bound prunes most of a magnitude-spread " +
    "index before any dot is computed") {
    val mx = mixed()
    val dot = graft.functions.DotProduct.dot _
    val ix = mx.select(col("vec_id").as("idx_id"), col("embedding").as("ie"))
      .withColumn("n2", dot(col("ie"), col("ie")))
    val q = mx.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .withColumn("qn2", dot(col("qe"), col("qe")))
    val seed = ix.orderBy(col("n2").desc, col("idx_id")).limit(16)
    val tau = broadcast(seed).join(q, col("q_id") =!= col("idx_id"))
      .groupBy(col("q_id").as("tq"))
      .agg(element_at(sort_array(collect_list(
        dot(col("qe"), col("ie"))), asc = false), 5).as("tau"))
    val admitted = ix.join(
        broadcast(q.join(tau, col("q_id") === col("tq"), "left").drop("tq")),
        col("q_id") =!= col("idx_id"))
      .filter(col("tau").isNull || col("tau") - 1e-6 <= 0 ||
        col("n2") * col("qn2") >=
          (col("tau") - 1e-6) * (col("tau") - 1e-6) * (1 - 1e-9))
      .count()
    val all = 5L * 239 // 5 queries x (240 - self)
    assert(admitted * 2 < all,
      s"bound admitted $admitted of $all scored pairs — pruning inert")
  }

  test("stat_spearman matches a plain Scala average-rank recompute " +
    "per user and hits ±1 on strictly monotone synthetic series") {
    val got = q("stat_spearman").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.nonEmpty && got.values.forall { case (_, rho) =>
      rho >= -1.0 && rho <= 1.0 })
    // brute recompute for every user straight off the fixture rows
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    def avgRanks(xs: Seq[Double]): Seq[Double] = {
      val sorted = xs.sorted.zipWithIndex
      val byV = sorted.groupBy(_._1).map { case (v, g) =>
        v -> g.map(_._2 + 1).sum.toDouble / g.size }
      xs.map(byV)
    }
    ev.foreach { case (u, rows) =>
      val n = rows.size
      if (n >= 30) {
        val rx = avgRanks(rows.map(_._2.toDouble).toSeq)
        val ry = avgRanks(rows.map(_._3).toSeq)
        val mx = rx.sum / n
        val my = ry.sum / n
        val num = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
        val dx = rx.map(a => (a - mx) * (a - mx)).sum
        val dy = ry.map(b => (b - my) * (b - my)).sum
        if (dx > 0 && dy > 0) {
          val rho = num / (math.sqrt(dx) * math.sqrt(dy))
          val (gn, grho) = got(u)
          // the query emits round6(rho); allow the brute double its
          // half-quantum on either side of the rounded value
          assert(gn == n && math.abs(grho - rho) < 5.01e-7,
            s"user $u: got ($gn, $grho), brute ($n, $rho)")
        } else assert(!got.contains(u))
      } else assert(!got.contains(u))
    }
    // monotone extremes through the SAME centered-rank algebra
    def rhoOf(vs: Seq[Double]): Double = {
      val ts = vs.indices.map(_.toDouble)
      val rx = avgRanks(ts)
      val ry = avgRanks(vs)
      val n = vs.size
      val num = rx.zip(ry).map { case (a, b) =>
        (a - (n + 1) / 2.0) * (b - (n + 1) / 2.0) }.sum
      val dx = rx.map(a => math.pow(a - (n + 1) / 2.0, 2)).sum
      val dy = ry.map(b => math.pow(b - (n + 1) / 2.0, 2)).sum
      num / (math.sqrt(dx) * math.sqrt(dy))
    }
    assert(math.abs(rhoOf((1 to 50).map(_.toDouble * 2)) - 1.0) < 1e-12)
    assert(math.abs(rhoOf((1 to 50).map(i => -i.toDouble)) + 1.0) < 1e-12)
  }
}
