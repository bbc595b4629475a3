package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY.md §5.2.3 — property layer: algebraic invariants that need no
  * oracle, over fixture slices + ScalaCheck-generated inputs (fixed
  * seed — deterministic across runs).
  */
class PropertySpec extends SparkSpec {

  /** n deterministic samples from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("semi ∪ anti partitions customers for any priority filter") {
    val priorities =
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val customer = Tables.table(spark, sfDir, "customer")
    val orders = Tables.table(spark, sfDir, "orders")
    val total = customer.count()
    priorities.foreach { p =>
      val filt = orders.filter(col("o_orderpriority") === p)
      val semi = customer.join(filt,
        col("c_custkey") === col("o_custkey"), "left_semi").count()
      val anti = customer.join(filt,
        col("c_custkey") === col("o_custkey"), "left_anti").count()
      assert(semi + anti == total, s"priority $p")
    }
  }

  test("union count = sum of input counts for generated splits") {
    val orders = Tables.table(spark, sfDir, "orders")
    samples(Gen.choose(0.0, 500000.0), 5).foreach { cut =>
      val lo = orders.filter(col("o_totalprice") <= cut)
      val hi = orders.filter(col("o_totalprice") > cut)
      assert(lo.unionByName(hi).count() == orders.count())
    }
  }

  test("dedup group sizes sum to doc count for any hash prefix length") {
    val docs = Tables.table(spark, sfDir, "documents")
    samples(Gen.choose(4, 64), 5).foreach { n =>
      val grouped = docs
        .groupBy(substring(sha2(col("text"), 256), 1, n))
        .agg(count(lit(1)).as("c"))
      assert(grouped.agg(sum("c")).head().getLong(0) == docs.count())
    }
  }

  test("session islands are invariant to input row order") {
    // shuffle events (repartition scrambles order), sessionize, compare
    val base = q("win_session_batch").collect().map(_.toSeq).toSet
    val ev = Tables.events(spark, sfDir).repartition(13)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val redo = ev.select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("brk", when(col("ts_us") - lag("ts_us", 1).over(w)
        >= 30L * 60 * 1000 * 1000 || lag("ts_us", 1).over(w).isNull, 1L)
        .otherwise(0L))
      .withColumn("session_id", sum("brk").over(wRun))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("ts_us").as("start_us"),
        (max("ts_us") - min("ts_us")).as("duration_us"))
      .orderBy("user_id", "session_id")
      .collect().map(_.toSeq).toSet
    assert(redo == base)
  }

  test("minhash candidate jaccard scores lie in [0, 1]") {
    val df = q("dedup_minhash")
    assert(df.count() > 0)
    assert(df.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
  }
}
