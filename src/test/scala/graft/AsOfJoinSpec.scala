package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._

/** Custom as-of operator: result parity with the window-function rewrite,
  * plan shape (custom exec + co-partitioned sorted children), strict vs
  * at-or-before semantics, and unmatched-row null extension.
  */
class AsOfJoinSpec extends SparkSpec {

  private def sides = {
    val e = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "signup"))
    (e.filter(col("event_type") === "signup")
       .select("user_id", "event_id", "ts_us"),
     e.filter(col("event_type") === "purchase")
       .select(col("user_id").as("p_user"), col("ts_us").as("p_ts")))
  }

  test("native as-of == window-function rewrite, row for row") {
    val native = q("join_asof_native")
    val rewrite = q("join_asof")
    assert(native.count() == rewrite.count())
    assert(native.exceptAll(rewrite).count() == 0
      && rewrite.exceptAll(native).count() == 0,
      "the two as-of implementations must agree exactly")
  }

  test("plan uses AsOfJoinExec over co-partitioned sorted children") {
    val (s, p) = sides
    val df = AsOfJoin.asofLeft(s, p, Seq("user_id" -> "p_user"), "ts_us", "p_ts")
    val plan0 = plan(df)
    assert(plan0.contains("AsOfJoin"), "custom exec must be planned")
    assert("hashpartitioning".r.findAllIn(plan0).size >= 2,
      "both sides must hash-partition on the join keys")
    assert("Sort \\(".r.findAllIn(plan0).size >= 2,
      "both sides must sort by (key, time)")
    assert(plan0.contains("PushedFilters"),
      "scan pushdown must survive under the custom node")
  }

  test("strict excludes same-instant rows; non-strict includes them") {
    val (s, p) = sides
    // self-join signups to signups: every row IS its own at-or-before
    // match under non-strict, and must NOT match itself under strict
    val sr = s.select(col("user_id").as("u2"), col("ts_us").as("t2"))
    val nonStrict = AsOfJoin.asofLeft(s, sr, Seq("user_id" -> "u2"),
      "ts_us", "t2", strict = false)
    assert(nonStrict.filter(col("t2") =!= col("ts_us")).count() == 0,
      "non-strict self as-of must match the row itself")
    assert(nonStrict.filter(col("t2").isNull).count() == 0)
    val strict = AsOfJoin.asofLeft(s, sr, Seq("user_id" -> "u2"),
      "ts_us", "t2", strict = true)
    assert(strict.filter(col("t2") === col("ts_us")).count() == 0,
      "strict self as-of must never match the same instant")
  }

  test("left rows without a match null-extend, none are dropped") {
    val (s, p) = sides
    val df = AsOfJoin.asofLeft(s, p, Seq("user_id" -> "p_user"), "ts_us", "p_ts")
    assert(df.count() == s.count(), "left-outer: every left row survives")
    val unmatched = df.filter(col("p_ts").isNull).count()
    // per-user earliest signup before any purchase exists in the fixture
    assert(unmatched > 0, "fixture should produce some unmatched signups")
    assert(df.filter(col("p_ts").isNull =!= col("p_user").isNull).count() == 0,
      "null extension must cover the whole right side")
  }
}
