package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized event-sequence analytics — the library form of the
  * `events_funnel` / `events_retention` queries (which pin one
  * configuration each for the oracle).
  *
  * Both APIs share the scale shape: ONE hash exchange keyed by the
  * entity feeds every window pass and the per-entity reduction —
  * Catalyst reuses the partitioning across the chained Window nodes and
  * the final groupBy, so an N-step funnel still moves each event row
  * exactly once. No event sequence is ever collected or sorted globally.
  */
object Funnel {

  /** Ordered-funnel conversion: for each prefix of `steps`, how many
    * entities completed it in strictly increasing `timeCol` order.
    * Step i's milestone is the earliest event of type `steps(i)` AFTER
    * the entity's step-(i−1) milestone (the standard unordered-window
    * funnel, no max-gap constraint).
    *
    * @return one row per step: (step: "stepK_<type>", users: long),
    *         ordered by step — counts are monotone non-increasing
    */
  def conversion(events: DataFrame, entityCol: String, typeCol: String,
      timeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(entityCol)
    val base = events.select(col(entityCol), col(typeCol), col(timeCol))
    val staged = steps.zipWithIndex.foldLeft(base) {
      case (df, (step, i)) =>
        val cond =
          if (i == 0) col(typeCol) === step
          else col(typeCol) === step && col(timeCol) > col(s"__t${i - 1}")
        df.withColumn(s"__t$i", min(when(cond, col(timeCol))).over(w))
    }
    val perEntity = staged.groupBy(col(entityCol)).agg(
      min(s"__t0").as("__t0"),
      steps.indices.drop(1).map(i => min(s"__t$i").as(s"__t$i")): _*)
    val counts = perEntity.agg(
      count(col("__t0")).as("__c0"),
      steps.indices.drop(1).map(i => count(col(s"__t$i")).as(s"__c$i")): _*)
    val rows: Seq[Column] = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(s"step${i + 1}_$step").as("step"),
        col(s"__c$i").as("users"))
    }
    counts.select(explode(array(rows: _*)).as("s"))
      .select(col("s.step").as("step"), col("s.users").as("users"))
      // order by the NUMERIC step index, not the label: "step10_x" sorts
      // lexicographically before "step2_x", which would silently break
      // the monotone-non-increasing contract for funnels of 10+ steps
      .orderBy(regexp_extract(col("step"), "^step([0-9]+)_", 1).cast("int"))
  }

  /** Cohort retention: entities grouped by first-active time bucket,
    * counted per offset of later activity. `bucketWidth` is the cohort
    * granularity and `offsetWidth` the retention granularity, both in
    * `timeCol` units (e.g. epoch-µs: day cohorts = 86 400 000 000).
    *
    * @return (cohort: long — first-activity bucket index, offset: long,
    *         users: long), ordered
    */
  def retention(events: DataFrame, entityCol: String, timeCol: String,
      bucketWidth: Long, offsetWidth: Long): DataFrame = {
    require(bucketWidth > 0 && offsetWidth > 0, "widths must be positive")
    val buckets = events
      .select(col(entityCol),
        // floor-div (times are non-negative epoch offsets; `/` on longs
        // would be double division)
        floor(col(timeCol).cast("long") / bucketWidth).cast("long").as("__b"))
      .distinct()
    buckets
      .withColumn("__cohort", min("__b").over(Window.partitionBy(entityCol)))
      .withColumn("__off",
        floor((col("__b") - col("__cohort")) * bucketWidth
          / offsetWidth).cast("long"))
      .groupBy(col("__cohort").as("cohort"), col("__off").as("offset"))
      .agg(countDistinct(col(entityCol)).as("users"))
      .orderBy("cohort", "offset")
  }
}
