package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into `private[sql]` surfaces — the route for
  * third-party Catalyst extensions when a SparkSessionExtensions
  * registration isn't possible (Verify/Bench's session construction is
  * driver-owned):
  *
  *  - Column ↔ Expression conversion (native expressions as Columns)
  *  - DataFrame from a custom LogicalPlan (custom operators)
  *  - runtime planner-strategy installation (experimental.extraStrategies)
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Catalyst predicate → V1 `sources.Filter` (None when the shape has
    * no source-filter form) — the translation the V1 pushdown path gets
    * for free from Spark; row-level SQL DML (UPDATE/MERGE intercepts)
    * arrives as Catalyst expressions and reuses it for the per-file
    * stats bands.
    */
  def translateFilter(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** Re-root a batch DataFrame as a STREAMING one (isStreaming=true on
    * the logical plan) over its compiled physical RDD — the V1
    * streaming `Source.getBatch` contract requires the returned frame
    * to be streaming, while keeping the batch plan's vectorized scan
    * (FileStreamSource's internalCreateDataFrame shape).
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** Re-root a STREAMING micro-batch DataFrame as a plain batch one
    * over its compiled physical RDD — the V1 `Sink.addBatch` contract
    * hands a streaming-planned frame whose logical plan cannot be
    * re-executed through batch writers; this is the
    * ForeachBatchSink/LogicalRDD shape (the exact frame foreachBatch
    * callers already receive).
    */
  def asBatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }

  /** Install a planner strategy on a live session (idempotent). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(s))
        exp.extraStrategies = exp.extraStrategies :+ s
    }
  }
}
