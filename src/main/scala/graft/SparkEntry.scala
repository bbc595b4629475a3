package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator group's queries + oracle SQL into the flat
  * maps the driver consumes. One key per SURVEY.md §2 operator; keys with
  * no oracle entry get the driver's weaker rows-only check.
  */
object SparkEntry {
  /** All §2 operator groups. Order is cosmetic (maps are flat). */
  def groups: Seq[QueryGroup] = Seq(
    operators.Scans,
    operators.Aggregates,
    operators.Joins,
    operators.SortsSets,
    operators.Windows,
    operators.Functions,
    operators.LlmText,
    operators.LlmVectors,
    operators.Udfs,
    operators.Streaming,
    operators.Telemetry,
    operators.Spatial,
    operators.Stats,
    operators.Analytics,
    operators.DataEng,
    operators.Corpus,
    operators.Reporting,
    operators.Tpch,
    operators.ManifestOps
  )

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracle).toMap
}
