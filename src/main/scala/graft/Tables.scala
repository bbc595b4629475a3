package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Central fixture loader for the ten parquet tables (FIXTURES.md).
  *
  * Scale notes: every reader goes through `spark.read.parquet`, i.e. the
  * vectorized columnar scan. Column pruning and predicate pushdown are left
  * to Catalyst — query functions select/filter declaratively and the scan
  * node picks up `ReadSchema`/`PushedFilters` automatically, which is the
  * property that matters when the same query runs over 100 TB instead of a
  * single local file (partition pruning / row-group skipping compose with
  * the identical plan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table. `events.ts` is physically parquet
    * timestamp[ns], which Spark 4.x refuses by default
    * (PARQUET_TYPE_ILLEGAL); `nanosAsLong` reads it as epoch-nanos
    * LongType. Set lazily here so every events-touching query works under
    * the driver's vanilla session (Verify.scala does not set it).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Canonical epoch-µs derivation from whatever physical form the
    * fixture's `ts` column carries. The driver has shipped the events
    * table BOTH ways across rounds — parquet timestamp[ns] (read as
    * epoch-ns LONG under `nanosAsLong`) and plain timestamp[us] (read
    * as TIMESTAMP_NTZ) — so the engine branches on the resolved type
    * instead of assuming one. All sessions pin UTC, making the
    * NTZ→instant cast wall-clock-identical to DuckDB's `epoch_us(ts)`
    * on the same naive value. Branching is schema-time (plan-time), not
    * per-row: each branch is a plain codegen'd column expression.
    */
  def tsUsCol(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => expr("ts div 1000")
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
    case _                => unix_micros(col("ts"))
  }

  /** Pushdown-friendly `ts ∈ [fromUs, toUs)` predicate: comparisons are
    * against a CONSTANT of ts's own physical type (long or foldable
    * timestamp literal), so the parquet scan keeps min/max row-group
    * skipping — filtering on the derived `ts_us` expression instead
    * would hide the bound from the reader at 100 TB.
    */
  def tsRange(df: DataFrame, fromUs: Long, toUs: Long): Column =
    df.schema("ts").dataType match {
      case LongType =>
        col("ts") >= fromUs * 1000L && col("ts") < toUs * 1000L
      case TimestampNTZType =>
        col("ts") >= timestamp_micros(lit(fromUs)).cast(TimestampNTZType) &&
          col("ts") < timestamp_micros(lit(toUs)).cast(TimestampNTZType)
      case _ =>
        col("ts") >= timestamp_micros(lit(fromUs)) &&
          col("ts") < timestamp_micros(lit(toUs))
    }

  /** `events` with the canonical cross-engine time column: epoch
    * MICROseconds as long (≡ DuckDB `epoch_us(ts)` — verified
    * byte-equal, SURVEY.md §1.2), whatever the physical ts type.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    df.withColumn("ts_us", tsUsCol(df))
  }
}
