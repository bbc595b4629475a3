package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** `events` with the canonical cross-engine time column: epoch
    * MICROseconds as long (`ts div 1000` on the Spark side ≡ DuckDB
    * `epoch_us(ts)` — verified byte-equal, SURVEY.md §1.2).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events").withColumn("ts_us", expr("ts div 1000"))
}
