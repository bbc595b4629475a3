package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One §2 operator group: a set of named query functions plus the DuckDB
  * oracle SQL for the hash-compare (SURVEY.md §2, §5.2.1). Query keys with
  * no oracle entry get the driver's weaker rows-only check (approx
  * sketches, streaming).
  */
trait QueryGroup {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
