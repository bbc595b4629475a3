package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Canonicalization policy for hash-matched cross-engine output
  * (SURVEY.md §5.3). The driver compares hashes, not approximate values,
  * so no raw parallel float aggregate may ever be emitted:
  *
  *  - money/measure SUMs go through exact DECIMAL(18,6) (associative ⇒
  *    partial-aggregation order cannot change the result), then
  *    `round(_, 4)` and a cast back to DOUBLE;
  *  - means are decimal-sum / count in DOUBLE division (IEEE-identical
  *    across engines for identical operands);
  *  - scalar (non-aggregated) double arithmetic is IEEE-identical across
  *    engines and may be emitted raw.
  *
  * At 100 TB the same policy holds: decimal partial aggregation is
  * supported by HashAggregateExec with map-side combine, so determinism
  * costs no extra shuffle.
  */
object Canon {
  val Dec: DecimalType = DecimalType(18, 6)

  /** Exact decimal sum → round(4) → double. The canonical money SUM. */
  def moneySum(c: Column): Column = round(sum(c.cast(Dec)), 4).cast(DoubleType)

  /** Decimal sum (exact) kept un-rounded, as double — for ratios. */
  def decSum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Order-insensitive mean: exact decimal sum / count in double. */
  def meanOf(c: Column): Column =
    round(sum(c.cast(Dec)).cast(DoubleType) / count(lit(1)), 4).cast(DoubleType)

  /** round(4) → double for any post-aggregate scalar. */
  def round4(c: Column): Column = round(c, 4).cast(DoubleType)

  /** round(6) → double (similarity scores, norms). */
  def round6(c: Column): Column = round(c, 6).cast(DoubleType)
}
