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

  /** Order-insensitive mean: exact decimal sum / count in double,
    * binary-value-rounded (the quotient is a DOUBLE — see binRound).
    */
  def meanOf(c: Column): Column =
    round4(sum(c.cast(Dec)).cast(DoubleType) / count(lit(1)))

  /** Binary-value rounding of a DOUBLE, matching DuckDB's
    * `std::round(x·10^n)/10^n` (half away from zero on the BINARY value).
    * Spark's own `round(double, n)` rounds the shortest-decimal repr
    * instead — for 47.253749999999996 Spark says 47.2538 ("47.25375"
    * HALF_UP) while DuckDB says 47.2537 — a hash mismatch that only
    * surfaces when a quotient lands on the repr boundary (hit once at
    * sf0.1). Use THIS for rounding doubles; use [[decRound4]] /
    * [[moneySum]] for decimals (exact, both engines agree natively).
    */
  private def binRound(c: Column, k: Double): Column =
    (when(c >= 0, floor(c * k + 0.5)).otherwise(-floor(-c * k + 0.5)) / k)
      .cast(DoubleType)

  /** round(4) → double for any post-aggregate DOUBLE scalar. */
  def round4(c: Column): Column = binRound(c, 1e4)

  /** round(6) → double (similarity scores, norms) — DOUBLE inputs. */
  def round6(c: Column): Column = binRound(c, 1e6)

  /** round(2) → double — DOUBLE inputs. */
  def round2(c: Column): Column = binRound(c, 1e2)

  /** Exact decimal round(4) → double, for DECIMAL-typed columns (window
    * sums): both engines round the exact decimal identically.
    */
  def decRound4(c: Column): Column = round(c, 4).cast(DoubleType)
}
