package graft.plans

import graft.functions.{HammingDist, JaccardSorted}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, If, IsNull, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule (the `Rule[LogicalPlan]` extension tier): algebraic
  * constant-fold of self-similarity.
  *
  * `jaccard_sorted(x, x)` is EXACTLY `|x|/|x| = 1.0` in IEEE double for
  * any non-empty x, `0/0 = NaN` for an empty x, and null for null x —
  * so the whole merge walk folds to a three-way conditional on inputs
  * that are semantically equal expressions. Self-pairs are a real shape
  * in dedup pipelines (self-joins before the `id_a < id_b` filter is
  * pushed through).
  *
  * `hamming_dist(x, x)` folds to exactly 0 (null-propagating) — every
  * byte position agrees with itself, no float involved.
  *
  * `cosine_sim(x, x)` is deliberately NOT folded: `dot(x,x)/(|x|·|x|)`
  * is only ≈1 in floating point (the sqrt round-trips), and this
  * engine's bit-compatibility contract forbids rewrites that change
  * emitted bits.
  */
object SelfSimilarityFold extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case JaccardSorted(a, b) if a.semanticEquals(b) && a.deterministic =>
        If(IsNull(a), Literal(null, DoubleType),
          If(EqualTo(Size(a, legacySizeOfNull = false), Literal(0)),
            Literal(Double.NaN), Literal(1.0)))
      case HammingDist(a, b) if a.semanticEquals(b) && a.deterministic =>
        If(IsNull(a), Literal(null, LongType), Literal(0L))
    }
}
