package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the (c)-tier whole-operator extension from the
  * build brief: a custom `LogicalPlan` node, a `SparkStrategy`, and a
  * physical `BinaryExecNode`, because no composition of built-in
  * operators expresses "latest right row at or before each left row" as
  * ONE pass (the window-function rewrite in `join_asof` materializes a
  * union of both streams through a RANGE frame; pandas-on-Spark's
  * merge_asof goes through a broadcast copy of the full right side).
  *
  * Physical semantics — the 100 TB plan:
  *  - both sides hash-partition on the join keys (co-partitioned
  *    exchanges; partition count pinned so AQE cannot coalesce the two
  *    sides differently),
  *  - each side sorts by (keys, time) — map-side spillable sort,
  *  - one linear merge walk per partition pair: the right pointer only
  *    moves forward, holding ONE buffered row (the latest candidate), so
  *    memory per task is O(1) regardless of group size — no per-key
  *    right-side buffering, no window state.
  *
  * Join type is left-outer (unmatched left rows null-extend the right
  * side), `strict` selects `right.time < left.time` vs `<=`. Null keys
  * and null times never match, mirroring SQL comparison semantics and
  * DuckDB's `ASOF LEFT JOIN` (the oracle for `join_asof_native`).
  *
  * Tie semantics: among right rows sharing the winning (key, time), the
  * one last in sort order is kept. Which physical row that is, is only
  * deterministic up to the sort key — like every engine's as-of join,
  * payload columns of exactly-tied right rows are an arbitrary choice;
  * emit the time itself (or make time unique) when hash-stable output
  * is required.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinNode → AsOfJoinExec. Installed either at
  * session build time (GraftExtensions.injectPlannerStrategy) or on a
  * live session via `bridge.addStrategy` (the Verify/Bench route).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, strict) =>
      AsOfJoinExec(lk, rk, lt, rt, strict, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // pin the partition count on BOTH sides: zipPartitions needs the two
  // shuffles to stay aligned, so AQE must not coalesce them apart (the
  // same trick stateful streaming operators use)
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(leftKeys, requiredNumPartitions = n) ::
      ClusteredDistribution(rightKeys, requiredNumPartitions = n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val boundLeftTime = BindReferences.bindReference(leftTime, lOut)
    val boundRightTime = BindReferences.bindReference(rightTime, rOut)
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val timeType = leftTime.dataType
    val strictLocal = strict
    val rWidth = rOut.size

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rWidth)

        // right cursor state: the NEXT right row not yet consumed, plus
        // the latest candidate row seen (lastMatch) and its key
        var rKey: UnsafeRow = null
        var rTime: Any = null
        var rRow: InternalRow = null
        var exhausted = !rIter.hasNext
        def advance(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            rKey = rKeyProj(r).copy()
            rTime = boundRightTime.eval(r)
            rRow = r.copy()
          } else { exhausted = true; rKey = null; rTime = null; rRow = null }
        if (!exhausted) advance()

        var lastMatch: InternalRow = null
        var lastMatchKey: UnsafeRow = null

        lIter.map { l =>
          val lKey = lKeyProj(l)
          val lTime = boundLeftTime.eval(l)
          if (!lKey.anyNull && lTime != null) {
            // move the right cursor past every row that is (a) on an
            // earlier key or (b) on this key and within the time bound;
            // the last such row with a non-null usable key/time becomes
            // the candidate
            var continue = !exhausted
            while (continue) {
              val c = keyOrd.compare(rKey, lKey)
              val within = c < 0 || (c == 0 && rTime != null && {
                val t = timeOrd.compare(rTime, lTime)
                if (strictLocal) t < 0 else t <= 0
              })
              // null right time sorts first within its key; consume it
              // without recording a candidate
              val consumeNull = c <= 0 && rTime == null
              if (within || consumeNull) {
                if (within && !rKey.anyNull && rTime != null) {
                  lastMatch = rRow
                  lastMatchKey = rKey
                }
                advance()
                continue = !exhausted
              } else continue = false
            }
            if (lastMatch != null && lastMatchKey != null
                && keyOrd.compare(lastMatchKey, lKey) == 0)
              joined(l, lastMatch)
            else joined(l, nullRight)
          } else joined(l, nullRight)
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API. Right-side columns are re-aliased internally so
  * the node's two outputs can never share attribute ids (both sides of
  * an as-of join frequently derive from the same source relation, and a
  * custom node is invisible to the analyzer's DeduplicateRelations).
  */
object AsOfJoin {

  /** Left as-of join: every `left` row, extended with the latest `right`
    * row of the same keys whose `rightTimeCol` is before (`strict`) or
    * at-or-before (`!strict`) `leftTimeCol`; null-extended when none.
    */
  def asofLeft(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], leftTimeCol: String, rightTimeCol: String,
      strict: Boolean = true): DataFrame = {
    val spark: SparkSession = left.sparkSession
    org.apache.spark.sql.graft.bridge.addStrategy(spark, AsOfJoinStrategy)
    // fresh exprIds for every right column (same names)
    val r = right.select(right.columns.map(c => right(c).as(c)).toSeq: _*)
    val lPlan = analyzed(left)
    val rPlan = analyzed(r)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    val node = AsOfJoinNode(lPlan, rPlan,
      keys.map { case (l, _) => attr(lPlan, l) },
      keys.map { case (_, rn) => attr(rPlan, rn) },
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol), strict)
    org.apache.spark.sql.graft.bridge.ofRows(spark, node)
  }

  private def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
