package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: Jaccard similarity of two SORTED distinct
  * `array<long>` columns via a linear merge walk.
  *
  * Same (b)-tier extension rationale as [[CosineSim]]: the merge walk was
  * previously a Scala UDF, which pays per-call Row↔JVM conversion (each
  * ArrayData copied into a boxed Seq) and blocks whole-stage codegen at
  * the rescore site — measurable on the ~10⁵–10⁶ candidate pairs the
  * dedup operators rescore per sf0.1 run. `doGenCode` emits the walk
  * directly over the two `ArrayData` buffers (getLong, no allocation),
  * so the filter+project stage around it stays one codegen span.
  *
  * PRECONDITION (callers: dedup_jaccard / dedup_minhash via
  * [[graft.operators.LlmText.sigTable]]): both arrays sorted ascending,
  * duplicate-free. The division is double inter/union — IEEE-identical
  * to the oracle's `len(...)/CAST(len(...) AS DOUBLE)`.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaccard_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val na = xs.numElements()
    val nb = ys.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = ((double) $inter) / ((double) ($na + $nb - $inter));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

object JaccardSorted {
  /** Column-level entry point: `jaccard(col("a"), col("b"))`. */
  def jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(JaccardSorted(bridge.expression(a), bridge.expression(b)))
  }
}
