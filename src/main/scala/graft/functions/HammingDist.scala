package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Hamming distance between two strings —
  * the number of byte positions at which they differ, plus the length
  * difference when they are unequal-length (so the distance stays a
  * metric instead of silently ignoring a tail).
  *
  * Same (b)-tier extension rationale as [[CosineSim]] /
  * [[JaccardSorted]]: the rescore site of `dedup_prefix_hamming` sits
  * inside a candidate join's filter, where a Scala UDF would box both
  * UTF8Strings per pair and break the codegen span. `doGenCode` walks
  * the two byte arrays directly; on the ASCII fixture corpus byte
  * positions ARE character positions, which keeps the result identical
  * to a character-level definition (and to DuckDB's `hamming`, which
  * requires equal lengths — callers pad to a fixed width first).
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType

  override def prettyName: String = "hamming_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[UTF8String].getBytes
    val ys = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(xs.length, ys.length)
    var i = 0
    var d = math.abs(xs.length - ys.length).toLong
    while (i < n) {
      if (xs(i) != ys(i)) d += 1L
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |byte[] $xs = $a.getBytes();
         |byte[] $ys = $b.getBytes();
         |int $n = Math.min($xs.length, $ys.length);
         |long $d = Math.abs($xs.length - $ys.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xs[$i] != $ys[$i]) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
}

object HammingDist {
  /** Column-level entry point: `hamming(col("a"), col("b"))`. */
  def hamming(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(HammingDist(bridge.expression(a), bridge.expression(b)))
  }
}
