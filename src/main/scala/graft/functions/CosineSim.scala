package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity between two
  * `array<float>` columns, computed in float64.
  *
  * This is the (b)-tier extension point from the build brief — a codegen
  * `Expression` rather than a Scala UDF: `doGenCode` emits one fused
  * Java loop (dot + both norms in a single pass over the arrays) that
  * inlines into whole-stage codegen with zero boxing, no Row
  * encode/decode, and no lambda dispatch per element — the costs that
  * made the interpreted `zip_with`+`aggregate` form 90× slower than
  * native engines (SURVEY.md §7.4, BASELINE.md knn row).
  *
  * Bit-compatibility contract: accumulation is sequential in index
  * order, double-precision, identical to both the SQL higher-order
  * fold (`aggregate(zip_with(...))`) and DuckDB's
  * `list_sum(list_transform(...))` — all three produce the same bits,
  * which the DuckDB oracle verifies end-to-end.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    // dot over the common prefix, norms over the FULL arrays — matching
    // the oracle's list_sum-over-whole-array norms for any dimensions
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble; i += 1 }
    var nx = 0.0
    i = 0
    while (i < xs.numElements()) { val x = xs.getFloat(i).toDouble; nx += x * x; i += 1 }
    var ny = 0.0
    i = 0
    while (i < ys.numElements()) { val y = ys.getFloat(i).toDouble; ny += y * y; i += 1 }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = (double) $a.getFloat($i); $nx += $x * $x;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  double $y = (double) $b.getFloat($i); $ny += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-level entry point: `cosine(col("a"), col("b"))`. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(CosineSim(bridge.expression(a), bridge.expression(b)))
  }
}
