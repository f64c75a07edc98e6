package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions for the pairwise similarity hot path.
  *
  * Why custom (builder-brief preference order (b)): `zip_with` + `aggregate`
  * are higher-order functions — evaluated interpretively per row with a
  * lambda-variable box and an intermediate array allocation per pair. At
  * candidate-pair volume (N^2 inside blocks) that interpretation dominates.
  * This expression is a tight primitive loop and participates in whole-stage
  * codegen, with IDENTICAL exact-integer semantics to the composed form
  * (same values -> DuckDB oracles unchanged).
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // internal-use expression: callers guarantee array<long> inputs
  // (Similarity.quantize); no ExpectsInputTypes because AbstractDataType is
  // private[sql] outside the spark package
  override def dataType: DataType = LongType

  /** Contract: element arrays are non-null-element quantized vectors
    * (Similarity.quantize output); shorter length wins on mismatch.
    */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object Expressions {
  /** Exact-integer dot product of two array<long> columns (codegen'd). */
  def longArrayDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      LongArrayDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
