package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native sequential-fold dot product over two `array<double>` columns.
  *
  * The higher-order-function form (`aggregate(zip_with(...))`) is
  * interpreted per element — at millions of candidate pairs it
  * dominates similarity workloads. This expression compiles to a tight
  * primitive loop under whole-stage codegen (~50x the HOF throughput)
  * while keeping the exact left-to-right summation order, so results
  * stay bit-identical to the fold and to the DuckDB oracle's
  * list_dot_product.
  *
  * Inputs must be non-null-element double arrays (embedding columns);
  * behavior on null elements is undefined by design — no per-element
  * branch in the hot loop. Mismatched lengths return null rather than
  * a plausible partial sum, so a schema bug upstream surfaces as
  * missing rows instead of silently wrong scores.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $sum = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $sum += $a.getDouble($i) * $b.getDouble($i);
          }
          ${ev.value} = $sum;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column entry point; casts inputs to array<double>. */
  def apply(a: Column, b: Column): Column =
    Shim.column(DotProduct(
      Shim.expression(a.cast("array<double>")),
      Shim.expression(b.cast("array<double>"))))
}
