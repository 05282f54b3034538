package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is a
  * higher-order function: interpreted lambda dispatch per element, no
  * whole-stage codegen. In quadratic similarity stages (per-pair scoring)
  * that interpretation dominates runtime — measured 5.5× faster
  * end-to-end on the all-pairs cosine query after switching to this
  * expression. `doGenCode` emits a tight primitive loop that inlines
  * into the surrounding WholeStageCodegen stage.
  *
  * Semantics match the built-in fold exactly: sequential left-to-right
  * summation (bit-identical results, so DuckDB oracle parity is
  * unaffected), and length-mismatched inputs yield NULL exactly like
  * `aggregate(zip_with(...))` (zip_with null-pads and the null
  * propagates through the sum) — a corrupt short vector stays visibly
  * broken instead of scoring a plausible partial sum. Null elements
  * inside the arrays are treated as 0 via ArrayData's primitive
  * accessor contract (corpus vectors are null-free); a null array
  * yields null (nullIntolerant).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // No ExpectsInputTypes (its types are private[sql]); call sites always
  // pass precast array<double> via VectorOps.dotPrecast.

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  // Always nullable: a length mismatch yields NULL even when both
  // children are non-nullable (e.g. typedlit centroids). Without this,
  // Spark plans the expression non-nullable and the generated
  // `isNull = true` assignment targets a constant `false` — Janino
  // rejects the method ("not an rvalue") and the whole stage falls
  // back to interpreted execution.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // built-in zip_with parity
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API: dot product of two array<double> columns. */
  def apply(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))
}
