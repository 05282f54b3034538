package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash fingerprint (base 31 mod 1e9+7) over the
  * printable-ASCII chars of a document, as ONE codegen'd scalar.
  *
  * Replaces the interpreted `aggregate(transform(sequence(1, len), i →
  * ascii(substr(i))))` formulation, which materialized a per-character
  * array per document and evaluated the fold through the higher-order
  * interpreter — the same expression class that cost 82 s → 3 s when
  * SimHash went native ([[SimHash64]]). This is a tight per-row byte
  * loop inside WholeStageCodegen with zero allocation.
  *
  * Bit-exact with the old form (proven in NativeExprEquivalenceSpec),
  * including its asciiOnly pre-projection: filtering bytes to
  * 0x20..0x7E is identical to `regexp_replace(text, "[^ -~]", "")`
  * because every byte of a multi-byte UTF-8 char is ≥ 0x80 — so the
  * regexp stage disappears into the same loop. Left fold with zero
  * init: f(0, c) = c, matching DuckDB's `list_reduce` first-element
  * init; the accumulator stays < 2^35, no overflow.
  */
case class RollingFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_rolling_fp"

  override def nullSafeEval(input: Any): Any =
    RollingFp.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.RollingFp.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(child = newChild)
}

object RollingFp {

  final val Mod = 1000000007L
  final val Base = 31L

  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (b >= 0x20 && b <= 0x7E) acc = (acc * Base + b) % Mod
      i += 1
    }
    acc
  }

  def apply(text: Column): Column =
    bridge.column(RollingFp(bridge.expression(text)))
}
