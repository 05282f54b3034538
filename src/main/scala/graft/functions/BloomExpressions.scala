package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership test as a native codegen'd expression — the
  * scan-side gate of [[graft.operators.Dedup.incrementalExactBloom]].
  * The filter rides into generated code as a reference object (the
  * CentroidSet pattern): constant-size generated code at any filter
  * size, and the bits ship to executors once per task, never as an
  * expression tree. Membership is tested against the raw UTF-8 bytes —
  * bit-compatible with how `DataFrameStatFunctions.bloomFilter` puts
  * string columns (both hash the UTF-8 encoding), pinned in
  * GraftFunctionsSpec. */
case class BloomContains(child: Expression, bloom: BloomHolder)
  extends UnaryExpression {

  // analysis-time enforcement of the string contract (ExpectsInputTypes'
  // type classes are private[sql]) — without it a non-string child
  // surfaces as a mid-job ClassCastException (or a Janino compile
  // failure under codegen)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(input: Any): Any =
    BloomHolder.contains(bloom, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomHolder", bloom,
      classOf[BloomHolder].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BloomHolder.contains($ref, $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

/** Serializable carrier for the sketch: serializes as the filter's own
  * compact `writeTo` byte form and rebuilds lazily on first use per
  * deserialized instance (executor-side). Rebuild races are benign —
  * the filter is read-only. */
final class BloomHolder private (
    @transient private var bf: BloomFilter,
    private val bytes: Array[Byte]) extends Serializable {

  private[functions] def filter: BloomFilter = {
    if (bf == null)
      bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    bf
  }
}

object BloomHolder {

  def apply(bf: BloomFilter): BloomHolder = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    new BloomHolder(bf, bos.toByteArray)
  }

  /** UTF-8-byte membership — matches putString/putBinary's encoding. */
  def contains(h: BloomHolder, v: UTF8String): Boolean =
    h.filter.mightContainBinary(v.getBytes)
}

object BloomContains {
  /** Column API: `c` must be a string column. Column-only by design —
    * a SQL literal can't carry the filter object. */
  def apply(c: Column, bloom: BloomFilter): Column =
    bridge.column(BloomContains(bridge.expression(c), BloomHolder(bloom)))
}
