package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All LSH hyperplane bucket ids in one native pass.
  *
  * The compositional form builds nTables×nPlanes separate DotProduct
  * expressions against nTables×nPlanes `typedlit` arrays — a huge
  * expression tree whose Janino compilation alone costs seconds per
  * query. Here the full plane matrix rides along as a plain case-class
  * constant (not an expression child), and one loop computes every
  * sign bit: O(tables·planes·dim) multiplies, one long[] out.
  *
  * Output: array<long> of length nTables — bucket id per table (bit p
  * set iff v·plane_p > 0). Bit-for-bit the same buckets as the
  * compositional form (same dot ordering, same strict > 0 test).
  */
case class HyperplaneBuckets(
    child: Expression,
    planes: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_lsh_buckets"

  @transient private lazy val flat: HyperplaneBuckets.Flat =
    HyperplaneBuckets.flatten(planes)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], flat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("lshFlat", flat,
      classOf[HyperplaneBuckets.Flat].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.HyperplaneBuckets.compute($a, $flatRef));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  // Array-typed constructor params break case-class equality; identity
  // semantics are fine for a literal-plane expression.
}

object HyperplaneBuckets {

  /** Flattened plane matrix (row-major) for cache-friendly loops. */
  final case class Flat(nTables: Int, nPlanes: Int, dim: Int,
      w: Array[Double]) extends Serializable

  def flatten(planes: Array[Array[Array[Double]]]): Flat = {
    val nTables = planes.length
    val nPlanes = planes(0).length
    val dim = planes(0)(0).length
    val w = new Array[Double](nTables * nPlanes * dim)
    var t = 0
    while (t < nTables) {
      var p = 0
      while (p < nPlanes) {
        System.arraycopy(planes(t)(p), 0, w, (t * nPlanes + p) * dim, dim)
        p += 1
      }
      t += 1
    }
    Flat(nTables, nPlanes, dim, w)
  }

  def compute(emb: ArrayData, f: Flat): Array[Long] = {
    val n = emb.numElements()
    require(n == f.dim,
      s"embedding dim $n does not match hyperplane dim ${f.dim} — " +
        "buckets would be silently wrong; pass the correct dim when " +
        "building the LSH tables")
    val out = new Array[Long](f.nTables)
    var t = 0
    while (t < f.nTables) {
      var bucket = 0L
      var p = 0
      while (p < f.nPlanes) {
        val base = (t * f.nPlanes + p) * f.dim
        var s = 0.0
        var i = 0
        while (i < n) { s += emb.getDouble(i) * f.w(base + i); i += 1 }
        if (s > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  /** Column API: `emb` must be array<double>. */
  def apply(emb: Column, planes: Array[Array[Array[Double]]]): Column =
    bridge.column(HyperplaneBuckets(bridge.expression(emb), planes))
}
