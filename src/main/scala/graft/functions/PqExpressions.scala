package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Product-quantization asymmetric-distance scoring (the ADC step of
  * IVF-PQ): the query stays full-precision, the corpus vector is its
  * m-subspace code word, and the inner product is computed against the
  * RECONSTRUCTION — Σ_s q_s · codebook[s][code_s] — without ever
  * materializing it. One reference-object codebook
  * ([[PqSet]], m·ksub·dsub doubles) rides into codegen (the
  * [[CentroidSet]] pattern); per row the loop costs O(m·dsub)
  * multiplies — 64 for the default 8×8 layout, the same as one
  * full-precision dot, but against 4-bit codes the corpus side is
  * 64× smaller, which is the whole point at memory-bound scale.
  * Accumulation is sequential (s-major, then element order) so the
  * score is bit-reproducible across engines and partitionings. */
case class PqAdcDot(
    left: Expression,
    right: Expression,
    pq: PqSet)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_pq_adc_dot"

  override def nullSafeEval(q: Any, codes: Any): Any =
    PqSet.adcDot(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], pq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", pq, classOf[PqSet].getName)
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.PqSet.adcDot($q, $c, $ref);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}

/** Flat row-major PQ codebooks: subspace s, code k, element i at
  * w((s·ksub + k)·dsub + i). Serializable so it ships once per task as
  * a codegen reference object. */
final case class PqSet(m: Int, dsub: Int, ksub: Int,
    w: Array[Double]) extends Serializable

object PqSet {

  /** From [m][ksub][dsub] nested codebooks (IvfPq.trainCodebooks). */
  def fromCodebooks(cb: Seq[Seq[Seq[Double]]]): PqSet = {
    val m = cb.length
    require(m > 0, "empty codebook set")
    val ksub = cb.head.length
    val dsub = cb.head.head.length
    val w = new Array[Double](m * ksub * dsub)
    var s = 0
    while (s < m) {
      require(cb(s).length == ksub, s"subspace $s has ${cb(s).length} codes")
      var k = 0
      while (k < ksub) {
        val row = cb(s)(k)
        require(row.length == dsub, s"codebook ($s,$k) has dim ${row.length}")
        var i = 0
        while (i < dsub) {
          w((s * ksub + k) * dsub + i) = row(i)
          i += 1
        }
        k += 1
      }
      s += 1
    }
    PqSet(m, dsub, ksub, w)
  }

  /** Σ_s q[s·dsub ..] · codebook[s][codes[s]] — sequential fold. */
  def adcDot(q: ArrayData, codes: ArrayData, pq: PqSet): Double = {
    require(q.numElements() == pq.m * pq.dsub,
      s"query dim ${q.numElements()} != ${pq.m}×${pq.dsub}")
    require(codes.numElements() == pq.m,
      s"code word has ${codes.numElements()} entries, expected ${pq.m}")
    var acc = 0.0
    var s = 0
    while (s < pq.m) {
      val code = codes.getInt(s)
      val base = (s * pq.ksub + code) * pq.dsub
      val qBase = s * pq.dsub
      var i = 0
      while (i < pq.dsub) {
        acc += q.getDouble(qBase + i) * pq.w(base + i)
        i += 1
      }
      s += 1
    }
    acc
  }
}

object PqAdcDot {
  /** Column API: `q` array<double> (full dim), `codes` array<int>. */
  def apply(q: Column, codes: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    bridge.column(PqAdcDot(bridge.expression(q), bridge.expression(codes),
      PqSet.fromCodebooks(cb)))
}
