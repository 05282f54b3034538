package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Centered mat-vec projection as one native expression: for each of
  * the k component rows, y_j = Σ_i (x_i − mean_i)·w_{j,i}, accumulated
  * in coordinate order (i = 0…dim−1) so the DuckDB oracle's
  * sequential list_sum reproduces the bits exactly. The (mean, W)
  * pair rides along as a reference object (the [[CentroidSet]]
  * pattern) — constant-size generated code at any k. */
case class PcaProject(
    child: Expression,
    pca: PcaSet)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_pca_project"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(PcaSet.project(input.asInstanceOf[ArrayData], pca))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pcaSet", pca, classOf[PcaSet].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PcaSet.project($a, $ref));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PcaProject =
    copy(child = newChild)
}

/** Flat row-major component matrix (k × dim) + mean — serializable so
  * it ships once per task as a codegen reference object. */
final case class PcaSet(k: Int, dim: Int, mean: Array[Double],
    w: Array[Double]) extends Serializable

object PcaSet {

  def fromModel(mean: Seq[Double], components: Seq[Seq[Double]]): PcaSet = {
    val dim = mean.length
    val k = components.length
    val w = new Array[Double](k * dim)
    var j = 0
    while (j < k) {
      val row = components(j)
      require(row.length == dim, s"component $j has dim ${row.length}, expected $dim")
      var i = 0
      while (i < dim) { w(j * dim + i) = row(i); i += 1 }
      j += 1
    }
    PcaSet(k, dim, mean.toArray, w)
  }

  def project(x: ArrayData, s: PcaSet): Array[Double] = {
    require(x.numElements() == s.dim,
      s"vector dim ${x.numElements()} != trained dim ${s.dim}")
    val out = new Array[Double](s.k)
    var j = 0
    while (j < s.k) {
      var acc = 0.0
      var i = 0
      val base = j * s.dim
      while (i < s.dim) {
        acc += (x.getDouble(i) - s.mean(i)) * s.w(base + i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    out
  }
}

object PcaProject {
  def apply(emb: Column, mean: Seq[Double],
      components: Seq[Seq[Double]]): Column =
    bridge.column(PcaProject(bridge.expression(emb),
      PcaSet.fromModel(mean, components)))
}
