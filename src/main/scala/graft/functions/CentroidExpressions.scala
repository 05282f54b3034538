package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** IVF coarse-quantizer cell assignment as one native expression.
  *
  * The compositional form (`array_min(array(struct(dist_i, i)...))` over
  * nlist literal centroid arrays) builds an nlist-wide expression tree:
  * at nlist=16 it already Janino-compiles slowly, and at a realistic
  * nlist (≥256) the tree is a codegen bomb. Here the centroid matrix
  * rides along as a reference object (same pattern as
  * [[HyperplaneBuckets]]) and one loop scans all cells:
  * O(nlist·dim) multiplies per row, constant-size generated code.
  *
  * Distance is the centroid-relative ||c||² − 2·v·c (the ||v||² term is
  * cell-independent so the argmin is unchanged); ties break on the
  * lowest cell index — both identical to the compositional form it
  * replaces, so cell assignments are bit-stable across the rewrite.
  */
case class CentroidAssign(
    child: Expression,
    centroids: CentroidSet)
  extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_ivf_assign"

  override def nullSafeEval(input: Any): Any =
    CentroidSet.assign(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids,
      classOf[CentroidSet].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CentroidSet.assign($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidAssign =
    copy(child = newChild)
}

/** The `nprobe` nearest cells (ascending by distance, ties → lowest
  * index) as `array<int>` — the query-side probe list, one loop. */
case class CentroidNearest(
    child: Expression,
    centroids: CentroidSet,
    nprobe: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_ivf_probes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CentroidSet.nearest(input.asInstanceOf[ArrayData], centroids, nprobe))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids,
      classOf[CentroidSet].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CentroidSet.nearest($a, $ref, $nprobe));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidNearest =
    copy(child = newChild)
}

/** The centroid VECTOR of a cell id as `array<double>` — the lookup
  * residual-PQ needs on both sides: encode subtracts it from the raw
  * vector, probe adds its query dot back into the ADC score. One
  * array copy per row, no shuffle, reference-object codegen. */
case class CentroidVec(
    child: Expression,
    centroids: CentroidSet)
  extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_ivf_centroid"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CentroidSet.row(input.asInstanceOf[Int], centroids))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids,
      classOf[CentroidSet].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CentroidSet.row($c, $ref));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidVec =
    copy(child = newChild)
}

/** Flat row-major centroid matrix with precomputed ||c||² per cell.
  * Serializable so it ships to executors once per task as a codegen
  * reference object, never as an expression tree. */
final case class CentroidSet(nlist: Int, dim: Int,
    w: Array[Double], normSq: Array[Double]) extends Serializable

object CentroidSet {

  def fromRows(centroids: Seq[Seq[Double]]): CentroidSet = {
    val nlist = centroids.length
    val dim = centroids.head.length
    val w = new Array[Double](nlist * dim)
    val normSq = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val row = centroids(c)
      require(row.length == dim, s"centroid $c has dim ${row.length}, expected $dim")
      var i = 0
      var s = 0.0
      while (i < dim) {
        val x = row(i)
        w(c * dim + i) = x
        s += x * x
        i += 1
      }
      normSq(c) = s
      c += 1
    }
    CentroidSet(nlist, dim, w, normSq)
  }

  /** Relative squared distance of `emb` to cell `c`: ||c||² − 2·v·c. */
  private def relDist(emb: ArrayData, s: CentroidSet, c: Int): Double = {
    var dotVC = 0.0
    val base = c * s.dim
    var i = 0
    while (i < s.dim) { dotVC += emb.getDouble(i) * s.w(base + i); i += 1 }
    s.normSq(c) - 2.0 * dotVC
  }

  /** The centroid row of cell `c` (defensive copy — GenericArrayData
    * must own its backing array). */
  def row(c: Int, s: CentroidSet): Array[Double] = {
    require(c >= 0 && c < s.nlist, s"cell $c out of range [0, ${s.nlist})")
    val out = new Array[Double](s.dim)
    System.arraycopy(s.w, c * s.dim, out, 0, s.dim)
    out
  }

  def assign(emb: ArrayData, s: CentroidSet): Int = {
    require(emb.numElements() == s.dim,
      s"embedding dim ${emb.numElements()} does not match centroid dim ${s.dim}")
    var best = 0
    var bestD = relDist(emb, s, 0)
    var c = 1
    while (c < s.nlist) {
      val d = relDist(emb, s, c)
      if (d < bestD) { bestD = d; best = c } // strict < keeps lowest index on ties
      c += 1
    }
    best
  }

  def nearest(emb: ArrayData, s: CentroidSet, nprobe: Int): Array[Int] = {
    require(emb.numElements() == s.dim,
      s"embedding dim ${emb.numElements()} does not match centroid dim ${s.dim}")
    val k = math.min(nprobe, s.nlist)
    val dists = new Array[Double](s.nlist)
    var c = 0
    while (c < s.nlist) { dists(c) = relDist(emb, s, c); c += 1 }
    // selection of k smallest (nlist is small — hundreds); ties → lowest index
    val out = new Array[Int](k)
    val taken = new Array[Boolean](s.nlist)
    var j = 0
    while (j < k) {
      var best = -1
      var bestD = Double.MaxValue
      var i = 0
      while (i < s.nlist) {
        if (!taken(i) && (best == -1 || dists(i) < bestD)) { best = i; bestD = dists(i) }
        i += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    out
  }
}

object CentroidAssign {
  /** Column API: `emb` must be array<double>. */
  def apply(emb: Column, centroids: Seq[Seq[Double]]): Column =
    bridge.column(CentroidAssign(bridge.expression(emb), CentroidSet.fromRows(centroids)))
}

object CentroidNearest {
  /** Column API: `emb` must be array<double>. */
  def apply(emb: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    bridge.column(CentroidNearest(bridge.expression(emb),
      CentroidSet.fromRows(centroids), nprobe))
}

object CentroidVec {
  /** Column API: `cell` must be int. */
  def apply(cell: Column, centroids: Seq[Seq[Double]]): Column =
    bridge.column(CentroidVec(bridge.expression(cell),
      CentroidSet.fromRows(centroids)))
}
