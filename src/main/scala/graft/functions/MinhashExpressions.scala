package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native one-pass MinHash signature over pre-hashed shingles.
  *
  * Input: array<long> (one 64-bit hash per shingle, e.g. from the
  * built-in xxhash64). Output: array<long> of k per-permutation minima,
  * where permutation i is the splitmix64 finalizer applied to
  * h + GOLDEN·(i+1) — a standard way to derive k independent hash
  * functions from one base hash (splitmix64 constants from Steele et
  * al., "Fast Splittable Pseudorandom Number Generators", SPLASH'14;
  * same mixer as java.util.SplittableRandom).
  *
  * Replaces the built-in formulation
  * `array((0 until k).map(i => array_min(transform(sh, x =>
  * xxhash64(lit(i), x)))))` which makes k interpreted passes over the
  * shingle array and allocates k temporary arrays per row — measured
  * ~10× slower and GC-heavy at 32 concurrent tasks. Here: one pass,
  * one long[] allocation, inlined into WholeStageCodegen.
  */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val mins = MinhashSignature.compute(hs, k)
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      s"""
         |long[] $mins = graft.functions.MinhashSignature.compute($a, $k);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {

  private final val GOLDEN = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer. */
  @inline def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One pass over the hashes, k running minima. Called from both the
    * interpreted path and generated code. */
  def compute(hs: ArrayData, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = hs.numElements()
    var e = 0
    while (e < n) {
      val h = hs.getLong(e)
      var i = 0
      while (i < k) {
        val v = mix(h + GOLDEN * (i + 1))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      e += 1
    }
    mins
  }

  /** Column API: `hashes` must be array<long>. */
  def apply(hashes: Column, k: Int): Column =
    bridge.column(MinhashSignature(bridge.expression(hashes), k))
}

/** Fused shingles → MinHash → LSH band hashes in one native pass.
  *
  * Input: array<string> shingles. Output: array<long> of `bands` band
  * hashes, where band j is a mix over rows j·r..j·r+r-1 of the k=b·r
  * per-permutation minima (permutations derived as in MinhashSignature,
  * base hash = XXH64 of the shingle bytes, seed 42 like the xxhash64
  * built-in). Replaces three interpreted stages (transform-hash,
  * signature, transform-slice-hash banding) with one codegen'd loop —
  * the last interpreted stage that could serialize on an AQE-coalesced
  * single partition. */
case class MinhashBands(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_minhash_bands"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinhashBands.compute(input.asInstanceOf[ArrayData], bands, rows))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinhashBands.compute($a, $bands, $rows));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

object MinhashBands {

  def compute(shingles: ArrayData, bands: Int, rows: Int): Array[Long] = {
    val k = bands * rows
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var e = 0
    while (e < n) {
      val s = shingles.getUTF8String(e)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var i = 0
      while (i < k) {
        val v = MinhashSignature.mix(h + 0x9e3779b97f4a7c15L * (i + 1))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      e += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0x87c37b91114253d5L ^ bands
      var r = 0
      while (r < rows) {
        acc = MinhashSignature.mix(acc ^ mins(b * rows + r))
        r += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  def apply(shingles: Column, bands: Int, rows: Int): Column =
    bridge.column(MinhashBands(bridge.expression(shingles), bands, rows))
}
