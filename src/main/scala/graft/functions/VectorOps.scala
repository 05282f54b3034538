package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Catalyst
  * expressions (`zip_with`/`aggregate` — codegen'd, no UDFs, no
  * serialization off the Tungsten format).
  *
  * All math is done in double: float inputs are cast element-wise first,
  * and the fold is a deterministic left-to-right sum, so results are
  * bit-reproducible across engines (the DuckDB oracles compute the same
  * index-ordered sum).
  */
object VectorOps {

  def toDoubleVec(v: Column): Column = transform(v, _.cast("double"))

  /** Left-fold dot product; inputs must be same-length numeric arrays. */
  def dot(a: Column, b: Column): Column =
    dotPrecast(toDoubleVec(a), toDoubleVec(b))

  /** Dot product over arrays already cast to double — use in quadratic
    * (per-pair) stages so the element casts run once per vector, not
    * once per pair. Backed by the native codegen'd DotProduct expression
    * (same left-fold semantics as the aggregate/zip_with form, ~5× faster
    * in the hot loop). */
  def dotPrecast(a: Column, b: Column): Column = DotProduct(a, b)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity with zero-norm guard (0.0 for degenerate vectors). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(d / denom)
  }

  /** Cosine given precomputed norms — at scale, norms are computed once
    * per vector (linear) instead of once per pair (quadratic). */
  def cosinePrenormed(dotAb: Column, normA: Column, normB: Column): Column = {
    val denom = normA * normB
    when(denom === 0.0, lit(0.0)).otherwise(dotAb / denom)
  }
}
