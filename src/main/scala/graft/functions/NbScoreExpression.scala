package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Linear text-classifier inference — the scoring half of the
  * fastText-style seam (Joulin et al., "Bag of Tricks for Efficient
  * Text Classification", 2016): each whitespace token hashes to one of
  * `dim` buckets (the [[HashEmbedder]] md5h60 idiom under the distinct
  * `clf#` salt) and the document's raw score is the SUM of the bucket
  * weights — here integer-scaled Naive-Bayes log-odds trained by
  * [[graft.operators.NbClassifier]], but ANY broadcastable
  * `Array[Long]` of per-bucket weights scores through this expression
  * unchanged (a distilled linear probe, a logistic head over hashed
  * features, ...).
  *
  * Determinism & oracle parity: weights are pre-scaled BIGINTs, so the
  * per-document raw score is an EXACT integer sum — order-independent
  * where a double fold is not — and the one IEEE operation (the final
  * unscale division) happens once per document in both engines on
  * identical operands.
  *
  * Scale shape: one pass over the tokens per row, scan-side, codegen'd
  * — no explode, no per-token rows, no shuffle, and the model rides
  * along as one `dim`-long array per task (vs the per-(doc,bucket)
  * explode→groupBy→join formulation, which shuffles every token in the
  * corpus — see [[graft.operators.TextAnalysis.dsirTf]] for when that
  * shape IS wanted: deriving the model, not applying it). Token→weight
  * memoized (bounded) — Zipfian corpora re-score the same words
  * constantly.
  */
final class NbScorer(val dim: Int, val weights: Array[Long])
    extends Serializable {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(weights.length == dim,
    s"weights.length ${weights.length} != dim $dim")

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val MemoCap = 1 << 16

  private[functions] def tokenWeight(t: String): Long = {
    val cached = memo.get(t)
    if (cached != null) return cached
    val w = weights((HashEmbedder.md5h60("clf#" + t) % dim).toInt)
    if (memo.size < MemoCap) memo.put(t, w)
    w
  }

  /** Σ over whitespace tokens of the token's bucket weight. */
  def scoreRaw(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      acc += tokenWeight(toks(i))
      i += 1
    }
    acc
  }

  override def hashCode(): Int =
    31 * dim + java.util.Arrays.hashCode(weights)
  override def equals(o: Any): Boolean = o match {
    case e: NbScorer =>
      e.dim == dim && java.util.Arrays.equals(e.weights, weights)
    case _ => false
  }
}

/** BIGINT raw classifier score of a text column (scaled log-odds sum,
  * bias excluded — callers add the scaled bias and unscale once). */
case class NbScoreRaw(child: Expression, scorer: NbScorer)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_nb_score_raw"

  override def nullSafeEval(input: Any): Any =
    scorer.scoreRaw(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbScorer", scorer, classOf[NbScorer].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.scoreRaw($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): NbScoreRaw =
    copy(child = newChild)
}

object NbScoreRaw {
  def apply(text: Column, scorer: NbScorer): Column =
    bridge.column(NbScoreRaw(bridge.expression(text), scorer))
}

/** fastText's ACTUAL feature space — hashed unigrams PLUS adjacent
  * word-bigram features (Joulin et al. 2016 report the bigram bucket
  * is where most of the quality signal lives): each token contributes
  * its `clf#`-salted bucket weight and each adjacent pair its
  * `clf2#`-salted bucket weight, all in ONE shared `dim`-bucket weight
  * array (fastText's single hashing space — collisions are part of the
  * model in training AND inference, so they cancel cross-engine).
  * Same determinism/scale contract as [[NbScorer]]: exact BIGINT sum,
  * one pass, scan-side, codegen'd, bounded memo per feature kind. */
final class NbBigramScorer(val dim: Int, val weights: Array[Long])
    extends Serializable {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(weights.length == dim,
    s"weights.length ${weights.length} != dim $dim")

  // the unigram half IS an NbScorer (one salt/bucket/memo
  // implementation — the cross-engine gate depends on the two feature
  // spaces staying bit-identical to training, so there is exactly one
  // copy of that arithmetic to keep in sync)
  private val uni = new NbScorer(dim, weights)

  @transient private lazy val biMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val MemoCap = 1 << 16

  private def biWeight(g: String): Long = {
    val cached = biMemo.get(g)
    if (cached != null) return cached
    val w = weights((HashEmbedder.md5h60("clf2#" + g) % dim).toInt)
    if (biMemo.size < MemoCap) biMemo.put(g, w)
    w
  }

  /** Σ unigram bucket weights + Σ adjacent-bigram bucket weights. */
  def scoreRaw(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      acc += uni.tokenWeight(toks(i))
      if (i + 1 < toks.length) acc += biWeight(toks(i) + " " + toks(i + 1))
      i += 1
    }
    acc
  }

  override def hashCode(): Int =
    31 * (31 * dim + java.util.Arrays.hashCode(weights)) + 2
  override def equals(o: Any): Boolean = o match {
    case e: NbBigramScorer =>
      e.dim == dim && java.util.Arrays.equals(e.weights, weights)
    case _ => false
  }
}

/** BIGINT raw unigram+bigram classifier score (scaled log-odds sum,
  * bias excluded — same caller contract as [[NbScoreRaw]]). */
case class NbBigramScoreRaw(child: Expression, scorer: NbBigramScorer)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_nb_bigram_score_raw"

  override def nullSafeEval(input: Any): Any =
    scorer.scoreRaw(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbBigramScorer", scorer,
      classOf[NbBigramScorer].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.scoreRaw($t);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NbBigramScoreRaw = copy(child = newChild)
}

object NbBigramScoreRaw {
  def apply(text: Column, scorer: NbBigramScorer): Column =
    bridge.column(NbBigramScoreRaw(bridge.expression(text), scorer))
}
