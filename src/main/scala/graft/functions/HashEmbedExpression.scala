package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Feature-hash text embedding — the public "hashing trick"
  * (Weinberger et al., "Feature Hashing for Large Scale Multitask
  * Learning", ICML 2009): each whitespace token hashes to one of `dim`
  * buckets with a hash-derived ±1 sign, and the text's vector is the
  * signed bucket counts. No vocabulary, no training, no lookup table —
  * the standard deterministic text→vector bridge when no learned
  * encoder is in the loop (and the drop-in SEAM where one goes: any
  * model server produces the same `array<double>` column).
  *
  * Determinism & oracle parity: bucket and sign derive from the SAME
  * md5h60 idiom the whole repo hashes with (first 15 hex chars of
  * md5("emb#" + token) as a 60-bit long; bucket = h mod dim, sign from
  * the next bit h div dim mod 2) — DuckDB recomputes it exactly, and
  * because components are signed INTEGER counts, dot products are
  * exact integers and cosine is a single IEEE expression both sides.
  *
  * Scale shape: one pass over the tokens per row, scan-side, codegen'd
  * — no explode, no per-token rows, no shuffle (the explode → groupBy
  * formulation would shuffle every token in the corpus). Token hashes
  * memoized (bounded) — Zipfian corpora re-hash the same words
  * constantly.
  */
object HashEmbedder {

  private val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** md5h60 of a string — first 15 hex chars of the md5 digest as a
    * (nonnegative, 60-bit) long; bit-identical to the Column idiom
    * `conv(substring(md5(c), 1, 15), 16, 10)` and DuckDB's
    * `('0x' || substr(md5(c), 1, 15))::BIGINT`. The ONE JVM-side
    * implementation of the repo's hashing idiom — every scorer/embedder
    * calls through here, so the arithmetic can't fork. */
  def md5h60(s: String): Long = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
    // 15 hex chars = 15 nibbles, high nibble of each byte first
    var v = 0L
    var i = 0
    while (i < 15) {
      val b = bytes(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

final class HashEmbedder(val dim: Int) extends Serializable {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val MemoCap = 1 << 16

  /** See [[HashEmbedder.md5h60]] (kept on the instance for existing
    * call sites). */
  def md5h60(s: String): Long = HashEmbedder.md5h60(s)

  private def tokenHash(t: String): Long = {
    val cached = memo.get(t)
    if (cached != null) return cached
    val h = md5h60("emb#" + t)
    if (memo.size < MemoCap) memo.put(t, h)
    h
  }

  /** The signed-count vector of a text. */
  def embed(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val acc = new Array[Double](dim)
    var i = 0
    while (i < toks.length) {
      val h = tokenHash(toks(i))
      val b = (h % dim).toInt
      acc(b) += (if ((h / dim) % 2 == 0) 1.0 else -1.0)
      i += 1
    }
    new GenericArrayData(acc)
  }

  override def hashCode(): Int = dim
  override def equals(o: Any): Boolean = o match {
    case e: HashEmbedder => e.dim == dim
    case _ => false
  }
}

/** `array<double>` feature-hash embedding of a text column. */
case class HashEmbed(child: Expression, embedder: HashEmbedder)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_hash_embed"

  override def nullSafeEval(input: Any): Any =
    embedder.embed(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashEmbedder", embedder,
      classOf[HashEmbedder].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.embed($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

object HashEmbed {
  def apply(text: Column, dim: Int): Column =
    bridge.column(HashEmbed(bridge.expression(text), new HashEmbedder(dim)))
}

/** Character-n-gram feature-hash embedding — the same hashing trick
  * over SLIDING CHARACTER WINDOWS of the raw text (spaces included)
  * instead of whitespace tokens. A token-boundary shift ("quick brown"
  * → "quickbrown") replaces whole tokens — the token embedding loses
  * BOTH words — but only the ~n grams straddling the edit point
  * change, so near-dup cosine survives splits/joins/typos: the
  * standard character-n-gram feature-hashing robustness argument
  * (same Weinberger et al. seam; n-gram features per CANINE/charCNN
  * practice). Gram hash = md5h60("embn#" + gram) — a distinct salt
  * from the token embedding, so the two feature spaces are
  * uncorrelated. Texts shorter than n contribute their whole string
  * as the single gram (the empty text hashes the empty gram — still a
  * unit-norm-able vector, never all-zero).
  *
  * Same scale shape as [[HashEmbedder]]: one scan-side codegen'd pass,
  * no explode, no shuffle; gram hashes memoized (char-n-gram spaces
  * are Zipfian too). */
final class NgramHashEmbedder(val dim: Int, val n: Int)
    extends Serializable {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(n >= 1, s"n must be >= 1, got $n")

  private val hasher = new HashEmbedder(dim)

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val MemoCap = 1 << 16

  private def gramHash(g: String): Long = {
    val cached = memo.get(g)
    if (cached != null) return cached
    val h = hasher.md5h60("embn#" + g)
    if (memo.size < MemoCap) memo.put(g, h)
    h
  }

  /** The signed-count vector of a text's character n-grams. Windows
    * are cut over Unicode CODE POINTS, not UTF-16 units: the DuckDB
    * oracle's len()/substr() count code points, and a UTF-16 window
    * over supplementary-plane text (emoji, rare CJK) would both shift
    * the gram stream and produce lone-surrogate grams that hash
    * differently — breaking engine/oracle parity exactly on the
    * corpora where the char-gram space matters most. For BMP-only text
    * code-point and UTF-16 indices coincide, so this is behavior-
    * preserving on the bench corpus. */
  def embed(text: UTF8String): ArrayData = {
    val s = text.toString
    val acc = new Array[Double](dim)
    val cpCount = s.codePointCount(0, s.length)
    val count = math.max(cpCount - n + 1, 1)
    var i = 0
    var start = 0 // UTF-16 offset of code point i
    while (i < count) {
      val end = s.offsetByCodePoints(start, math.max(math.min(n, cpCount - i), 0))
      val h = gramHash(s.substring(start, end))
      val b = (h % dim).toInt
      acc(b) += (if ((h / dim) % 2 == 0) 1.0 else -1.0)
      i += 1
      if (i < count) start = s.offsetByCodePoints(start, 1)
    }
    new GenericArrayData(acc)
  }

  override def hashCode(): Int = dim * 31 + n
  override def equals(o: Any): Boolean = o match {
    case e: NgramHashEmbedder => e.dim == dim && e.n == n
    case _ => false
  }
}

/** `array<double>` character-n-gram feature-hash embedding. */
case class HashEmbedNgrams(child: Expression, embedder: NgramHashEmbedder)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_hash_embed_ngrams"

  override def nullSafeEval(input: Any): Any =
    embedder.embed(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramHashEmbedder", embedder,
      classOf[NgramHashEmbedder].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.embed($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashEmbedNgrams =
    copy(child = newChild)
}

object HashEmbedNgrams {
  def apply(text: Column, dim: Int, n: Int): Column =
    bridge.column(HashEmbedNgrams(bridge.expression(text),
      new NgramHashEmbedder(dim, n)))
}
