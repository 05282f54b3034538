package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native byte-pair-encoding application (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 —
  * the public BPE algorithm every production tokenizer descends from).
  * Training lives in [[graft.operators.BpeTokenizer]]; these
  * expressions APPLY a trained merge table scan-side, codegen'd, no
  * shuffle, no row amplification — the token-denomination seam every
  * token-budgeted operator (`token_count`, `pack_sequences`,
  * `token_budget_sample`) can be parameterized on.
  *
  * Apply semantics (deterministic, oracle-mirrored): each whitespace
  * word starts as its unicode-codepoint sequence; merges apply in
  * TRAINED RANK ORDER, each rank replacing every adjacent occurrence
  * of its pair left-to-right non-overlapping. Single-pass-in-rank-order
  * equals the classic min-rank-first loop: a merge at rank r only
  * creates tokens that participate in merges trained LATER (a pair
  * involving token m_r cannot have been counted before m_r existed),
  * and merging (x,y) never makes two pre-existing tokens newly
  * adjacent.
  *
  * Execution encodes the token sequence as ONE string with every token
  * wrapped in marker chars: `U+001E tok U+001F` per token,
  * concatenated. Replacing `O·a·C·O·b·C` with `O·ab·C` then IS the
  * rank's left-to-right merge pass — `java.lang.String.replace` and
  * DuckDB `replace` both scan left-to-right non-overlapping, so the
  * engine's fold and the oracle's recursive-CTE fold are the same
  * computation character for character. The per-token BEGIN and END
  * markers make the pattern boundary-exact: a match must consume whole
  * token spans (a pattern starting mid-token would need `O` inside a
  * token, and the markers are excluded from the alphabet), and two
  * matches can never share a character, so "aaaa" under merge (a,a)
  * gives [aa, aa] and "aaa" gives [aa, a] — the canonical greedy
  * semantics. A naive single-separator encoding is NOT boundary-safe
  * (pattern `b·SEP·c` matches across ["ab","cd"]); the double marker
  * is what buys exactness.
  *
  * Words containing a marker char (U+001E/U+001F — impossible in any
  * sane corpus, they are ASCII control codes) are passed through as a
  * single opaque token rather than corrupting the encoding.
  */
final class BpeTable(val merges: Seq[(String, String)]) extends Serializable {

  import BpeTable._

  // Zipfian corpora re-tokenize the same words constantly: memoize
  // word → token count/array per table instance (shared across the
  // executor's codegen'd tasks referencing this table). Bounded: stop
  // inserting past MemoCap — degrade to recompute, never grow.
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** One word's BPE tokens (codepoint split + rank-order merge fold). */
  def tokenizeWord(word: String): Array[String] = {
    val cached = memo.get(word)
    if (cached != null) return cached
    val out = computeWord(word)
    if (memo.size < MemoCap) memo.put(word, out)
    out
  }

  private def computeWord(word: String): Array[String] = {
    if (word.indexOf(Open) >= 0 || word.indexOf(Close) >= 0)
      return Array(word) // marker collision: opaque single token
    val sb = new java.lang.StringBuilder(word.length * 3)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.append(Open).appendCodePoint(cp).append(Close)
      i += Character.charCount(cp)
    }
    var s = sb.toString
    merges.foreach { case (a, b) =>
      s = s.replace(s"$Open$a$Close$Open$b$Close", s"$Open$a$b$Close")
    }
    if (s.isEmpty) Array("") // empty word = one empty token (oracle twin)
    else s.substring(1, s.length - 1).split(s"$Close$Open", -1)
  }

  /** All BPE tokens of a text (per whitespace word, concatenated). */
  def tokens(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    val parts = new scala.collection.mutable.ArrayBuffer[Any](words.length * 2)
    words.foreach { w =>
      tokenizeWord(w).foreach(t => parts += UTF8String.fromString(t))
    }
    new GenericArrayData(parts.toArray)
  }

  /** Total BPE token count of a text — the budget denomination. */
  def count(text: UTF8String): Long = BpeTable.countOf(text, tokenizeWord)

  /** Token → id under the VOCABULARY-FREE id scheme (the codepoint
    * analog of GPT-2's byte-id base alphabet — ids are stable without
    * shipping any vocab table): a single-codepoint token IS its code
    * point; a merge product is [[BpeTable.IdBase]] + its 1-based rank
    * (min rank when two merges collide on the same product string);
    * the empty token (split artifacts of doubled/edge spaces) is
    * [[BpeTable.EmptyTokenId]] — the UNUSED slot between the codepoint
    * range and the first (1-based) product, so it can never collide
    * with a legal U+0000 codepoint token (0 is NUL, not empty);
    * the marker-collision opaque token (multi-codepoint, not a
    * product — adversarial input only) is -1. The OOV property spec
    * proves these four cases are exhaustive. */
  @transient private lazy val productIds:
      java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    merges.foreach { case (a, b) =>
      i += 1
      m.putIfAbsent(a + b, java.lang.Long.valueOf(BpeTable.IdBase + i))
    }
    m
  }

  def tokenId(t: String): Long = {
    if (t.isEmpty) return BpeTable.EmptyTokenId
    val pid = productIds.get(t)
    if (pid != null) pid.longValue()
    else if (t.codePointCount(0, t.length) == 1) t.codePointAt(0).toLong
    else -1L
  }

  /** 1-based trained rank of a merge-product string (min rank when two
    * merges collide on the same product), -1 when not a product — the
    * id-scheme seam [[BpeByteTable]] re-denominates over byte ids. */
  private[functions] def productRank(t: String): Long = {
    val pid = productIds.get(t)
    if (pid == null) -1L else pid.longValue() - BpeTable.IdBase
  }

  /** The text's BPE token-id sequence, word order then within-word
    * merge order — what a training pipeline actually emits. */
  def ids(text: UTF8String): ArrayData =
    BpeTable.idsOf(text, tokenizeWord, tokenId)

  /** Longest word-prefix whose cumulative BPE token count stays within
    * `maxTokens`, re-joined by single spaces — the subword-denominated
    * context cap, cutting at word boundaries (a mid-word cut would
    * change the remaining words' own tokenizations). A first word
    * already over budget yields the empty string. */
  def truncateWords(text: UTF8String, maxTokens: Long): UTF8String =
    BpeTable.truncateWordsOf(text, maxTokens, tokenizeWord)

  // value equality so expression trees comparing BpeTokens nodes
  // (Catalyst dedups identical subexpressions) see the merge list, not
  // the wrapper identity
  override def hashCode(): Int = merges.hashCode()
  override def equals(o: Any): Boolean = o match {
    case t: BpeTable => t.merges == merges
    case _ => false
  }
}

object BpeTable {
  /** The ONE word-iteration body of every id emission: split on single
    * spaces (n delimiters ⇒ n+1 words, empties included), tokenize
    * each word, emit each token's id — shared by the codepoint and
    * byte tables so the two denominations cannot drift on the
    * text-level fold (their per-table tests would both stay green if a
    * whitespace-handling change missed one copy). */
  private[functions] def idsOf(text: UTF8String,
      tokenize: String => Array[String], idOf: String => Long): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[Any](words.length * 2)
    words.foreach { w =>
      tokenize(w).foreach(t => out += idOf(t))
    }
    new GenericArrayData(out.toArray)
  }

  /** The truncate twin — same split, greedy longest word-prefix within
    * `maxTokens` under the given per-word tokenize; shared by the BPE
    * and unigram truncate expressions so the budget-cut semantics are
    * one body. A first word already over budget yields "". */
  private[functions] def truncateWordsOf(text: UTF8String, maxTokens: Long,
      tokenize: String => Array[String]): UTF8String = {
    val words = text.toString.split(" ", -1)
    var cum = 0L
    var keep = 0
    var stop = false
    while (keep < words.length && !stop) {
      val n = tokenize(words(keep)).length
      if (cum + n > maxTokens) stop = true
      else { cum += n; keep += 1 }
    }
    UTF8String.fromString(words.take(keep).mkString(" "))
  }

  /** The count twin of [[idsOf]] — same split, same per-word fold. */
  private[functions] def countOf(text: UTF8String,
      tokenize: String => Array[String]): Long = {
    val words = text.toString.split(" ", -1)
    var n = 0L
    var i = 0
    while (i < words.length) { n += tokenize(words(i)).length; i += 1 }
    n
  }

  /** The word → code-point-string split every tokenizer body windows
    * over (= DuckDB character semantics — one element per code point,
    * astral pairs intact): ONE copy shared by the BPE trainer, the
    * unigram trainer's substring seeding and the unigram Viterbi DP,
    * so the engines can never window differently. */
  private[graft] def codePointStrings(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Token BEGIN/END markers (ASCII record/unit separator — excluded
    * from the token alphabet by construction). */
  val Open = '\u001e'
  val Close = '\u001f'
  val MemoCap = 1 << 16
  /** First merge-product id: one past the Unicode code point space, so
    * single-codepoint ids (= the code point) and product ids (= base +
    * rank) can never collide. */
  val IdBase = 0x110000L
  /** Empty-token sentinel: IdBase itself — above every code point
    * (≤ 0x10FFFF) and below every product (IdBase + 1-based rank), so
    * the id scheme stays injective even over NUL-bearing input. */
  val EmptyTokenId = IdBase
}

/** `array<string>` of the text's BPE tokens under a trained merge
  * table. */
case class BpeTokens(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_bpe_tokens"

  override def nullSafeEval(input: Any): Any =
    table.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.tokens($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

object BpeTokens {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    bridge.column(BpeTokens(bridge.expression(text), new BpeTable(merges)))
}

/** `bigint` BPE token count of the text — cheaper than materializing
  * the token array when only the denomination is needed (the packing /
  * budget-sampling operators). */
case class BpeTokenCount(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_bpe_count"

  override def nullSafeEval(input: Any): Any =
    table.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.count($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    bridge.column(BpeTokenCount(bridge.expression(text), new BpeTable(merges)))
}

/** `string`: the text's longest word-prefix within a BPE token budget
  * (see [[BpeTable.truncateWords]]) — callers branch on the total
  * count to return the ORIGINAL string when nothing is cut, so the
  * kept branch can never differ from the input by reassembly. */
case class BpeTruncateWords(child: Expression, table: BpeTable,
    maxTokens: Long) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_bpe_truncate"

  override def nullSafeEval(input: Any): Any =
    table.truncateWords(input.asInstanceOf[UTF8String], maxTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $ref.truncateWords($t, ${maxTokens}L);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeTruncateWords = copy(child = newChild)
}

object BpeTruncateWords {
  def apply(text: Column, merges: Seq[(String, String)],
      maxTokens: Long): Column =
    bridge.column(BpeTruncateWords(bridge.expression(text),
      new BpeTable(merges), maxTokens))
}

/** `array<long>`: the text's BPE token-ID sequence under the
  * vocabulary-free id scheme (see [[BpeTable.tokenId]]) — the actual
  * training-pipeline output denomination (id sequences, not strings). */
case class BpeTokenIds(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_bpe_ids"

  override def nullSafeEval(input: Any): Any =
    table.ids(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.ids($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenIds =
    copy(child = newChild)
}

object BpeTokenIds {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    bridge.column(BpeTokenIds(bridge.expression(text), new BpeTable(merges)))
}

/** GPT-2-style byte↔unicode bijection (Radford et al. 2019's public
  * `bytes_to_unicode` construction, re-derived): every byte 0–255 maps
  * to a printable code point — the 188 visually-printable latin-1 bytes
  * (`!`–`~`, `¡`–`¬`, `®`–`ÿ`) map to THEMSELVES, the remaining 68
  * (controls, space, DEL, soft hyphen…) map to U+0100+n in increasing
  * byte order. A word's UTF-8 bytes become a plain character string, so
  * the char-level merge machinery ([[BpeTable]]'s marker fold) and the
  * DuckDB `replace`-fold oracle apply to BYTE symbols verbatim — and
  * the base alphabet is CLOSED: emoji/CJK/arbitrary binary text
  * decomposes into the same 256 symbols, so the id space never grows
  * with the input (the property the codepoint scheme can't offer). */
object ByteLevel {
  private val b2c: Array[Int] = {
    val printable = (('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++
      (0xAE to 0xFF)).toSet
    val out = new Array[Int](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = b
      else { out(b) = 256 + n; n += 1 }
      b += 1
    }
    out
  }
  private val c2b: Map[Int, Int] = (0 until 256).map(b => b2c(b) -> b).toMap

  /** Mapped code point of byte `b` (0–255). */
  def charOf(b: Int): Int = b2c(b)
  /** Byte of a mapped code point, -1 if the code point is unmapped. */
  def byteOf(cp: Int): Int = c2b.getOrElse(cp, -1)

  /** The word's UTF-8 bytes as a mapped-char string (the byte-level
    * base-alphabet symbol sequence). */
  def encode(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.appendCodePoint(b2c(bytes(i) & 0xFF)); i += 1 }
    sb.toString
  }

  /** Inverse of [[encode]] over any concatenation of mapped chars
    * (e.g. a token or a whole tokenized word) — the round-trip proof
    * seam. Throws on an unmapped code point (impossible for strings
    * this module produced). */
  def decode(s: String): Array[Byte] = {
    val out = new Array[Byte](s.codePointCount(0, s.length))
    var i = 0
    var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val b = c2b.getOrElse(cp,
        throw new IllegalArgumentException(f"unmapped code point U+$cp%04X"))
      out(j) = b.toByte
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** First merge-product id AND the empty-token sentinel slot: ids
    * 0–255 are the bytes themselves, 256 the empty split artifact,
    * 256 + 1-based rank the products — injective by the same argument
    * as the codepoint scheme, but CLOSED: max id = 256 + numMerges on
    * ANY input. */
  val IdBase = 256L
  val EmptyTokenId: Long = IdBase
}

/** Byte-level BPE application: [[BpeTable]]'s fold over each word's
  * [[ByteLevel]]-encoded UTF-8 byte symbols (merges must have been
  * trained in the same encoding — [[graft.operators.BpeTokenizer]]
  * `trainCachedBytes`). Token ids are byte-denominated: a
  * single-symbol token IS its byte (0–255), a merge product is
  * 256 + rank, the empty split artifact is 256 — so the id space is
  * closed over arbitrary input with zero table growth (the GPT-2
  * property). No marker-collision opaque path exists here: bytes 0x1E/
  * 0x1F map ABOVE U+0100, so no input can inject the fold markers. */
final class BpeByteTable(val merges: Seq[(String, String)])
    extends Serializable {

  private val inner = new BpeTable(merges)

  // rank -> product string (decode seam); productRank on the inner
  // table resolves collisions to min rank, so decode(id) re-encodes to
  // the same id
  @transient private lazy val products: Array[String] =
    merges.map { case (a, b) => a + b }.toArray

  def tokenizeWord(word: String): Array[String] =
    inner.tokenizeWord(ByteLevel.encode(word))

  def tokenId(t: String): Long = {
    if (t.isEmpty) return ByteLevel.EmptyTokenId
    val r = inner.productRank(t)
    if (r > 0) ByteLevel.IdBase + r
    else if (t.codePointCount(0, t.length) == 1)
      ByteLevel.byteOf(t.codePointAt(0)).toLong
    else -1L
  }

  /** The text's byte-level BPE token-id sequence (word order, then
    * within-word merge order) — the SHARED word fold ([[BpeTable.idsOf]]). */
  def ids(text: UTF8String): ArrayData =
    BpeTable.idsOf(text, tokenizeWord, tokenId)

  /** Total byte-level BPE token count of a text. */
  def count(text: UTF8String): Long = BpeTable.countOf(text, tokenizeWord)

  /** One word back from its id sequence — the lossless-round-trip
    * proof seam (BpeOovPropertySpec): byte ids emit their byte, the
    * empty sentinel emits nothing, product ids emit their trained
    * product's bytes. Throws on an id outside the closed space. */
  def decodeWord(ids: Seq[Long]): String = {
    val buf = new java.io.ByteArrayOutputStream()
    ids.foreach { id =>
      if (id == ByteLevel.EmptyTokenId) ()
      else if (id >= 0 && id < 256) buf.write(id.toInt)
      else {
        val rank = (id - ByteLevel.IdBase).toInt
        require(rank >= 1 && rank <= products.length, s"id $id outside closed space")
        buf.write(ByteLevel.decode(products(rank - 1)))
      }
    }
    new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  override def hashCode(): Int = merges.hashCode() * 31 + 1
  override def equals(o: Any): Boolean = o match {
    case t: BpeByteTable => t.merges == merges
    case _ => false
  }
}

/** `array<long>`: the text's BYTE-LEVEL BPE token-id sequence — the
  * production id denomination (GPT-2 lineage): closed 256-byte base
  * alphabet, ids never grow with exotic input. */
case class BpeByteTokenIds(child: Expression, table: BpeByteTable)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_bpe_byte_ids"

  override def nullSafeEval(input: Any): Any =
    table.ids(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeByteTable", table,
      classOf[BpeByteTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.ids($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeByteTokenIds =
    copy(child = newChild)
}

object BpeByteTokenIds {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    bridge.column(BpeByteTokenIds(bridge.expression(text),
      new BpeByteTable(merges)))
}
