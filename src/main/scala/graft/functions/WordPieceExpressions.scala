package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native WordPiece tokenizer application (Schuster & Nakajima, ICASSP
  * 2012; the BERT tokenizer, Devlin et al. 2019 — the public
  * algorithm; training lives in
  * [[graft.operators.WordPieceTokenizer]]). The third tokenizer
  * lineage at the shared denomination seam: BPE folds a merge list,
  * the unigram model Viterbi-scores segmentations, WordPiece is GREEDY
  * LONGEST-MATCH-FIRST — at each position take the longest vocabulary
  * piece prefixing the remaining word, non-initial pieces carrying the
  * `##` continuation marker; a word with any uncoverable position
  * becomes ONE UNK token (the published whole-word-UNK rule, not
  * per-character fallback — the deliberate contrast with the unigram
  * table's char-level UNK).
  *
  * Determinism (what makes the DuckDB oracle possible): matching
  * windows are CODE POINTS (= DuckDB character semantics), the greedy
  * rule has no ties (longest match is unique per position), and the
  * walk is a pure function of (word, vocabulary). The generated oracle
  * replays it as a precomputed longest-match jump table + a
  * position-chain walk, word-aligned with these bodies.
  *
  * Id scheme (closed, vocabulary-embedded — the unigram table's):
  * pieces sorted by DISPLAY string (`##`-form), id = index;
  * UNK = |vocab|; empty-word sentinel = |vocab| + 1.
  */
final class WordPieceTable(val pieces: Seq[String]) extends Serializable {

  /** UNK id: one past the piece ids. */
  def unkId: Long = pieces.size.toLong
  /** Empty-word sentinel id: one past UNK. */
  def emptyId: Long = pieces.size.toLong + 1L

  /** Longest piece CONTENT (## stripped) in code points — the greedy
    * scan's window bound, derived from the artifact itself. */
  val maxContentLen: Int =
    if (pieces.isEmpty) 1
    else math.max(1, pieces.map { p =>
      val c = WordPieceTable.contentOf(p)
      c.codePointCount(0, c.length)
    }.max)

  // display piece -> id (sorted index); greedy candidates are rebuilt
  // in display form, so one map serves match and id resolution
  @transient private lazy val lookup: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.zipWithIndex.foreach { case (p, i) =>
      m.put(p, java.lang.Long.valueOf(i.toLong))
    }
    m
  }

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** One word's greedy longest-match segmentation in DISPLAY form
    * (`##`-prefixed continuations); `Array(UnkMarker)` for a word with
    * an uncoverable position, `Array("")` for the empty split
    * artifact. */
  def tokenizeWord(word: String): Array[String] = {
    val cached = memo.get(word)
    if (cached != null) return cached
    val out = computeWord(word)
    if (memo.size < BpeTable.MemoCap) memo.put(word, out)
    out
  }

  private def computeWord(word: String): Array[String] = {
    if (word.isEmpty) return Array("")
    val cps = BpeTable.codePointStrings(word)
    val n = cps.length
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var pos = 0
    while (pos < n) {
      var j = math.min(maxContentLen, n - pos)
      var hit: String = null
      while (j >= 1 && hit == null) {
        val cand = (if (pos == 0) "" else "##") +
          cps.slice(pos, pos + j).mkString
        if (lookup.containsKey(cand)) hit = cand else j -= 1
      }
      if (hit == null) return Array(WordPieceTable.UnkMarker)
      out += hit
      pos += j
    }
    out.toArray
  }

  /** Display piece → id; the UNK marker and empty sentinel resolve to
    * their reserved ids. */
  def tokenId(t: String): Long = {
    if (t.isEmpty) return emptyId
    if (t == WordPieceTable.UnkMarker) return unkId
    val e = lookup.get(t)
    if (e != null) e.longValue() else -1L
  }

  /** The text's WordPiece token-id sequence — the BPE tables' shared
    * word-iteration body, so whitespace handling cannot drift. */
  def ids(text: UTF8String): ArrayData =
    BpeTable.idsOf(text, tokenizeWord, tokenId)

  /** Total WordPiece token count — the budget/fertility denomination
    * (an UNK word counts 1, the one token it emits). */
  def count(text: UTF8String): Long = BpeTable.countOf(text, tokenizeWord)

  override def hashCode(): Int = pieces.hashCode()
  override def equals(o: Any): Boolean = o match {
    case t: WordPieceTable => t.pieces == pieces
    case _ => false
  }
}

object WordPieceTable {
  /** Sentinel a [[WordPieceTable.tokenizeWord]] emits for an
    * uncoverable word: the empty-content continuation form, which
    * training can never construct — base symbols always carry content,
    * and the trainer's injectivity guard
    * (WordPieceTokenizer.train's candidate filter) refuses any initial
    * merge whose display would start with "##" (the one path that
    * could mint "##" or its ambiguous "##x" descendants on corpora
    * with "#"-initial words) — collision-free for ANY corpus. */
  val UnkMarker: String = "##"

  /** `##`-stripped matchable content of a display piece. */
  def contentOf(p: String): String =
    if (p.startsWith("##")) p.substring(2) else p

  /** Whether a display piece is a continuation (non-initial) form. */
  def isCont(p: String): Boolean = p.startsWith("##")
}

/** `array<bigint>` of the text's WordPiece token ids. */
case class WordPieceTokenIds(child: Expression, table: WordPieceTable)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_wordpiece_ids"

  override def nullSafeEval(input: Any): Any =
    table.ids(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceTable", table,
      classOf[WordPieceTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.ids($t);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceTokenIds = copy(child = newChild)
}

object WordPieceTokenIds {
  def apply(text: Column, table: WordPieceTable): Column =
    bridge.column(WordPieceTokenIds(bridge.expression(text), table))
}

/** `bigint` WordPiece token count of the text. */
case class WordPieceTokenCount(child: Expression, table: WordPieceTable)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_wordpiece_count"

  override def nullSafeEval(input: Any): Any =
    table.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceTable", table,
      classOf[WordPieceTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.count($t);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceTokenCount = copy(child = newChild)
}

object WordPieceTokenCount {
  def apply(text: Column, table: WordPieceTable): Column =
    bridge.column(WordPieceTokenCount(bridge.expression(text), table))
}
