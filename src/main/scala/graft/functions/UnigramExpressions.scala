package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-language-model tokenizer application (Kudo,
  * "Subword Regularization", ACL 2018 — the public unigram model
  * SentencePiece implements; training lives in
  * [[graft.operators.UnigramLmTokenizer]]). Where BPE greedily folds a
  * merge list, the unigram model scores every segmentation of a word
  * under per-piece log-probabilities and keeps the Viterbi-best one.
  * These expressions APPLY a trained piece table scan-side, codegen'd,
  * no shuffle — the same denomination seam as the BPE expressions.
  *
  * Determinism (what makes the DuckDB oracle possible): piece costs
  * are INTEGER micro-nats (round(-ln p · 10⁶) — fixed at training
  * time, embedded in the artifact), the DP accumulates exact integer
  * sums over CODE POINT windows (= DuckDB character semantics), and
  * ties break by the single integer key
  * `(cost · (P+1)) + (P − pieceLen)` — min key is min cost, then the
  * LONGEST piece. A char no piece covers segments as itself at
  * [[UnigramTable.UnkCostMicro]] and emits the UNK id, so the DP is
  * total over arbitrary input; the empty word (split artifact of
  * doubled/edge spaces) emits the one empty-sentinel id, mirroring
  * the BPE tables.
  *
  * Id scheme (closed, vocabulary-embedded): pieces sorted by string,
  * id = index; UNK = |vocab|; empty sentinel = |vocab| + 1.
  */
final class UnigramTable(val pieces: Seq[(String, Long)],
    val maxPieceLen: Int) extends Serializable {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  /** UNK id: one past the piece ids. */
  def unkId: Long = pieces.size.toLong
  /** Empty-word sentinel id: one past UNK. */
  def emptyId: Long = pieces.size.toLong + 1L

  // piece -> (id, costMicro); ids are the sorted-by-string index, so
  // the artifact alone fixes the id space (no separate vocab table)
  @transient private lazy val lookup:
      java.util.HashMap[String, (Long, Long)] = {
    val m = new java.util.HashMap[String, (Long, Long)]()
    pieces.zipWithIndex.foreach { case ((p, cost), i) =>
      m.put(p, (i.toLong, cost))
    }
    m
  }

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** One word's Viterbi-best piece segmentation (UNK chars appear as
    * themselves — [[tokenId]] resolves them to the UNK id). */
  def tokenizeWord(word: String): Array[String] = {
    val cached = memo.get(word)
    if (cached != null) return cached
    val out = computeWord(word)
    if (memo.size < BpeTable.MemoCap) memo.put(word, out)
    out
  }

  private def computeWord(word: String): Array[String] = {
    if (word.isEmpty) return Array("")
    // code point windows — DuckDB substr counts characters, so the two
    // engines window identically even over astral-plane input
    val cps = BpeTable.codePointStrings(word)
    val n = cps.length
    val p = maxPieceLen
    val cost = new Array[Long](n + 1)
    val bestj = new Array[Int](n + 1)
    var k = 1
    while (k <= n) {
      var bk = Long.MaxValue
      var j = 1
      val jMax = math.min(p, k)
      while (j <= jMax) {
        val piece = cps.slice(k - j, k).mkString
        val e = lookup.get(piece)
        val c: Long =
          if (e != null) e._2
          else if (j == 1) UnigramTable.UnkCostMicro
          else -1L
        if (c >= 0L) {
          val key = (cost(k - j) + c) * (p + 1) + (p - j)
          if (key < bk) bk = key
        }
        j += 1
      }
      cost(k) = bk / (p + 1)
      bestj(k) = p - (bk % (p + 1)).toInt
      k += 1
    }
    var pos = n
    var out = List.empty[String]
    while (pos > 0) {
      val j = bestj(pos)
      out = cps.slice(pos - j, pos).mkString :: out
      pos -= j
    }
    out.toArray
  }

  /** Piece → id: vocabulary index, UNK for an uncovered single char,
    * the empty sentinel for the empty word, -1 unreachable. */
  def tokenId(t: String): Long = {
    if (t.isEmpty) return emptyId
    val e = lookup.get(t)
    if (e != null) e._1
    else if (t.codePointCount(0, t.length) == 1) unkId
    else -1L
  }

  /** The text's unigram token-id sequence — the BPE tables' shared
    * word-iteration body, so whitespace handling cannot drift. */
  def ids(text: UTF8String): ArrayData =
    BpeTable.idsOf(text, tokenizeWord, tokenId)

  /** Total unigram token count — the budget/fertility denomination. */
  def count(text: UTF8String): Long = BpeTable.countOf(text, tokenizeWord)

  /** Longest word-prefix within a unigram token budget — the BPE
    * tables' shared greedy body ([[BpeTable.truncateWordsOf]]). */
  def truncateWords(text: UTF8String, maxTokens: Long): UTF8String =
    BpeTable.truncateWordsOf(text, maxTokens, tokenizeWord)

  /** Total negative log-likelihood of the text under the unigram
    * model, in integer micro-nats — the Viterbi-best segmentation's
    * summed piece costs (the model doubles as the CCNet-style LM
    * filter: the trained pieces ARE a unigram LM). UNK chars cost
    * [[UnigramTable.UnkCostMicro]]; the empty split artifact carries
    * no probability mass (cost 0). Exact integer sum, cross-engine. */
  def totalCostMicro(text: UTF8String): Long = {
    val words = text.toString.split(" ", -1)
    var total = 0L
    var i = 0
    while (i < words.length) {
      val pieces = tokenizeWord(words(i))
      var j = 0
      while (j < pieces.length) {
        val p = pieces(j)
        if (p.nonEmpty) {
          val e = lookup.get(p)
          total += (if (e != null) e._2 else UnigramTable.UnkCostMicro)
        }
        j += 1
      }
      i += 1
    }
    total
  }

  override def hashCode(): Int = (pieces, maxPieceLen).hashCode()
  override def equals(o: Any): Boolean = o match {
    case t: UnigramTable =>
      t.pieces == pieces && t.maxPieceLen == maxPieceLen
    case _ => false
  }
}

object UnigramTable {
  /** Cost of an uncovered single character, in micro-nats (~25 nats —
    * far above any trained piece, so UNK never outbids a covered
    * segmentation, while keeping the DP total). Shared verbatim with
    * the generated oracle SQL. */
  val UnkCostMicro = 25000000L
}

/** `array<bigint>` of the text's unigram-LM token ids. */
case class UnigramTokenIds(child: Expression, table: UnigramTable)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_unigram_ids"

  override def nullSafeEval(input: Any): Any =
    table.ids(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.ids($t);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramTokenIds = copy(child = newChild)
}

object UnigramTokenIds {
  def apply(text: Column, table: UnigramTable): Column =
    bridge.column(UnigramTokenIds(bridge.expression(text), table))
}

/** `bigint` unigram token count of the text. */
case class UnigramTokenCount(child: Expression, table: UnigramTable)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_unigram_count"

  override def nullSafeEval(input: Any): Any =
    table.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.count($t);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramTokenCount = copy(child = newChild)
}

object UnigramTokenCount {
  def apply(text: Column, table: UnigramTable): Column =
    bridge.column(UnigramTokenCount(bridge.expression(text), table))
}

/** `string`: the text's longest word-prefix within a unigram token
  * budget — callers branch on the total count to return the ORIGINAL
  * string when nothing is cut (the BpeTruncateWords contract). */
case class UnigramTruncateWords(child: Expression, table: UnigramTable,
    maxTokens: Long) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_unigram_truncate"

  override def nullSafeEval(input: Any): Any =
    table.truncateWords(input.asInstanceOf[UTF8String], maxTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $ref.truncateWords($t, ${maxTokens}L);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramTruncateWords = copy(child = newChild)
}

object UnigramTruncateWords {
  def apply(text: Column, table: UnigramTable, maxTokens: Long): Column =
    bridge.column(UnigramTruncateWords(bridge.expression(text), table,
      maxTokens))
}

/** `bigint` total negative log-likelihood of the text under the
  * trained unigram LM, in micro-nats. */
case class UnigramLmCost(child: Expression, table: UnigramTable)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_unigram_cost"

  override def nullSafeEval(input: Any): Any =
    table.totalCostMicro(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.totalCostMicro($t);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramLmCost = copy(child = newChild)
}

object UnigramLmCost {
  def apply(text: Column, table: UnigramTable): Column =
    bridge.column(UnigramLmCost(bridge.expression(text), table))
}
