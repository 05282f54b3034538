package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass per-document statistics for the Gopher text-quality
  * families (Rae et al., table A1). The original formulations exploded
  * tokens / n-grams / characters into corpus-sized row sets and
  * shuffled them on (doc, unit) keys — linear, but at 100× corpus the
  * entropy family alone pushed ~half a billion single-character rows
  * through two exchanges (measured: gopher_verdict 1.2 s → 6.9 s →
  * 113.6 s at 1×/10×/100×, the 10×→100× step super-linear from shuffle
  * spill). Every statistic here is doc-LOCAL, so each family is now
  * ONE scan-side expression over the document string: per-doc hash
  * maps bounded by document length, zero exchanges, inlined into
  * WholeStageCodegen.
  *
  * Exactness discipline: the expressions return EXACT INTEGER
  * components (counts, character masses, micro-rounded entropy terms);
  * every double division and final round(·, 4) stays in the DataFrame
  * layer with the identical expression trees as before, so the
  * unchanged DuckDB oracles keep gating the values bit-for-bit. The
  * one JVM-side rounding (the entropy term's round(·, 6) inside the
  * per-doc fold) replicates Spark's Round on DoubleType —
  * BigDecimal.valueOf(double).setScale(6, HALF_UP) — and is pinned by
  * the unchanged text_entropy oracle. */
object GopherStats {
  private val Space = UTF8String.fromString(" ")

  /** [max unigram count, max bigram count, n_tokens] — the
    * repetitionStats integers. Token semantics = split on single space
    * keeping empties (tokens()/WordShingles parity): an empty text has
    * ONE empty token (mx_uni = 1), and < 2 tokens means no bigrams
    * (mx_big = 0, the exploded form's null→0 coalesce). */
  def repCounts(text: UTF8String): ArrayData = {
    val toks = text.split(Space, -1)
    val uni = new java.util.HashMap[UTF8String, Long]()
    var i = 0
    while (i < toks.length) {
      uni.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    var mxUni = 0L
    val it = uni.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > mxUni) mxUni = v }
    val big = new java.util.HashMap[UTF8String, Long]()
    i = 0
    while (i + 1 < toks.length) {
      big.merge(UTF8String.concat(toks(i), Space, toks(i + 1)), 1L,
        (a, b) => a + b)
      i += 1
    }
    var mxBig = 0L
    val it2 = big.values().iterator()
    while (it2.hasNext) { val v = it2.next(); if (v > mxBig) mxBig = v }
    new GenericArrayData(Array[Any](mxUni, mxBig, toks.length.toLong))
  }

  /** [top_mass, dup_mass, tok_chars] — the gopherRepetition character
    * masses: top_mass = max over topN-grams of count · gram chars
    * (0 when the doc has no gram), dup_mass = chars of tokens covered
    * by ANY dupN-gram occurring ≥ 2× in the doc (coverage = union of
    * the grams' token spans), tok_chars = total token chars. */
  def repMass(text: UTF8String, topN: Int, dupN: Int): ArrayData = {
    val toks = text.split(Space, -1)
    var tokChars = 0L
    var i = 0
    while (i < toks.length) { tokChars += toks(i).numChars(); i += 1 }
    // top: gram counts, then max(count * gramChars)
    var topMass = 0L
    locally {
      val counts = new java.util.HashMap[UTF8String, Long]()
      var s = 0
      while (s + topN <= toks.length) {
        var g = toks(s)
        var j = 1
        while (j < topN) { g = UTF8String.concat(g, Space, toks(s + j)); j += 1 }
        counts.merge(g, 1L, (a, b) => a + b)
        s += 1
      }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val m = e.getValue * e.getKey.numChars()
        if (m > topMass) topMass = m
      }
    }
    // dup: positions of grams with count >= 2, coverage union
    var dupMass = 0L
    if (toks.length >= dupN) {
      val counts = new java.util.HashMap[UTF8String, Long]()
      val grams = new Array[UTF8String](toks.length - dupN + 1)
      var s = 0
      while (s + dupN <= toks.length) {
        var g = toks(s)
        var j = 1
        while (j < dupN) { g = UTF8String.concat(g, Space, toks(s + j)); j += 1 }
        grams(s) = g
        counts.merge(g, 1L, (a, b) => a + b)
        s += 1
      }
      val covered = new Array[Boolean](toks.length)
      s = 0
      while (s < grams.length) {
        if (counts.get(grams(s)) > 1L) {
          var p = s
          while (p < s + dupN) { covered(p) = true; p += 1 }
        }
        s += 1
      }
      var p = 0
      while (p < toks.length) {
        if (covered(p)) dupMass += toks(p).numChars()
        p += 1
      }
    }
    new GenericArrayData(Array[Any](topMass, dupMass, tokChars))
  }

  /** [n_chars, entropy_micro] — the charEntropy integers: per-doc
    * CODE-POINT frequencies (split(text, '') semantics — Java regex
    * splits between code points, surrogate pairs intact), each
    * distinct character's Shannon term −(c/n)·log₂(c/n) rounded to 6
    * decimals exactly as Spark's Round (BigDecimal.valueOf, HALF_UP)
    * and carried as exact micro-units; the sum of micro-units equals
    * the old decimal(18,6) column sum bit-for-bit. n_chars = 0 (empty
    * text) mirrors the exploded form's doc-dropping join — the caller
    * filters it. */
  def entropyStats(text: UTF8String): ArrayData = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1L
      i += Character.charCount(cp)
    }
    var micro = 0L
    if (n > 0L) {
      val log2 = math.log(2.0)
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()
        val r = c.toDouble / n
        // identical op order to the exploded form's expression tree:
        // Multiply(Negate(Divide(c,n)), Divide(log(r), log(2)))
        val term = -r * (math.log(r) / log2)
        micro += java.math.BigDecimal.valueOf(term)
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .movePointRight(6).longValueExact()
      }
    }
    new GenericArrayData(Array[Any](n, micro))
  }
}

/** `array<bigint>` [mx_uni, mx_big, n_tokens] per document. */
case class RepCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rep_counts"
  override def nullSafeEval(input: Any): Any =
    GopherStats.repCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GopherStats.repCounts($t);")
  override protected def withNewChildInternal(newChild: Expression): RepCounts =
    copy(child = newChild)
}
object RepCounts {
  def apply(text: Column): Column =
    bridge.column(RepCounts(bridge.expression(text)))
}

/** `array<bigint>` [top_mass, dup_mass, tok_chars] per document. */
case class RepMass(child: Expression, topN: Int, dupN: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rep_mass"
  override def nullSafeEval(input: Any): Any =
    GopherStats.repMass(input.asInstanceOf[UTF8String], topN, dupN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GopherStats.repMass($t, $topN, $dupN);")
  override protected def withNewChildInternal(newChild: Expression): RepMass =
    copy(child = newChild)
}
object RepMass {
  def apply(text: Column, topN: Int, dupN: Int): Column =
    bridge.column(RepMass(bridge.expression(text), topN, dupN))
}

/** `array<bigint>` [n_chars, entropy_micro] per document. */
case class EntropyStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_entropy_stats"
  override def nullSafeEval(input: Any): Any =
    GopherStats.entropyStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GopherStats.entropyStats($t);")
  override protected def withNewChildInternal(newChild: Expression): EntropyStats =
    copy(child = newChild)
}
object EntropyStats {
  def apply(text: Column): Column =
    bridge.column(EntropyStats(bridge.expression(text)))
}
