package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-shingling and set-similarity expressions.
  *
  * The built-in formulations (`transform(sequence(...), i ->
  * array_join(slice(toks, i, n), " "))` and
  * `size(array_intersect(a,b))/size(array_union(a,b))`) are higher-order
  * / collection expressions that run interpreted. Catalyst also inlines
  * them into join filter predicates where they get re-evaluated per
  * comparison; combined with AQE coalescing small-byte stages to one
  * partition, that serialized interpreted work produced 40-80×
  * run-to-run swings on the dedup queries. These expressions compute the
  * same values in tight loops inlined into WholeStageCodegen.
  *
  * Semantics parity (DuckDB-oracle-verified): tokens split on a single
  * space keeping empties; shingle = n consecutive tokens joined by a
  * space; empty result when the doc has < n tokens; Jaccard uses
  * distinct-set semantics exactly like array_intersect/array_union.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WordShingles.compute($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  def compute(text: UTF8String, n: Int): ArrayData = {
    // split on single space, keeping empty tokens (limit -1) — same as
    // split(text, " ") / DuckDB string_split(text, ' ')
    val toks = text.split(UTF8String.fromString(" "), -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < count) {
      var s = toks(i)
      var j = 1
      while (j < n) {
        s = UTF8String.concat(s, space, toks(i + j))
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    bridge.column(WordShingles(bridge.expression(text), n))
}

/** Distinct-set Jaccard similarity of two array<string> columns
  * (|A∩B| / |A∪B| over distinct elements; 0.0 when the union is empty). */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSimilarity.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaccardSimilarity {

  def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new mutable.HashSet[UTF8String]
    var i = 0
    val na = a.numElements()
    while (i < na) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new mutable.HashSet[UTF8String]
    var j = 0
    val nb = b.numElements()
    while (j < nb) { setB.add(b.getUTF8String(j)); j += 1 }
    val union = setA.size + setB.count(!setA.contains(_))
    if (union == 0) 0.0
    else {
      val inter = setA.count(setB.contains)
      inter.toDouble / union.toDouble
    }
  }

  def apply(a: Column, b: Column): Column =
    bridge.column(JaccardSimilarity(bridge.expression(a), bridge.expression(b)))
}
