package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: keeps the k highest-scoring (score, id)
  * pairs per group in a size-k min-heap.
  *
  * The window formulation (`row_number().over(partitionBy(g).orderBy
  * (score desc)) <= k`) SORTS every group's full candidate set —
  * O(n log n) per group and a full shuffle of all candidates. This
  * aggregate is O(n log k) with map-side partial combine: each partition
  * reduces its candidates to ≤ k pairs BEFORE the shuffle, so the
  * exchange carries |groups|·k rows instead of all candidates — the
  * difference between shuffling 100 TB of scored pairs and shuffling
  * kilobytes at cluster scale.
  *
  * Determinism: ties break on smaller id (same total order as the
  * oracle's `ORDER BY score DESC, id ASC`), so results are bit-identical
  * to the window formulation. Output: array<struct<score,id>> ranked.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, id)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    new mutable.PriorityQueue[(Double, Long)]()(TopKByScore.evictOrder)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      TopKByScore.insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]), k)
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(e => TopKByScore.insert(buf, e, k))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "graft_topk"
}

object TopKByScore {

  /** Heap max = most evictable = lowest score, then largest id. */
  val evictOrder: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  def insert(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long),
      k: Int): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (evictOrder.compare(e, buf.head) < 0) { // e less evictable than worst
      buf.dequeue(); buf.enqueue(e)
    }
  }

  /** Column API: top-k (score, id) pairs, ranked. */
  def apply(score: Column, id: Column, k: Int): Column =
    bridge.column(
      TopKByScore(bridge.expression(score), bridge.expression(id), k)
        .toAggregateExpression())
}
