package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership test as a native codegen'd expression — the
  * scan-side gate of [[graft.operators.Dedup.incrementalExactBloom]].
  * The filter rides into generated code as a reference object (the
  * CentroidSet pattern): constant-size generated code at any filter
  * size, and the bits ship to executors once per task, never as an
  * expression tree. Membership is tested against the raw UTF-8 bytes —
  * bit-compatible with how `DataFrameStatFunctions.bloomFilter` puts
  * string columns (both hash the UTF-8 encoding), pinned in
  * GraftFunctionsSpec. */
case class BloomContains(child: Expression, bloom: BloomHolder)
  extends UnaryExpression {

  // analysis-time enforcement of the string contract (ExpectsInputTypes'
  // type classes are private[sql]) — without it a non-string child
  // surfaces as a mid-job ClassCastException (or a Janino compile
  // failure under codegen)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(input: Any): Any =
    BloomHolder.contains(bloom, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomHolder", bloom,
      classOf[BloomHolder].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BloomHolder.contains($ref, $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

/** Serializable carrier for the sketch: serializes as the filter's own
  * compact `writeTo` byte form and rebuilds lazily on first use per
  * deserialized instance (executor-side). Rebuild races are benign —
  * the filter is read-only. */
final class BloomHolder private (
    @transient private var bf: BloomFilter,
    private val bytes: Array[Byte]) extends Serializable {

  private[functions] def filter: BloomFilter = {
    if (bf == null)
      bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    bf
  }
}

object BloomHolder {

  def apply(bf: BloomFilter): BloomHolder = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    new BloomHolder(bf, bos.toByteArray)
  }

  /** UTF-8-byte membership — matches putString/putBinary's encoding. */
  def contains(h: BloomHolder, v: UTF8String): Boolean =
    h.filter.mightContainBinary(v.getBytes)
}

object BloomContains {
  /** Column API: `c` must be a string column. Column-only by design —
    * a SQL literal can't carry the filter object. */
  def apply(c: Column, bloom: BloomFilter): Column =
    bridge.column(BloomContains(bridge.expression(c), BloomHolder(bloom)))
}

/** Sharded membership gate — [[BloomContains]] for sketches too big to
  * ride a task closure. The serialized per-shard filters ship to
  * executors ONCE via a torrent broadcast (never per task: the
  * monolithic holder travels inside every task's serialized plan,
  * ~1.2 GB at 10⁹ keys @ 1% fpp), and each shard deserializes lazily
  * on first probe — a task whose input was repartitioned by shard
  * touches exactly one, so the per-task deserialized working set is
  * bounded by the SHARD size, not the sketch. Shard choice is the
  * key's first two hex nibbles mod nShards ([[ShardedBloomHolder.shardOfHex]])
  * — the same function the build side groups by, one implementation,
  * so gate and build can never drift. */
case class ShardedBloomContains(child: Expression, holder: ShardedBloomHolder)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_sharded_bloom_contains"

  override def nullSafeEval(input: Any): Any =
    ShardedBloomHolder.contains(holder, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shardedBloom", holder,
      classOf[ShardedBloomHolder].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShardedBloomHolder.contains($ref, $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShardedBloomContains =
    copy(child = newChild)
}

/** Carrier for the sharded sketch: holds only the Broadcast handle (a
  * few bytes per task), deserializes shards lazily into an
  * executor-JVM-level cache keyed by broadcast generation (the holder
  * itself is deserialized fresh from every task binary, so an
  * instance field would re-parse the shard once per task — with many
  * short tasks that is a per-task ~5 MB parse at the design point).
  * Rebuild races are benign — filters are read-only. Keys MUST be
  * lowercase-hex strings (md5 output): the shard is parsed from the
  * first two nibbles. */
final class ShardedBloomHolder(
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]])
  extends Serializable {

  def nShards: Int = bc.value.length

  /** Serialized sizes per shard — the size pin BloomStoreSpec asserts. */
  def shardByteSizes: Seq[Int] = bc.value.map(_.length).toSeq

  /** The underlying Broadcast — [[graft.operators.BloomStore]] retires
    * superseded generations through it. */
  private[graft] def handle: org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]] = bc

  private[functions] def shardFilter(s: Int): BloomFilter = {
    val arr = ShardedBloomHolder.generation(bc.id, bc.value.length)
    var f = arr(s)
    if (f == null) {
      f = BloomFilter.readFrom(new ByteArrayInputStream(bc.value(s)))
      arr(s) = f // benign race: read-only, any winner is equivalent
    }
    f
  }
}

object ShardedBloomHolder {

  // Executor-JVM shard cache, keyed by broadcast id (one entry per
  // sketch generation). Bounded: publishes replace the broadcast, so
  // old generations stop being probed — LRU-evict beyond the reader
  // grace depth and let GC take the parsed filters.
  private val MaxGenerations = 4
  private val generations =
    new java.util.LinkedHashMap[Long, Array[BloomFilter]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, Array[BloomFilter]]): Boolean =
        size() > MaxGenerations
    }

  private def generation(bcId: Long, n: Int): Array[BloomFilter] =
    generations.synchronized {
      var a = generations.get(bcId)
      if (a == null) { a = new Array[BloomFilter](n); generations.put(bcId, a) }
      a
    }

  /** Shard of a lowercase-hex key: first two nibbles mod nShards. ONE
    * implementation for build side (groupByKey) and gate side
    * ([[contains]] parses the same two leading ASCII bytes). */
  def shardOfHex(key: String, nShards: Int): Int = {
    require(key.length >= 2,
      s"sharded bloom keys must be hex digests (>= 2 chars), got '$key'")
    val hi = Character.digit(key.charAt(0), 16)
    val lo = Character.digit(key.charAt(1), 16)
    require(hi >= 0 && lo >= 0,
      s"sharded bloom keys must be hex digests, got '$key'")
    ((hi << 4) | lo) % nShards
  }

  /** UTF-8-byte membership against the key's shard — same encoding as
    * putBinary on the build side. Hex digits are ASCII, so the first
    * two bytes ARE the first two chars. */
  def contains(h: ShardedBloomHolder, v: UTF8String): Boolean = {
    val bytes = v.getBytes
    if (bytes.length < 2)
      throw new IllegalArgumentException(
        "sharded bloom keys must be hex digests (>= 2 chars)")
    val hi = Character.digit(bytes(0).toChar, 16)
    val lo = Character.digit(bytes(1).toChar, 16)
    if (hi < 0 || lo < 0)
      throw new IllegalArgumentException(
        s"sharded bloom keys must be hex digests, got '$v'")
    h.shardFilter(((hi << 4) | lo) % h.nShards).mightContainBinary(bytes)
  }
}

object ShardedBloomContains {
  /** Column API: `c` must be a lowercase-hex string column. */
  def apply(c: Column, holder: ShardedBloomHolder): Column =
    bridge.column(ShardedBloomContains(bridge.expression(c), holder))
}
