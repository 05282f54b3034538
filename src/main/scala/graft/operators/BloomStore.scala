package graft.operators

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.{ShardedBloomContains, ShardedBloomHolder}
import graft.streaming.VersionedParquetStore

/** Persisted, incrementally-merged, SHARDED bloom sketch — the
  * seen-hash artifact behind [[Dedup.incrementalExactBloomFromStore]]'s
  * scan-side exact-dedup gate.
  *
  * The per-snapshot form ([[Dedup.incrementalExactBloom]]) re-aggregates
  * the ENTIRE seen corpus into a fresh filter every time the corpus
  * advances — at 10⁹ docs that is a full corpus scan + sketch
  * aggregation repeated per snapshot, forever. Here the sketch is a
  * maintained store: each ACCEPTED batch builds its own filter from its
  * own keys only (one distributed pass over the BATCH — a groupByKey on
  * the shard nibbles, one compatible-capacity filter per shard task)
  * and ORs it into the current sketch (`mergeInPlace`, bit-identical to
  * a from-scratch build over the union — BloomStoreSpec pins the byte
  * equality). Publish is [[graft.streaming.VersionedParquetStore]]'s
  * version-publish: serialized shards land in a fresh version dir,
  * the pointer flips, a replayed foreachBatch batchId is a no-op.
  *
  * Sharding (per first-two-hex-nibble prefix) bounds the probe-side
  * object: the gate expression holds a Broadcast of the shard byte
  * arrays (shipped once per executor, never per task closure) and
  * deserializes only the shards a task actually probes — the per-task
  * working set is sketch/nShards. At 10⁹ keys @ 1% fpp the monolithic
  * filter is ~1.2 GB; 256 shards keep each under ~5 MB.
  *
  * False negatives cannot exist (bloom property, preserved by OR-merge),
  * so a gate miss is PROOF the key is new — the exactness of the dedup
  * output never depends on fpp (false positives die in the confirm
  * join). A batch must only merge once (the batchId guard handles
  * streaming replays); keys are lowercase-hex digests (md5 output).
  */
final class BloomStore(dir: String, expectedItems: Long,
    fpp: Double = 0.01, nShards: Int = 16) {

  def this(expectedItems: Long) =
    this(Files.createTempDirectory("graft-bloom-store").toString, expectedItems)

  require(nShards >= 1 && nShards <= 256,
    s"nShards must be in [1, 256] (the shard is a two-nibble prefix), got $nShards")
  require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")

  private val perShardCapacity: Long = math.max(1L, expectedItems / nShards)

  private val store = new VersionedParquetStore(dir)
  // (serialized shards, gate holder) — immutable once published; the
  // holder's Broadcast re-ships per publish, replacing the previous
  @volatile private var published: Option[(Array[Array[Byte]], ShardedBloomHolder)] = None

  /** True when `batchId` was already merged — [[merge]] would no-op. */
  def isReplay(batchId: Long): Boolean = store.isReplay(batchId)

  /** Serialized shard sizes (empty before the first merge) — constant
    * across merges by construction (capacity-sized bit arrays), the
    * size pin BloomStoreSpec asserts. */
  def shardByteSizes: Seq[Int] =
    published.map(_._1.map(_.length).toSeq).getOrElse(Nil)

  /** The published serialized shards — BloomStoreSpec pins the
    * incremental merge bit-identical to a from-scratch build. */
  private[graft] def shardBytes: Seq[Array[Byte]] =
    published.map(_._1.toSeq).getOrElse(Nil)

  /** Merge one accepted batch's key digests (string column `keyCol`,
    * lowercase hex, nulls ignored): one distributed pass over the
    * batch builds per-shard filters, the driver ORs them into the
    * current sketch and publishes the new version. Cost is
    * O(|batch|) scan + O(sketch bits) OR — never a corpus pass. */
  def merge(batchKeys: DataFrame, keyCol: String,
      batchId: Long = VersionedParquetStore.NoBatchId): Unit = synchronized {
    if (store.isReplay(batchId)) return
    val spark = batchKeys.sparkSession
    import spark.implicits._
    val cap = perShardCapacity
    val p = fpp
    val ns = nShards
    val batchShards: Array[(Int, Array[Byte])] = batchKeys
      .select(col(keyCol).cast("string").as("k"))
      .na.drop().as[String]
      .groupByKey(k => ShardedBloomHolder.shardOfHex(k, ns))
      .mapGroups { (s, keys) =>
        val bf = BloomFilter.create(cap, p)
        keys.foreach(k => bf.putBinary(k.getBytes(StandardCharsets.UTF_8)))
        (s, BloomStore.serialize(bf))
      }.collect()
    var nextBytes: Array[Array[Byte]] = null
    val applied = store.publish(batchId) { nextDir =>
      // copy-then-OR: the published shards stay immutable for readers
      val base: Array[BloomFilter] = published match {
        case Some((bytes, _)) =>
          bytes.map(b => BloomFilter.readFrom(new ByteArrayInputStream(b)))
        case None => Array.fill(ns)(BloomFilter.create(cap, p))
      }
      batchShards.foreach { case (s, b) =>
        base(s).mergeInPlace(BloomFilter.readFrom(new ByteArrayInputStream(b)))
      }
      nextBytes = base.map(BloomStore.serialize)
      Files.createDirectories(Paths.get(nextDir))
      nextBytes.zipWithIndex.foreach { case (b, i) =>
        Files.write(Paths.get(nextDir, s"shard-$i.bloom"), b)
      }
    }
    if (applied) {
      val bc = spark.sparkContext.broadcast(nextBytes)
      published = Some((nextBytes, new ShardedBloomHolder(bc)))
    }
  }

  /** The scan-side sharded membership gate over the CURRENT sketch.
    * Before the first merge every key is definite-new: literal false. */
  def mightContain(c: Column): Column = published match {
    case Some((_, holder)) => ShardedBloomContains(c, holder)
    case None => lit(false)
  }
}

private[graft] object BloomStore {
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
