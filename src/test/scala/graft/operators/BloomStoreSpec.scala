package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.functions.ShardedBloomHolder
import org.apache.spark.sql.functions._

/** The persisted sharded bloom sketch (VERDICT r08 task 2): incremental
  * batch-filter merges must be indistinguishable from a from-scratch
  * build (bit-identical — the no-false-negative property rides on it),
  * replays must no-op, the gate must stay exact at any fpp, and the
  * sharded gate must bound the per-probe object at sketch/nShards. */
class BloomStoreSpec extends SparkSpec {

  private def hashes(df: org.apache.spark.sql.DataFrame) =
    df.select(md5(col("text")).as("text_hash")).filter(col("text_hash").isNotNull)

  test("N-batch incremental merge is bit-identical to the from-scratch build") {
    val docs = Tables.documents(spark, sf)
    val h = hashes(docs)
    val n = h.count()
    val incremental = new BloomStore(
      Files.createTempDirectory("bloom-inc").toString, n, nShards = 8)
    // three uneven batches split on the leading nibble
    incremental.merge(h.filter(col("text_hash") < "4"), "text_hash")
    incremental.merge(h.filter(col("text_hash") >= "4" && col("text_hash") < "b"), "text_hash")
    incremental.merge(h.filter(col("text_hash") >= "b"), "text_hash")
    val scratch = new BloomStore(
      Files.createTempDirectory("bloom-scratch").toString, n, nShards = 8)
    scratch.merge(h, "text_hash")
    assert(incremental.shardByteSizes == scratch.shardByteSizes)
    // bit-identical shards: OR-merge of per-batch filters == one build
    // over the union — hence zero false negatives by construction
    assert(incremental.shardBytes.zip(scratch.shardBytes)
      .forall { case (a, b) => java.util.Arrays.equals(a, b) },
      "incrementally merged sketch must equal the from-scratch build")
    // and the gate admits EVERY seen key (no false negatives)
    val misses = h.filter(!coalesce(incremental.mightContain(col("text_hash")), lit(false)))
      .count()
    assert(misses == 0, s"false negatives are impossible in a bloom OR-merge, got $misses")
  }

  test("replayed batchId is a no-op; sizes stay capacity-constant across merges") {
    val docs = Tables.documents(spark, sf)
    val h = hashes(docs)
    val store = new BloomStore(
      Files.createTempDirectory("bloom-replay").toString, 1000, nShards = 4)
    store.merge(h.limit(50), "text_hash", batchId = 0L)
    val sizesAfter1 = store.shardByteSizes
    store.merge(h.limit(50), "text_hash", batchId = 0L) // at-least-once replay
    assert(store.isReplay(0L))
    store.merge(h, "text_hash", batchId = 1L)
    // capacity-sized bit arrays: growth in CONTENT never grows the
    // artifact — the serialized size is a function of (capacity, fpp)
    assert(store.shardByteSizes == sizesAfter1,
      "shard sizes must be capacity-constant, independent of content")
  }

  test("store-gated dedup == anti-join dedup exactly, even at absurd fpp") {
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val seen = docs.filter(col("doc_id") % 5 =!= 0)
    // capacity 1 per shard → the filter saturates → near-100% false
    // positives → everything routes through the confirm join; output
    // must STILL be exact (the gate only routes)
    val saturated = new BloomStore(
      Files.createTempDirectory("bloom-sat").toString, 4, fpp = 0.5, nShards = 4)
    saturated.merge(hashes(seen), "text_hash")
    val got = Dedup.incrementalExactBloomFromStore(batch, seen, saturated, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = Dedup.incrementalExact(batch, seen, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty)
  }

  test("pre-first-merge store: every batch first is definite-new (exact)") {
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val empty = new BloomStore(
      Files.createTempDirectory("bloom-empty").toString, 10)
    val got = Dedup.incrementalExactBloomFromStore(
      batch, batch.limit(0), empty, "doc_id", "text").count()
    val want = Dedup.exact(batch, "doc_id", "text").count()
    assert(got == want)
  }

  test("sharded gate: plan is a scan-side filter; per-shard object is sketch/nShards") {
    val docs = Tables.documents(spark, sf)
    val h = hashes(docs)
    val n = h.count()
    val store = new BloomStore(
      Files.createTempDirectory("bloom-shard").toString, n, nShards = 8)
    store.merge(h, "text_hash")
    // size pin: each shard's serialized filter is ~1/nShards of the
    // equivalent monolithic sketch (equal capacity split), so the
    // per-task deserialized object is bounded by the shard
    val mono = new BloomStore(
      Files.createTempDirectory("bloom-mono").toString, n, nShards = 1)
    mono.merge(h, "text_hash")
    val shardMax = store.shardByteSizes.max
    assert(shardMax * 4 < mono.shardByteSizes.head,
      s"a shard ($shardMax B) must be a small fraction of the monolithic " +
        s"sketch (${mono.shardByteSizes.head} B)")
    // plan pin: the gate is a native scan-side filter — no join, no
    // aggregation, no shuffle introduced by the membership test itself
    val gated = docs.select(md5(col("text")).as("text_hash"))
      .filter(coalesce(store.mightContain(col("text_hash")), lit(false)))
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("graft_sharded_bloom_contains"),
      s"gate must be the native sharded expression:\n$plan")
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"the membership gate must run scan-side:\n$plan")
    // build/gate shard agreement: every seen key hits (no drift between
    // groupByKey's shardOfHex and the expression's nibble parse)
    assert(docs.select(md5(col("text")).as("h")).filter(col("h").isNotNull)
      .filter(!store.mightContain(col("h"))).count() == 0)
  }

  test("shardOfHex rejects non-hex keys loudly") {
    intercept[IllegalArgumentException](ShardedBloomHolder.shardOfHex("zz00", 4))
    intercept[IllegalArgumentException](ShardedBloomHolder.shardOfHex("a", 4))
  }

  test("restart adopts the committed sketch: gate, replay guard, merge base") {
    val docs = Tables.documents(spark, sf)
    val h = hashes(docs)
    val n = h.count()
    val dir = Files.createTempDirectory("bloom-restart").toString
    val before = new BloomStore(dir, n, nShards = 8)
    val old = h.filter(col("text_hash") < "8")
    before.merge(old, "text_hash", batchId = 7L)

    // a NEW instance over the same dir = driver restart
    val after = new BloomStore(dir, n, nShards = 8)
    // (a) replay guard survives: the checkpoint-replayed batch no-ops
    assert(after.isReplay(7L),
      "persisted last-batch id must survive the restart — otherwise a " +
        "checkpoint replay double-merges into the adopted sketch")
    // (b) no false negatives across the restart: every pre-restart key
    // still gates as seen (a fresh-empty gate would route every one of
    // them definite-new — silent duplicate ship)
    val misses = old
      .filter(!coalesce(after.mightContain(col("text_hash")), lit(false)))
      .count()
    assert(misses == 0,
      s"adopted gate lost $misses pre-restart keys (false negatives)")
    // (c) post-restart merges OR into the ADOPTED base: final bytes ==
    // a single-JVM two-batch build
    after.merge(h.filter(col("text_hash") >= "8"), "text_hash", batchId = 8L)
    val oneJvm = new BloomStore(
      Files.createTempDirectory("bloom-restart-ref").toString, n, nShards = 8)
    oneJvm.merge(old, "text_hash")
    oneJvm.merge(h.filter(col("text_hash") >= "8"), "text_hash")
    assert(after.shardBytes.zip(oneJvm.shardBytes)
      .forall { case (a, b) => java.util.Arrays.equals(a, b) },
      "merge after restart must OR into the adopted sketch, " +
        "bit-identical to an uninterrupted build")
  }

  test("restart refuses a sketch persisted under a different shard count") {
    val docs = Tables.documents(spark, sf)
    val h = hashes(docs)
    val dir = Files.createTempDirectory("bloom-drift").toString
    new BloomStore(dir, 100, nShards = 8).merge(h.limit(20), "text_hash")
    // probing shard s of a differently-sharded sketch would produce
    // FALSE NEGATIVES — must fail loudly at construction, not silently
    // leak duplicates at probe time
    intercept[IllegalArgumentException](new BloomStore(dir, 100, nShards = 4))
    intercept[IllegalArgumentException](new BloomStore(dir, 100, nShards = 16))
  }
}
