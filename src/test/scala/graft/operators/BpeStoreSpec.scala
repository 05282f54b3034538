package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The persisted BPE training state: word counts are the additive
  * half (batch-split invariant), the merge table is derived — so a
  * store fed any batch split must train the identical table to
  * one-shot training, across replays, compaction and restart. */
class BpeStoreSpec extends SparkSpec {
  import spark.implicits._

  private val mw = 512
  private val nm = 32

  test("batch-split invariance: store-derived merges == one-shot merges") {
    val docs = Tables.documents(spark, sf)
    val oneShot = BpeTokenizer.train(
      BpeTokenizer.wordCounts(docs, "text", mw), nm)
    val store = new BpeStore("graft_bpe_spec_split", mw, nm)
    store.ingest(docs.filter(col("doc_id") % 3 === 0), "text", batchId = 0L)
    store.ingest(docs.filter(col("doc_id") % 3 === 1), "text", batchId = 1L)
    store.ingest(docs.filter(col("doc_id") % 3 === 2), "text", batchId = 2L)
    assert(store.merges(spark) == oneShot,
      "summed partial counts must train the identical merge table")
    // replay is a no-op: the derived table must not move
    store.ingest(docs.filter(col("doc_id") % 3 === 0), "text", batchId = 0L)
    assert(store.merges(spark) == oneShot, "replayed batch must not bias counts")
    // compaction folds partials without changing the model
    store.compact(spark)
    assert(store.liveSegments.size == 1)
    assert(store.merges(spark) == oneShot, "compaction must preserve the model")
    val folded = store.table(spark)
    assert(folded.groupBy(col("word")).count().filter(col("count") > 1).count() == 0,
      "compacted table must hold one row per distinct word")
  }

  test("streamed ingest loop: N batches ≡ one-shot, budgeted compaction, replay") {
    val docs = Tables.documents(spark, sf)
    val oneShot = BpeTokenizer.train(
      BpeTokenizer.wordCounts(docs, "text", mw), nm)
    val store = new BpeStore("graft_bpe_spec_loop", mw, nm, layoutBuckets = 4)
    val batches = (0 until 4).map(r => docs.filter(col("doc_id") % 4 === r))
    batches.zipWithIndex.foreach { case (b, i) =>
      val out = graft.streaming.StreamingPipelines.bpeIngestBatch(
        store, b, "text", batchId = i.toLong, maxSegments = 2)
      assert(out.count() == b.count(), "maintenance-only: batch passes through")
    }
    assert(store.liveSegments.size <= 3,
      s"segment budget not enforced: ${store.liveSegments}")
    assert(store.merges(spark) == oneShot,
      "streamed counts must derive the one-shot merge table")
    // replay the last batch through the LOOP: guard short-circuits
    graft.streaming.StreamingPipelines.bpeIngestBatch(
      store, batches.last, "text", batchId = 3L, maxSegments = 2)
    assert(store.merges(spark) == oneShot, "replayed batch biased the model")
  }

  test("restart adoption re-derives the identical merges (file pointer)") {
    val docs = Tables.documents(spark, sf)
    val ptr = java.nio.file.Files.createTempDirectory("graft-bpe-ptr")
      .resolve("bpe.ptr")
    val a = new BpeStore("graft_bpe_spec_adopt", mw, nm,
      pointer = new graft.streaming.FilePointer(ptr))
    a.ingest(docs, "text", batchId = 7L)
    val expect = a.merges(spark)
    a.liveSegments.foreach(k =>
      spark.sql(s"DROP TABLE IF EXISTS graft_bpe_spec_adopt_s$k"))
    val b = new BpeStore("graft_bpe_spec_adopt", mw, nm,
      pointer = new graft.streaming.FilePointer(ptr))
    assert(b.merges(spark) == expect,
      "a restarted store must re-derive the committed corpus's merges")
    assert(b.isReplay(7L) && !b.isReplay(8L))
  }
}
