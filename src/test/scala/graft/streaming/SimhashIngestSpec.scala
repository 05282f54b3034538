package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.SimhashStore

/** The SimHash dedup-at-ingest loop — the dedicated foreachBatch body
  * for the whole-doc fingerprint family (the legs-matrix cell that
  * previously routed through the shared LSH loop): sequential batches
  * probe the persisted banded-fingerprint table (the fingerprint rides
  * in the band rows — no corpus join), drop near-dups of the accepted
  * corpus (and batch-internal dups), and merge only survivors' bands —
  * with at-least-once replay a no-op and compaction preserving drops. */
class SimhashIngestSpec extends SparkSpec {
  import spark.implicits._

  private val dupText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val freshA =
    "fresh batch document with its own words about shuffle partitioning"

  test("sequential ingest: corpus dups drop across batches, bands accumulate for survivors only") {
    val store = new SimhashStore("graft_simhash_ingest", buckets = 2)

    def ingest(batchId: Long, docs: (Long, String)*): Set[Long] =
      StreamingPipelines.simhashIngestBatch(store,
          docs.toDF("doc_id", "text"), "doc_id", "text", batchId = batchId)
        .as[(Long, String)].collect().map(_._1).toSet

    // batch 0: internal dup pair (10, 11) → 11 drops (earlier id is
    // the canonical); 12 fresh
    val b0 = ingest(0L,
      (10L, dupText),
      (11L, dupText),
      (12L, "completely unrelated words about catalyst physical planning"))
    assert(b0 == Set(10L, 12L), s"got $b0")

    // batch 1: 20 dups ACCEPTED 10 → drops via the store probe; 21
    // fresh; 22 dups 21 (internal) → drops
    val b1 = ingest(1L, (20L, dupText), (21L, freshA), (22L, freshA))
    assert(b1 == Set(21L), s"got $b1")

    // batch 2: 30 dups the batch-1 survivor 21 → drops; proves bands
    // MERGED in batch 1 are live in the store view
    val b2 = ingest(2L,
      (30L, freshA),
      (31L, "entirely new content on bucketed parquet and bounded state"))
    assert(b2 == Set(31L), s"got $b2")

    // store carries bands for survivors only
    assert(store.table(spark).select("doc_id").distinct()
      .as[Long].collect().toSet == Set(10L, 12L, 21L, 31L))

    // at-least-once replay of batch 2: same survivors, no band growth
    // (the seen view excludes the batch's ids, so 31's already-merged
    // bands cannot flip its own verdict)
    val before = store.table(spark).count()
    val replay = StreamingPipelines.simhashIngestBatch(store,
      Seq((30L, freshA),
        (31L, "entirely new content on bucketed parquet and bounded state"))
        .toDF("doc_id", "text"),
      "doc_id", "text", batchId = 2L)
    assert(replay.as[(Long, String)].collect().map(_._1).toSet == Set(31L),
      "replay computes the same survivors")
    assert(store.table(spark).count() == before,
      "replayed batchId must not merge bands twice")
  }

  test("ingest loop compacts on its segment budget; drops survive the folds") {
    val store = new SimhashStore("graft_simhash_ingest_cadence", buckets = 2)

    def ingest(batchId: Long, docs: (Long, String)*): Set[Long] =
      StreamingPipelines.simhashIngestBatch(store,
          docs.toDF("doc_id", "text"), "doc_id", "text",
          batchId = batchId, maxSegments = 1)
        .as[(Long, String)].collect().map(_._1).toSet

    ingest(0L, (10L, dupText))
    ingest(1L, (20L, "another corpus entirely about adaptive query execution"))
    ingest(2L, (30L, "a third direction on watermarks and state eviction"))
    assert(store.liveSegments.size == 1,
      s"segment budget not enforced by the loop: ${store.liveSegments}")
    // the folds lost nothing: a dup of the BATCH-0 survivor (two
    // compactions ago) still drops against the compacted store
    val b3 = ingest(3L, (40L, dupText),
      (41L, "genuinely novel text on bucket pruning"))
    assert(b3 == Set(41L), s"got $b3")
    assert(store.table(spark).select("doc_id").distinct()
      .as[Long].collect().toSet == Set(10L, 20L, 30L, 41L))
  }

  test("ingest loop drives from a real stream via foreachBatch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new SimhashStore("graft_simhash_ingest_stream", buckets = 2)
    val accepted = scala.collection.mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = StreamingPipelines.simhashIngestBatch(store, batch,
            "doc_id", "text", batchId = batchId)
          .as[(Long, String)].collect()
        accepted.synchronized { accepted ++= out.map(_._1) }
        ()
      }.start()
    try {
      in.addData((1L, dupText), (2L, "unrelated words about spark engines here"))
      q.processAllAvailable()
      in.addData((3L, dupText)) // dup of accepted 1 → dropped
      q.processAllAvailable()
      assert(accepted.toSet == Set(1L, 2L), s"got ${accepted.toSet}")
    } finally q.stop()
  }

  test("non-long doc ids fail LOUDLY at the store boundary (no silent type coercion)") {
    val store = new SimhashStore("graft_simhash_ingest_strid", buckets = 2)
    val batch = Seq(("doc-a", dupText), ("doc-b", dupText))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingPipelines.simhashIngestBatch(store, batch,
        "doc_id", "text", batchId = 0L).collect()
    }
    assert(e.getMessage.contains("LONG doc ids"), e.getMessage)
  }
}
