package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.BandStore

/** The store-backed incremental near-dup ingest loop: sequential
  * batches probe the persisted band table, drop near-dups of the
  * accepted corpus (and later batch-internal dups, transitively), and
  * merge only survivors' bands — with at-least-once replay a no-op. */
class BandStoreIngestSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"

  test("sequential ingest: corpus dups drop across batches, bands accumulate for survivors only") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new BandStore("graft_band_store_ingest", buckets = 2)
    val accepted = scala.collection.mutable.ArrayBuffer[(Long, String)]()

    def ingest(batchId: Long, docs: (Long, String)*): Set[Long] = {
      val seen = accepted.toSeq.toDF("doc_id", "text")
      val out = StreamingPipelines.nearDupIngestBatch(store, seen,
          docs.toDF("doc_id", "text"), "doc_id", "text",
          threshold = 0.5, batchId = batchId)
        .as[(Long, String)].collect()
      accepted ++= out
      out.map(_._1).toSet
    }

    // batch 0: internal near-dup pair (10, 11) → 11 drops; 12 fresh
    val b0 = ingest(0L,
      (10L, base + " nu"),
      (11L, base + " xi"),
      (12L, "completely unrelated words about catalyst physical planning"))
    assert(b0 == Set(10L, 12L), s"got $b0")

    // batch 1: 20 is a near-dup of ACCEPTED 10 → drops via the store
    // probe; 21 fresh; 22 near-dup of 21 (internal) → drops
    val b1 = ingest(1L,
      (20L, base + " omicron"),
      (21L, "fresh batch document with its own words about shuffle partitioning"),
      (22L, "fresh batch document with its own words about shuffle plans"))
    assert(b1 == Set(21L), s"got $b1")

    // batch 2: 30 near-dup of the batch-1 survivor 21 → drops; proves
    // bands MERGED in batch 1 are live in the store view
    val b2 = ingest(2L,
      (30L, "fresh batch document with its own words about shuffle machines"),
      (31L, "entirely new content on bucketed parquet and bounded state"))
    assert(b2 == Set(31L), s"got $b2")

    // store carries bands for survivors only (4 docs × 4 bands)
    assert(store.table(spark).select("doc_id").distinct()
      .as[Long].collect().toSet == Set(10L, 12L, 21L, 31L))

    // at-least-once replay of batch 2: no new drops, no band growth
    val before = store.table(spark).count()
    val replay = StreamingPipelines.nearDupIngestBatch(store,
      accepted.toSeq.toDF("doc_id", "text"),
      Seq((30L, "fresh batch document with its own words about shuffle machines"),
        (31L, "entirely new content on bucketed parquet and bounded state"))
        .toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5, batchId = 2L)
    assert(replay.count() == 1, "replay computes the same survivors")
    assert(store.table(spark).count() == before,
      "replayed batchId must not merge bands twice")
  }

  test("ingest loop compacts on its segment budget; drops survive the folds") {
    val store = new BandStore("graft_band_store_cadence", buckets = 2)
    val accepted = scala.collection.mutable.ArrayBuffer[(Long, String)]()

    def ingest(batchId: Long, docs: (Long, String)*): Set[Long] = {
      val out = StreamingPipelines.nearDupIngestBatch(store,
          accepted.toSeq.toDF("doc_id", "text"), docs.toDF("doc_id", "text"),
          "doc_id", "text", threshold = 0.5, batchId = batchId,
          maxSegments = 1)
        .as[(Long, String)].collect()
      accepted ++= out
      out.map(_._1).toSet
    }

    ingest(0L, (10L, base + " nu"))
    ingest(1L, (20L, "another corpus entirely about adaptive query execution"))
    ingest(2L, (30L, "a third direction on watermarks and state eviction"))
    // budget 1 → every post-merge trigger folds back to ONE live
    // segment (the bare partitioning-reporting probe scan), instead of
    // one segment per trigger forever
    assert(store.liveSegments.size == 1,
      s"segment budget not enforced by the loop: ${store.liveSegments}")
    // and the folds lost nothing: a near-dup of the BATCH-0 survivor
    // (two compactions ago) still drops against the compacted store
    val b3 = ingest(3L, (40L, base + " omicron"),
      (41L, "genuinely novel text on bucket pruning"))
    assert(b3 == Set(41L), s"got $b3")
    assert(store.table(spark).select("doc_id").distinct()
      .as[Long].collect().toSet == Set(10L, 20L, 30L, 41L))
  }

  test("non-long doc ids fail LOUDLY at the store boundary (no silent type coercion)") {
    // the store schema is long-keyed; a string-id corpus must be mapped
    // to surrogate longs — anything else must throw, not silently
    // union-coerce and disable the drop logic
    val store = new BandStore("graft_band_store_strid", buckets = 2)
    val empty = Seq.empty[(String, String)].toDF("doc_id", "text")
    val batch = Seq(
      ("doc-a", base + " nu"),
      ("doc-b", base + " xi"),
      ("doc-c", "entirely different words about physical plans and joins"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingPipelines.nearDupIngestBatch(store, empty, batch,
        "doc_id", "text", threshold = 0.5, batchId = 0L).collect()
    }
    assert(e.getMessage.contains("LONG doc ids"), e.getMessage)
  }

  test("ingest loop drives from a real stream via foreachBatch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new BandStore("graft_band_store_ingest_stream", buckets = 2)
    val accepted = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val seen = accepted.toSeq.toDF("doc_id", "text")
        val out = StreamingPipelines.nearDupIngestBatch(store, seen, batch,
            "doc_id", "text", threshold = 0.5, batchId = batchId)
          .as[(Long, String)].collect()
        accepted.synchronized { accepted ++= out }
        ()
      }.start()
    try {
      in.addData((1L, base + " nu"), (2L, "unrelated words about spark engines here"))
      q.processAllAvailable()
      in.addData((3L, base + " xi")) // near-dup of accepted 1 → dropped
      q.processAllAvailable()
      assert(accepted.map(_._1).toSet == Set(1L, 2L),
        s"got ${accepted.map(_._1).toSet}")
    } finally q.stop()
  }
}
