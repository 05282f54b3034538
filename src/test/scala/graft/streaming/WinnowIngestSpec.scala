package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The winnow dedup-at-ingest loop
  * ([[StreamingPipelines.winnowIngestBatch]]): sequential batches
  * probed against the persisted fingerprint sketch, the shared drop
  * policy, survivor-only sketch accumulation, replay idempotency. */
class WinnowIngestSpec extends SparkSpec {
  import spark.implicits._

  // a long shared passage (30 tokens ≫ k+w−1) guarantees ≥ MinShared
  // shared selected fingerprints between any two carriers
  private val passage = (1 to 30).map(i => s"pp$i").mkString(" ")
  private def doc(id: Long, prefix: String): (Long, String) =
    id -> s"$prefix-a $prefix-b $prefix-c $passage $prefix-d $prefix-e"

  test("sequential ingest: cross-batch drops, batch-internal keeps-earlier, survivor-only sketch") {
    val store = new graft.operators.WinnowStore(
      s"graft_winnow_ingest_${System.nanoTime()}")

    // batch 1: two internal carriers of the passage + one clean doc —
    // the later carrier (12) drops, the earlier (11) survives
    val b1 = Seq(doc(11L, "b1x"), doc(12L, "b1y"),
      15L -> (100 to 130).map(i => s"cl$i").mkString(" ")).toDF("doc_id", "text")
    val s1 = StreamingPipelines.winnowIngestBatch(store, b1, "doc_id", "text",
      batchId = 1L).as[(Long, String)].collect().map(_._1).toSet
    assert(s1 == Set(11L, 15L), s"batch 1 survivors: $s1")

    // batch 2: a new carrier of the passage drops against the ACCEPTED
    // canonical 11 (cross-batch detection through the store); an
    // unrelated doc passes
    val b2 = Seq(doc(21L, "b2x"),
      25L -> (200 to 230).map(i => s"fr$i").mkString(" ")).toDF("doc_id", "text")
    val s2 = StreamingPipelines.winnowIngestBatch(store, b2, "doc_id", "text",
      batchId = 2L).as[(Long, String)].collect().map(_._1).toSet
    assert(s2 == Set(25L), s"batch 2 survivors: $s2")

    // survivor-only accumulation: the store's sketch holds fingerprints
    // for exactly the surviving ids — dropped carriers never merged
    val storedIds = store.table(spark).select(col("doc_id"))
      .distinct().as[Long].collect().toSet
    assert(storedIds == Set(11L, 15L, 25L), s"stored ids: $storedIds")

    // replay of batch 2 (at-least-once delivery): same survivors out,
    // no sketch growth
    val before = store.table(spark).count()
    val replay = StreamingPipelines.winnowIngestBatch(store, b2, "doc_id",
      "text", batchId = 2L).as[(Long, String)].collect().map(_._1).toSet
    assert(replay == s2, "replay must emit the original survivors")
    assert(store.table(spark).count() == before, "replay must not re-merge")
  }
}
