package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** The streaming quality floor must equal the batch floor on every
  * finalized horizon: same histogram, same shared cutoff arithmetic,
  * read-time verdicts. The cutoff-lag semantics (verdicts between
  * batches use the histogram so far) are pinned explicitly. */
class QualityFloorStreamSpec extends SparkSpec {
  import spark.implicits._

  private val KeepFrac = 0.6

  // texts spanning the quality range: repeated good prose (high), short
  // mixed (mid), digit junk (low) — enough distinct scores that a 60%
  // floor actually cuts
  private def textOf(i: Long): String = (i % 3) match {
    case 0 => Seq.fill(8)("the quick brown fox is of a kind and").mkString(" ") + s" marker $i"
    case 1 => s"plain words with the and of number $i mixed in shortish text"
    case _ => s"$i 88 12 99 ${i * 7} 3 4 5"
  }

  test("stream-merged floor == batch qualityFloor on each finalized horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new QualityFloorStore(KeepFrac)
    val in = MemoryStream[(Long, String)]
    // accumulate the scored docs the pipeline would sink alongside the
    // histogram merge (one foreachBatch, two writes — the CtrStore shape)
    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = in.toDF.toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val scored = batch.select(col("doc_id"),
          store.qualityBp(col("text")).as("quality_bp"))
        val rows = scored.as[(Long, Long)].collect()
        sunk.synchronized { sunk ++= rows }
        store.merge(scored)
      }.start()

    def streamCurated(): Set[Long] = {
      val docs = sunk.synchronized { sunk.toSeq }.toDF("doc_id", "quality_bp")
      store.curated(docs).select("doc_id").as[Long].collect().toSet
    }
    def batchCurated(upTo: Long): Set[Long] = {
      val docs = (1L to upTo).map(i => (i, textOf(i))).toDF("doc_id", "text")
      TextAnalysis.qualityFloor(docs, "doc_id", "text", KeepFrac)
        .select("doc_id").as[Long].collect().toSet
    }

    try {
      // horizon 1: docs 1..12
      in.addData((1L to 12L).map(i => (i, textOf(i))))
      q.processAllAvailable()
      assert(streamCurated() == batchCurated(12L),
        s"horizon 1: stream ${streamCurated()} vs batch ${batchCurated(12L)}")

      // horizon 2: 18 more docs shift the distribution — the published
      // cutoff must be retroactively corpus-relative, matching a batch
      // run over everything seen so far
      in.addData((13L to 30L).map(i => (i, textOf(i))))
      q.processAllAvailable()
      assert(streamCurated() == batchCurated(30L),
        s"horizon 2: stream ${streamCurated()} vs batch ${batchCurated(30L)}")
    } finally q.stop()
  }

  test("replayed batchId is a no-op: at-least-once replay can't double-count the histogram") {
    val store = new QualityFloorStore(KeepFrac)
    val batch = Seq(9000L, 9000L, 100L).toDF("quality_bp")
    store.merge(batch, batchId = 0L)
    val once = store.histogram(spark).as[(Long, Long)].collect().toMap
    assert(once == Map(9000L -> 2L, 100L -> 1L), s"got $once")
    store.merge(batch, batchId = 0L) // replay
    val twice = store.histogram(spark).as[(Long, Long)].collect().toMap
    assert(twice == once, s"replay must not double-count: $twice")
    store.merge(batch, batchId = 1L) // genuinely new batch
    val fresh = store.histogram(spark).as[(Long, Long)].collect().toMap
    assert(fresh == Map(9000L -> 4L, 100L -> 2L), s"got $fresh")
  }

  test("cutoff lags by at most the in-flight batch; empty store keeps nothing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new QualityFloorStore(KeepFrac)
    // before any merge: no corpus, no floor, empty view
    assert(store.cutoffBp.isEmpty)
    assert(store.curated(Seq((1L, 5000L)).toDF("doc_id", "quality_bp")).count() == 0)

    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.merge(batch.select(
          store.qualityBp(col("text")).as("quality_bp")))
      }.start()
    try {
      in.addData((1L to 12L).map(i => (i, textOf(i))))
      q.processAllAvailable()
      // between batches, the published cutoff is exactly the batch
      // cutoff of the corpus SO FAR (the documented lag: batches 1..N)
      val docs = (1L to 12L).map(i => (i, textOf(i))).toDF("doc_id", "text")
      val hist = docs.select(TextAnalysis.qualityBp(col("text")).as("quality_bp"))
        .groupBy("quality_bp").agg(count(lit(1)).as("c"))
      val want = TextAnalysis.cutoffFromHistogram(hist, KeepFrac)
        .head().getLong(0)
      assert(store.cutoffBp.contains(want),
        s"published ${store.cutoffBp} vs batch-so-far $want")
    } finally q.stop()
  }

  test("restart adopts the committed histogram: cutoff, curated view, replay guard") {
    val dir = java.nio.file.Files.createTempDirectory("qfloor-restart").toString
    val before = new QualityFloorStore(KeepFrac, dir)
    val docs = (1L to 30L).map(i => (i, textOf(i))).toDF("doc_id", "text")
    val scored = docs.select(col("doc_id"),
      before.qualityBp(col("text")).as("quality_bp"))
    before.merge(scored, batchId = 3L)

    // a NEW instance over the same dir = driver restart
    val after = new QualityFloorStore(KeepFrac, dir)
    // replay guard survives: a checkpoint-replayed batch can't
    // double-count its mass into the adopted histogram
    assert(after.isReplay(3L))
    after.merge(scored, batchId = 3L)
    assert(after.histogram(spark).agg(sum(col("c"))).head().getLong(0) == 30L,
      "replayed batch after restart must not double-count")
    // the adopted cutoff equals the pre-restart one, and the curated
    // view is identical (a restart-amnesiac floor would keep NOTHING)
    assert(after.cutoffBp == before.cutoffBp)
    assert(after.cutoffBp.nonEmpty)
    assert(after.curated(scored).select("doc_id").as[Long].collect().toSet ==
      before.curated(scored).select("doc_id").as[Long].collect().toSet)
  }
}
