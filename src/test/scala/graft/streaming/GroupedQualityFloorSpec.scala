package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** The streaming per-group floor must equal batch qualityFloorByGroup
  * on every finalized horizon — per-group histograms, the SHARED
  * grouped cutoff arithmetic, read-time verdicts. */
class GroupedQualityFloorSpec extends SparkSpec {
  import spark.implicits._

  private val KeepFrac = 0.6

  // two "languages" whose quality distributions sit at different
  // levels — the per-group floor must cut each independently (a global
  // floor would starve the low-scoring group, which is the operator's
  // reason to exist)
  private def langOf(i: Long): String = if (i % 2 == 0) "en" else "xx"
  private def textOf(i: Long): String = (i % 3, i % 2) match {
    case (0, 0) => Seq.fill(8)("the quick brown fox is of a kind and").mkString(" ") + s" marker $i"
    case (_, 0) => s"plain words with the and of number $i mixed in shortish text"
    case (0, 1) => s"wort folge ohne treffer nummer $i lang genug geschrieben hier"
    case (_, 1) => s"$i 88 12 99 ${i * 7} 3 4 5"
  }

  test("stream-merged grouped floor == batch qualityFloorByGroup per horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new GroupedQualityFloorStore(KeepFrac, "lang")
    val in = MemoryStream[(Long, String, String)]
    val sunk = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val q = in.toDF.toDF("doc_id", "lang", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val scored = batch.select(col("doc_id"), col("lang"),
          store.qualityBp(col("text")).as("quality_bp"))
        val rows = scored.as[(Long, String, Long)].collect()
        sunk.synchronized { sunk ++= rows }
        store.merge(scored)
      }.start()

    def streamCurated(): Set[Long] = {
      val docs = sunk.synchronized { sunk.toSeq }
        .toDF("doc_id", "lang", "quality_bp")
      store.curated(docs).select("doc_id").as[Long].collect().toSet
    }
    def batchCurated(upTo: Long): Set[Long] = {
      val docs = (1L to upTo).map(i => (i, langOf(i), textOf(i)))
        .toDF("doc_id", "lang", "text")
      TextAnalysis.qualityFloorByGroup(docs, "doc_id", "text", "lang", KeepFrac)
        .select("doc_id").as[Long].collect().toSet
    }

    try {
      in.addData((1L to 12L).map(i => (i, langOf(i), textOf(i))))
      q.processAllAvailable()
      assert(streamCurated() == batchCurated(12L),
        s"horizon 1: stream ${streamCurated()} vs batch ${batchCurated(12L)}")
      // each group's floor must be retroactively corpus-relative
      in.addData((13L to 30L).map(i => (i, langOf(i), textOf(i))))
      q.processAllAvailable()
      assert(streamCurated() == batchCurated(30L),
        s"horizon 2: stream ${streamCurated()} vs batch ${batchCurated(30L)}")
      // both groups keep something — the low-scoring group is not
      // starved (its own top fraction survives)
      val kept = streamCurated()
      assert(kept.exists(_ % 2 == 0) && kept.exists(_ % 2 == 1),
        s"both language groups must keep their own top fraction: $kept")
    } finally q.stop()
  }

  test("replayed batchId is a no-op; unseen group drops at read time") {
    val store = new GroupedQualityFloorStore(KeepFrac, "lang")
    val batch = Seq(("en", 9000L), ("en", 9000L), ("en", 100L))
      .toDF("lang", "quality_bp")
    store.merge(batch, batchId = 0L)
    val once = store.histogram(spark).as[(String, Long, Long)].collect().toSet
    assert(once == Set(("en", 9000L, 2L), ("en", 100L, 1L)), s"got $once")
    store.merge(batch, batchId = 0L) // replay
    assert(store.histogram(spark).as[(String, Long, Long)].collect().toSet ==
      once, "replay must not double-count")
    // a group with no merged mass has no floor: its docs drop
    val probe = Seq((1L, "en", 9000L), (2L, "de", 9999L))
      .toDF("doc_id", "lang", "quality_bp")
    assert(store.curated(probe).select("doc_id").as[Long].collect().toSet ==
      Set(1L), "unseen group must have no floor (kept nothing)")
  }

  test("histogram state is bounded by the value domain, never the stream length") {
    val store = new GroupedQualityFloorStore(KeepFrac, "lang")
    // 40 groups × 25 distinct scores; every merge re-sends the SAME
    // value domain under a new batchId — mass doubles, rows must not
    def wave() = (for (g <- 0 until 40; s <- 0 until 25)
      yield (s"g$g", (s * 17).toLong)).toDF("lang", "quality_bp")
    store.merge(wave(), batchId = 0L)
    val rowsAfter1 = store.histogram(spark).count()
    assert(rowsAfter1 == 40L * 25L, s"one row per (group, bp): $rowsAfter1")
    store.merge(wave(), batchId = 1L)
    store.merge(wave(), batchId = 2L)
    val h = store.histogram(spark)
    assert(h.count() == rowsAfter1,
      "re-sent value domain must fold into existing rows, not append")
    assert(h.agg(min(col("c")), max(col("c"))).as[(Long, Long)].head() ==
      ((3L, 3L)), "every bucket carries the tripled mass")
    assert(store.cutoffsBp.size == 40, "one cutoff per group")
  }

  test("non-string group key: the store matches the batch operator's generality") {
    // the batch qualityFloorByGroup is type-generic over the group
    // column; the streaming twin must be too (an earlier getString(0)
    // compiled for an int-keyed group and threw ClassCastException at
    // publish time). Int group key, full cycle: merge → cutoffs →
    // curated == the batch floor on the same rows.
    val store = new GroupedQualityFloorStore(KeepFrac, "bucket")
    val docs = (1L to 40L).map(i => (i, i % 3, textOf(i)))
      .toDF("doc_id", "bucket", "text")
    val scored = docs.select(col("doc_id"), col("bucket"),
      store.qualityBp(col("text")).as("quality_bp"))
    store.merge(scored, batchId = 0L)
    assert(store.cutoffsBp.size == 3, "one cutoff per int group")
    val streamed = store.curated(scored)
      .select("doc_id").as[Long].collect().toSet
    val batch = TextAnalysis.qualityFloorByGroup(docs, "doc_id", "text",
        "bucket", KeepFrac)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch,
      "int-keyed streamed floor must equal the batch grouped floor")
  }

  test("restart adopts the committed histogram: cutoffs, curated view, replay guard") {
    val dir = java.nio.file.Files.createTempDirectory("gqfloor-restart").toString
    val before = new GroupedQualityFloorStore(KeepFrac, "lang", dir)
    val docs = (1L to 30L).map(i => (i, langOf(i), textOf(i)))
      .toDF("doc_id", "lang", "text")
    val scored = docs.select(col("doc_id"), col("lang"),
      before.qualityBp(col("text")).as("quality_bp"))
    before.merge(scored, batchId = 3L)

    val after = new GroupedQualityFloorStore(KeepFrac, "lang", dir)
    assert(after.isReplay(3L))
    after.merge(scored, batchId = 3L)
    assert(after.histogram(spark).agg(sum(col("c"))).head().getLong(0) == 30L,
      "replayed batch after restart must not double-count")
    assert(after.cutoffsBp == before.cutoffsBp && after.cutoffsBp.size == 2)
    assert(after.curated(scored).select("doc_id").as[Long].collect().toSet ==
      before.curated(scored).select("doc_id").as[Long].collect().toSet)
  }
}
