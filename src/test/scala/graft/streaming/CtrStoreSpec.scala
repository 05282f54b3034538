package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.ClickThroughRate

/** End-to-end streaming-vs-batch consistency: the full streaming CTR
  * topology (join → foreachBatch increments → keyed store) must converge
  * to exactly the batch pipeline's counts once the watermark passes all
  * events. */
class CtrStoreSpec extends SparkSpec {
  import spark.implicits._

  test("streaming foreachBatch CTR converges to the batch CTR") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[(String, Timestamp, String)]
    val clks = MemoryStream[(String, Timestamp, String)]
    val joined = StreamingPipelines.adJoinStream(
      imps.toDF.toDF("impression_id", "imp_ts", "ad_id"),
      clks.toDF.toDF("impression_id", "clk_ts", "click_id"))

    val store = new CtrStore
    val q = joined.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        store.merge(StreamingPipelines.ctrIncrements(batch))
      }
      .start()

    def ts(s: Long) = new Timestamp(s * 1000)
    try {
      // real traffic: ad1 gets i1(clicked)+i2(unclicked), ad2 gets i3(unclicked)
      imps.addData(("i1", ts(100), "ad1"), ("i2", ts(100), "ad1"),
        ("i3", ts(110), "ad2"))
      clks.addData(("i1", ts(120), "c1"))
      q.processAllAvailable()
      // advance both watermarks far past all join windows (sentinel ads)
      imps.addData(("ix", ts(5000), "sentinel"))
      clks.addData(("ix2", ts(5000), "cx"))
      q.processAllAvailable()
      imps.addData(("iy", ts(9000), "sentinel"))
      clks.addData(("iy2", ts(9000), "cy"))
      q.processAllAvailable()

      val snap = store.snapshot()
      assert(snap("ad1") == ((1L, 1L, 1.0)))
      assert(snap("ad2") == ((1L, 0L, 0.0)))

      // batch reference on the same data (sans sentinels)
      val bImps = Seq(("i1", 100000L, "ad1"), ("i2", 100000L, "ad1"),
        ("i3", 110000L, "ad2")).toDF("impression_id", "impression_time_ms", "ad_id")
      val bClks = Seq(("i1", 120000L, "c1"))
        .toDF("impression_id", "click_time_ms", "click_id")
      val batch = ClickThroughRate
        .adCounts(ClickThroughRate.joinImpressionsClicks(bImps, bClks))
        .select(col("ad_id"), col("num_impressions"), col("num_clicks"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      batch.foreach { case (ad, (bi, bc)) =>
        val (si, sc, _) = snap(ad)
        assert((si, sc) == ((bi, bc)), s"ad $ad: streaming ($si,$sc) != batch ($bi,$bc)")
      }
    } finally q.stop()
  }

  test("ctrBatchUpdates: replay-guarded merge, touched-ads-only emission") {
    // the extracted ClickThroughRateApp foreachBatch body — the one
    // genuinely-runnable broker path, pinned broker-free through the
    // seam function (round-9 finding: the app previously dropped the
    // batchId and collect-emitted the WHOLE table per trigger)
    val store = new CtrStore
    def joinedBatch(rows: Seq[(String, String, Boolean)]) =
      rows.toDF("impression_id", "ad_id", "was_clicked")

    // batch 0 touches ad1+ad2
    val up0 = StreamingPipelines.ctrBatchUpdates(store,
      joinedBatch(Seq(("i1", "ad1", true), ("i2", "ad1", false),
        ("i3", "ad2", false))), batchId = 0L)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(up0.toSeq == Seq(("ad1", 1L, 1L, 1.0), ("ad2", 1L, 0L, 0.0)))

    // batch 1 touches ONLY ad2 — ad1 must not re-emit, and ad2's
    // update carries the MERGED totals, not the batch increment
    val up1 = StreamingPipelines.ctrBatchUpdates(store,
      joinedBatch(Seq(("i4", "ad2", true))), batchId = 1L)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(up1.toSeq == Seq(("ad2", 1L, 1L, 1.0)),
      s"emission must be the batch's touched ads only, got ${up1.toSeq}")

    // at-least-once REPLAY of batch 1: the merge is a no-op (no double
    // count) and the emission re-sends the already-merged values
    val up1r = StreamingPipelines.ctrBatchUpdates(store,
      joinedBatch(Seq(("i4", "ad2", true))), batchId = 1L)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(up1r.toSeq == Seq(("ad2", 1L, 1L, 1.0)),
      "replayed batch must re-emit merged values, not double-count")
    assert(store.snapshot() == Map(
      "ad1" -> ((1L, 1L, 1.0)), "ad2" -> ((1L, 1L, 1.0))),
      "store after replay must equal store before replay")
  }

  test("restart adopts the committed KTable: counts, snapshot, replay guard") {
    val dir = java.nio.file.Files.createTempDirectory("ctr-restart").toString
    val before = new CtrStore(dir)
    before.merge(Seq(("ad1", 3L, 1L), ("ad2", 2L, 0L))
      .toDF("ad_id", "num_impressions", "num_clicks"), batchId = 5L)

    // a NEW instance over the same dir = driver restart
    val after = new CtrStore(dir)
    assert(after.snapshot() == before.snapshot(),
      "a restarted driver must resume the committed KTable, not zero it")
    // replay guard survives: the checkpoint-replayed batch applies
    // exactly once ACROSS the restart
    after.merge(Seq(("ad1", 3L, 1L), ("ad2", 2L, 0L))
      .toDF("ad_id", "num_impressions", "num_clicks"), batchId = 5L)
    assert(after.snapshot()("ad1") == ((3L, 1L, 1.0 / 3)),
      "replayed batch after restart must not double-count")
    // and NEW batches keep accumulating on the adopted base
    after.merge(Seq(("ad1", 1L, 0L))
      .toDF("ad_id", "num_impressions", "num_clicks"), batchId = 6L)
    assert(after.snapshot()("ad1") == ((4L, 1L, 0.25)))
  }
}
