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
