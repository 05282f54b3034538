package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Golden trace for J1 streaming: eager inner matches, watermark-gated
  * null extension for unmatched lefts (no Kafka-1.1 spurious nulls —
  * SURVEY.md §7.5.3). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("left-outer stream-stream join: match emits eagerly, null row after watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[(String, Timestamp)]
    val clks = MemoryStream[(String, Timestamp, String)]
    val joined = StreamingPipelines.adJoinStream(
      imps.toDF.toDF("impression_id", "imp_ts"),
      clks.toDF.toDF("impression_id", "clk_ts", "click_id"))
    val q = joined.writeStream
      .format("memory").queryName("sjoin")
      .outputMode(OutputMode.Append())
      .start()
    def rows() = spark.table("sjoin")
      .select("impression_id", "was_clicked").as[(String, Boolean)]
      .collect().toList

    try {
      // b1: i1 with in-window click → eager match; i2 unmatched → nothing yet
      imps.addData(("i1", new Timestamp(100000L)), ("i2", new Timestamp(100000L)))
      clks.addData(("i1", new Timestamp(130000L), "c1"))
      q.processAllAvailable()
      assert(rows().toSet == Set(("i1", true)))

      // b2+b3: advance both watermarks far past i2's join window
      imps.addData(("i9", new Timestamp(500000L)))
      clks.addData(("i9x", new Timestamp(500000L), "c9"))
      q.processAllAvailable()
      imps.addData(("i10", new Timestamp(600000L)))
      clks.addData(("i10x", new Timestamp(600000L), "c10"))
      q.processAllAvailable()

      // i2's null-extended row must have been emitted exactly once
      assert(rows().count(_ == ("i2", false)) == 1)
      // the late-filler impressions i9/i10 are themselves still open or
      // emitted unmatched — but never matched
      assert(!rows().contains(("i2", true)))
    } finally q.stop()
  }

  test("J1 parity: streaming join == batch join on the real ad fixtures") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.sources.AdFixtures
    import org.apache.spark.sql.functions._

    // real sf0.001 fixtures, replayed per-stream in event-time order so
    // a 10-minute watermark can never drop a row. At this SF the
    // fixture's click offsets all land ~90 s before their impression —
    // outside the ±60 s window — so three in-window clicks are planted
    // on BOTH sides to exercise the matched path too.
    val impRaw = AdFixtures.impressions(spark, sf)
      .select(col("impression_id"), col("impression_time_ms"))
      .as[(String, Long)].collect().sortBy(_._2)
    val planted = impRaw.take(3).zipWithIndex.map { case ((iid, ms), k) =>
      (iid, ms + 30000L, s"planted_$k")
    }
    val impRows = impRaw.map(r => (r._1, new Timestamp(r._2))).toSeq
    val clkRows = (AdFixtures.clicks(spark, sf)
        .select(col("impression_id"), col("click_time_ms"), col("click_id"))
        .as[(String, Long, String)].collect() ++ planted).sortBy(_._2)
      .map(r => (r._1, new Timestamp(r._2), r._3)).toSeq
    val batchClicks = AdFixtures.clicks(spark, sf)
      .select(col("impression_id"), col("click_time_ms"), col("click_id"))
      .union(planted.toSeq.toDF("impression_id", "click_time_ms", "click_id"))
    val maxMs = math.max(impRows.last._2.getTime, clkRows.last._2.getTime)

    val imps = MemoryStream[(String, Timestamp)]
    val clks = MemoryStream[(String, Timestamp, String)]
    val q = StreamingPipelines.adJoinStream(
        imps.toDF.toDF("impression_id", "imp_ts"),
        clks.toDF.toDF("impression_id", "clk_ts", "click_id"),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sjoin_parity")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val (i1, i2) = impRows.splitAt(impRows.size / 2)
      val (c1, c2) = clkRows.splitAt(clkRows.size / 2)
      imps.addData(i1); clks.addData(c1); q.processAllAvailable()
      imps.addData(i2); clks.addData(c2); q.processAllAvailable()
      // two sentinel rounds on BOTH streams: the global watermark is the
      // min across streams, and unmatched lefts only emit once it passes
      // their join window
      (3 to 4).foreach { d =>
        imps.addData((s"sentinel_i$d", new Timestamp(maxMs + d * 86400000L)))
        clks.addData((s"sentinel_c$d", new Timestamp(maxMs + d * 86400000L), s"sc$d"))
        q.processAllAvailable()
      }
      val streamed = spark.table("sjoin_parity")
        .filter(!col("impression_id").startsWith("sentinel_"))
        .select(col("impression_id"), col("click_id"), col("was_clicked"))
        .as[(String, Option[String], Boolean)].collect().toSeq.sorted
      val batch = graft.operators.ClickThroughRate.joinImpressionsClicks(
          AdFixtures.impressions(spark, sf), batchClicks)
        .select(col("impression_id"), col("click_id"), col("was_clicked"))
        .as[(String, Option[String], Boolean)].collect().toSeq.sorted
      assert(batch.nonEmpty && batch.exists(_._3) && batch.exists(!_._3),
        "fixture must exercise both matched and unmatched impressions")
      assert(streamed == batch,
        s"streaming=${streamed.size} rows, batch=${batch.size} rows")
    } finally q.stop()
  }
}
