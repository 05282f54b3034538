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
}
