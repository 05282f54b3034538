package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Golden trace for the streaming Aggregations topology (SURVEY.md §5.2.4):
  * update-mode emission per micro-batch, late-data re-aggregation inside
  * the watermark, drop beyond it. */
class WindowedAvgStreamSpec extends SparkSpec {
  import spark.implicits._

  test("update-mode trace: re-emit on late data, drop past watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val out = graft.operators.WindowedAverages
      .windowedAvgStream(in.toDF.toDF("ts", "value"), "ts", "value")
    val q = out.writeStream
      .format("memory").queryName("wavg")
      .outputMode(OutputMode.Update())
      .start()
    def table() = spark.table("wavg")
      .select("win_key", "avg_total", "n").as[(String, Double, Long)]
      .collect().toList

    try {
      // b1: two windows
      in.addData((new Timestamp(10000L), 10.0), (new Timestamp(35000L), 30.0))
      q.processAllAvailable()
      assert(table().toSet ==
        Set(("0-30000-0", 10.0, 1L), ("30000-60000-0", 30.0, 1L)))

      // b2: late row for window 0 (watermark still below 0) → re-emit
      in.addData((new Timestamp(5000L), 20.0))
      q.processAllAvailable()
      assert(table().contains(("0-30000-0", 15.0, 2L)))

      // b3: jump event time far ahead → watermark advances past window 0
      in.addData((new Timestamp(200000L), 1.0))
      q.processAllAvailable()
      val before = table().size

      // b4: row older than watermark (200s - 60s = 140s) → dropped silently
      in.addData((new Timestamp(5000L), 999.0))
      q.processAllAvailable()
      assert(table().size == before)           // no new update emitted
      assert(table().contains(("0-30000-0", 15.0, 2L))) // unchanged
    } finally q.stop()
  }
}
