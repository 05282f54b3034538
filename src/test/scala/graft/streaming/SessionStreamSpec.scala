package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming session windows: merging-session state across micro-batches
  * (the stateful window shape the reference's 1.1-era DSL lacked
  * entirely — SURVEY.md §2.4 absent surface). */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("sessions merge across batches; watermark finalizes them") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val out = in.toDF.toDF("user", "ts")
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window(col("ts"), "5 seconds"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"),
        unix_millis(col("session_window.start")).as("s"),
        unix_millis(col("session_window.end")).as("e"),
        col("n"))
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    def ts(s: Long) = new Timestamp(s * 1000)
    try {
      // batch 1: two events 3s apart → one growing session
      in.addData(("u1", ts(10)), ("u1", ts(13)))
      q.processAllAvailable()
      // batch 2: event at 16s extends the same session (gap 3s < 5s)
      in.addData(("u1", ts(16)))
      q.processAllAvailable()
      // advance watermark past session end (21s): event at 40s → wm 30s
      in.addData(("u2", ts(40)))
      q.processAllAvailable()
      in.addData(("u2", ts(60)))
      q.processAllAvailable()

      val rows = spark.table("sess")
        .as[(String, Long, Long, Long)].collect().toList
      // u1's single merged session [10s, 21s) with 3 events, emitted once
      assert(rows.count(_._1 == "u1") == 1, s"got $rows")
      assert(rows.find(_._1 == "u1").get == (("u1", 10000L, 21000L, 3L)))
    } finally q.stop()
  }
}
