package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.{SparkSpec, Tables}
import graft.packs.WindowOps

/** Streaming ≡ batch parity for the WindowOps window aggregations: the
  * REAL sf0.001 events table is replayed through MemoryStream in two
  * time-ordered micro-batches, far-future sentinels advance the
  * watermark past every real window, and the finalized streaming output
  * must equal the batch operator on the same rows — so the batch DuckDB
  * oracles (`session_agg`, `sliding_window`) transitively pin the
  * streaming twins (one shared aggregation body, two callers).
  */
class WindowParitySpec extends SparkSpec {
  import spark.implicits._

  // Real events, replayed in event-time order so a 10-minute watermark
  // delay can never drop a row (batch 2's min ts >= batch 1's max ts).
  private lazy val events: Seq[(Long, Timestamp, Double)] =
    Tables.events(spark, sf)
      .select("user_id", "ts", "value")
      .as[(Long, Timestamp, Double)]
      .collect().sortBy(_._2.getTime).toSeq

  private def sentinel(offsetDays: Int): (Long, Timestamp, Double) = {
    val maxMs = events.last._2.getTime
    (-1L, new Timestamp(maxMs + offsetDays * 86400000L), 0.0)
  }

  test("streaming session_window == batch sessionAgg on the sf0.001 events") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = WindowStreams
      .sessionAggStream(in.toDF.toDF("user_id", "ts", "value"), "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("session_parity")
      .start()
    try {
      val (b1, b2) = events.splitAt(events.size / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      // Two sentinel batches: after the second one the applied watermark
      // is sentinel(3).ts - 10 min > every real session end (+2 h), so
      // all real sessions are finalized and emitted exactly once.
      in.addData(sentinel(3)); q.processAllAvailable()
      in.addData(sentinel(4)); q.processAllAvailable()

      val streamed = spark.table("session_parity")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
        .filter(_._1 >= 0L).sorted
      val batch = WindowOps
        .sessionAggOn(events.toDF("user_id", "ts", "value"))
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
      assert(batch.nonEmpty && streamed == batch,
        s"streaming=${streamed.size} rows, batch=${batch.size} rows")
    } finally q.stop()
  }

  test("streaming sliding window == batch slidingWindow on the sf0.001 events") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = WindowStreams
      .slidingWindowStream(in.toDF.toDF("user_id", "ts", "value"), "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sliding_parity")
      .start()
    try {
      val (b1, b2) = events.splitAt(events.size / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      in.addData(sentinel(3)); q.processAllAvailable()
      in.addData(sentinel(4)); q.processAllAvailable()

      // Sentinel windows live 3+ days after every real window — cut at
      // one day past the real max ts to keep exactly the real windows.
      val cutoffMs = events.last._2.getTime + 86400000L
      val streamed = spark.table("sliding_parity")
        .as[(Long, Long, Long, Long)].collect().toSeq
        .filter(_._1 < cutoffMs).sorted
      val batch = WindowOps
        .slidingWindowOn(events.toDF("user_id", "ts", "value"))
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      assert(batch.nonEmpty && streamed == batch,
        s"streaming=${streamed.size} rows, batch=${batch.size} rows")
    } finally q.stop()
  }
}
