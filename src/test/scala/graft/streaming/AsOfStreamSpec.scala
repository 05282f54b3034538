package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.AsOfJoin
import graft.streaming.AsOfStream.AsOfEvent

/** Streaming as-of join: exact event-time enrichment (a trade waits for
  * the watermark before answering, so an out-of-order quote inside the
  * SLA still wins), batch-tie-break parity, horizon-bounded state, and
  * streaming ≡ batch AsOfJoin on the same rows. */
class AsOfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)
  private def quote(k: Long, s: Long, v: Double) = AsOfEvent(k, ts(s), isQuote = true, v, 0L)
  private def trade(k: Long, s: Long, id: Long) = AsOfEvent(k, ts(s), isQuote = false, 0.0, id)

  test("as-of stream: watermark-gated exact answers, out-of-order quotes honored") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[AsOfEvent]
    val q = AsOfStream.asOf(in.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append()).start()
    def rows() = spark.table("asof_out")
      .as[(Long, Long, Long, Option[Double], Option[Long])].collect().toList
    try {
      // b1: quote@10 then trade@12 — nothing can emit yet (wm = 0): an
      // older quote could still arrive within the 10 s SLA
      in.addData(quote(1L, 10, 1.0), trade(1L, 12, 100L))
      q.processAllAvailable()
      assert(rows().isEmpty, "a trade must not answer before the watermark passes it")

      // b2: OUT-OF-ORDER quote@11 (newer than quote@10, older than the
      // trade) plus a far quote@50 — the watermark advances to 40 s and
      // the trailing no-data batch emits trade@12 with the out-of-order
      // quote@11, NOT quote@10
      in.addData(quote(1L, 11, 9.0), quote(1L, 50, 2.0))
      q.processAllAvailable()
      assert(rows() == List((1L, 100L, 12000L, Some(9.0), Some(11000L))),
        s"late quote@11 must win over quote@10: ${rows()}")

      // b3: trades @45/@60 arrive in-SLA (wm 40); the key-2 quote @90
      // pushes the wm to 80, so both become ripe — trade@45 answers
      // from the FOLDED evicted history (quote@11), trade@60 from the
      // in-horizon quote@50
      in.addData(trade(1L, 60, 101L), trade(1L, 45, 102L), quote(2L, 90, 0.5))
      q.processAllAvailable()
      val m = rows().map(r => r._2 -> (r._4, r._5)).toMap
      assert(m(101L) == (Some(2.0), Some(50000L)), s"got $m")
      assert(m(102L) == (Some(9.0), Some(11000L)), s"got $m")

      // no-prior-quote trade answers with nulls once the wm passes it
      in.addData(trade(3L, 200, 300L))
      q.processAllAvailable()
      in.addData(quote(2L, 400, 0.9))
      q.processAllAvailable()
      assert(rows().map(r => r._2 -> r._4).toMap.apply(300L).isEmpty)
    } finally q.stop()
  }

  test("as-of stream: quote ties at one timestamp pick the max value (batch parity)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[AsOfEvent]
    val q = AsOfStream.asOf(in.toDS(), "5 seconds")
      .writeStream.format("memory").queryName("asof_ties")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(quote(7L, 10, 3.0), quote(7L, 10, 8.0), quote(7L, 10, 5.0),
        trade(7L, 10, 700L))
      q.processAllAvailable()
      in.addData(quote(8L, 100, 0.0)); q.processAllAvailable()
      in.addData(quote(8L, 200, 0.0)); q.processAllAvailable()

      val streamed = spark.table("asof_ties")
        .as[(Long, Long, Long, Option[Double], Option[Long])].collect()
        .filter(_._1 == 7L).map(r => (r._2, r._4, r._5)).toList
      // batch twin on the same rows
      val batch = AsOfJoin.asOf(
          Seq((7L, ts(10), 700L)).toDF("key", "ts", "trade_id"),
          Seq((7L, ts(10), 3.0), (7L, ts(10), 8.0), (7L, ts(10), 5.0))
            .toDF("key", "ts", "value"),
          "key", "ts", "value")
        .select(col("trade_id"), col("asof_value"),
          unix_millis(col("asof_ts")).as("asof_ts_ms"))
        .as[(Long, Option[Double], Option[Long])].collect().toList
      assert(streamed == List((700L, Some(8.0), Some(10000L))))
      assert(batch == streamed, s"batch $batch != streamed $streamed")
    } finally q.stop()
  }

  test("taggedUnion adapter: two-DataFrame contract maps onto AsOfEvent") {
    val trades = Seq((1L, ts(5), 100L)).toDF("user_id", "t", "trade_id")
    val quotes = Seq((1L, ts(3), 2.5)).toDF("user_id", "t", "px")
    val events = AsOfStream
      .taggedUnion(trades, quotes, "user_id", "t", "px", "trade_id")
      .as[AsOfEvent].collect().sortBy(_.ts.getTime)
    assert(events.toList == List(
      AsOfEvent(1L, ts(3), isQuote = true, 2.5, 0L),
      AsOfEvent(1L, ts(5), isQuote = false, 0.0, 100L)))
  }

  test("as-of stream ≡ batch AsOfJoin on an in-horizon replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // deterministic mixed workload over 3 keys: quotes every 7 s,
    // trades every 5 s, interleaved out of order within batches
    val quotes = (1 to 40).map(i => quote(i % 3, 7L * i, i * 1.5))
    val trades = (1 to 50).map(i => trade(i % 3, 5L * i, 1000L + i))
    val in = MemoryStream[AsOfEvent]
    val q = AsOfStream.asOf(in.toDS(), "20 seconds")
      .writeStream.format("memory").queryName("asof_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      val all = (quotes ++ trades).sortBy(_.ts.getTime)
      val (b1, b2) = all.splitAt(all.size / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      in.addData(quote(9L, 5000, 0.0)); q.processAllAvailable()
      in.addData(quote(9L, 9000, 0.0)); q.processAllAvailable()

      val streamed = spark.table("asof_parity")
        .filter(col("key") =!= 9L)
        .select("trade_id", "asof_value", "asof_ts_ms")
        .as[(Long, Option[Double], Option[Long])].collect().toList.sorted
      val batch = AsOfJoin.asOf(
          trades.map(e => (e.key, e.ts, e.tradeId)).toDF("key", "ts", "trade_id"),
          quotes.map(e => (e.key, e.ts, e.value)).toDF("key", "ts", "value"),
          "key", "ts", "value")
        .select(col("trade_id"), col("asof_value"),
          unix_millis(col("asof_ts")).as("asof_ts_ms"))
        .as[(Long, Option[Double], Option[Long])].collect().toList.sorted
      assert(streamed.size == 50 && streamed == batch,
        s"streaming=${streamed.size}, batch=${batch.size}")
    } finally q.stop()
  }
}
