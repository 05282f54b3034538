package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.BloomStore
import graft.packs.WindowOps

/** The conversational family's streaming twins ([[ThreadStreams]]):
  * session_window thread assembly == the batch gaps-and-islands
  * sessionize on the finalized horizon (threads AND turn pairs), a
  * golden emission trace (threads appear exactly when the watermark
  * passes their session end), and the thread-dedup-at-ingest loop with
  * replay protection. */
class ThreadStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Long): Timestamp = new Timestamp(h * 3600 * 1000)

  private def ev(u: Long, h: Long, id: Long, t: String, k: Long) =
    (u, ts(h), id, t, s"""{"k":$k}""")

  // u1 has two sessions (3 h gap ≥ 2 h between ids 3 and 4); u2's one
  // session REPLAYS u1's first turn sequence exactly (the behavioral
  // duplicate the dedup loop must drop); ids 2/3 tie on ts → event_id
  // breaks the turn order identically in both engines
  private val events = Seq(
    ev(1L, 0L, 1L, "view", 7), ev(1L, 1L, 2L, "click", 8),
    ev(1L, 1L, 3L, "view", 9),
    ev(1L, 4L, 4L, "buy", 1),
    ev(2L, 0L, 11L, "view", 7), ev(2L, 1L, 12L, "click", 8),
    ev(2L, 1L, 13L, "view", 9))

  private val cols = Seq("user_id", "ts", "event_id", "event_type", "props")

  private def batchDf: DataFrame = events.toDF(cols: _*)

  test("streamed assembly == batch assembleThreads; golden emission trace") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, String)]
    val q = ThreadStreams.assembledThreadsStream(
        in.toDF.toDF(cols: _*), "0 seconds")
      .writeStream.format("memory").queryName("threads_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // trigger 1: all real events → watermark 4 h; the two sessions
      // ending at 3 h finalize, u1's second (ends 6 h) stays open
      in.addData(events: _*)
      q.processAllAvailable()
      val t1 = spark.table("threads_stream")
        .select("user_id", "thread_key").as[(Long, Long)].collect().toSet
      assert(t1 == Set((1L, 1L), (2L, 11L)),
        s"watermark 4h must finalize exactly the two 3h-end sessions: $t1")
      // trigger 2: sentinel advances the watermark past 6 h → u1's
      // second session emits; the sentinel's own session stays open
      in.addData(ev(9L, 10L, 99L, "view", 0))
      q.processAllAvailable()
      val emitted = spark.table("threads_stream")
        .select("user_id", "thread_key", "n_turns", "thread")
        .as[(Long, Long, Long, String)].collect().toSet
      val batch = WindowOps.assembleThreadsOn(batchDf)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(emitted == batch,
        s"stream must equal batch on the finalized horizon:\n$emitted\nvs\n$batch")
    } finally q.stop()
  }

  test("streamed turn pairs == batch threadTurnPairs on the finalized horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, String)]
    val q = ThreadStreams.threadTurnPairsStream(
        in.toDF.toDF(cols: _*), "0 seconds")
      .writeStream.format("memory").queryName("pairs_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(ev(9L, 10L, 99L, "view", 0))
      q.processAllAvailable()
      val emitted = spark.table("pairs_stream")
        .as[(Long, Long, Long, String, String)].collect().toSet
      val batch = WindowOps.threadTurnPairsOn(batchDf)
        .select("user_id", "thread_key", "pos", "prompt", "response")
        .as[(Long, Long, Long, String, String)].collect().toSet
      assert(emitted == batch,
        s"pair streams must match batch:\n$emitted\nvs\n$batch")
      // the tied-timestamp turns (ids 2, 3) must pair in event_id order
      assert(emitted.contains((1L, 1L, 2L, "click@8", "view@9")))
    } finally q.stop()
  }

  test("thread dedup at ingest: behavioral duplicates drop across batches, replay is a no-op") {
    val tcols = Seq("user_id", "thread_key", "n_turns", "thread", "turns")
    val store = new BloomStore(1000L)
    val accepted =
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String, Seq[String])]()

    def ingest(batchId: Long,
        threads: (Long, Long, Long, String, Seq[String])*): Set[Long] = {
      val out = ThreadStreams.threadCurateIngestBatch(store,
          accepted.toSeq.toDF(tcols: _*), threads.toDF(tcols: _*), batchId)
        .as[(Long, Long, Long, String, Seq[String])].collect()
      accepted ++= out
      out.map(_._2).toSet
    }

    val dupThread = "view@7 click@8 view@9"
    val dupTurns = Seq("view@7", "click@8", "view@9")
    // batch 0: two distinct threads accepted
    val b0 = ingest(0L,
      (1L, 1L, 3L, dupThread, dupTurns),
      (1L, 4L, 1L, "buy@1", Seq("buy@1")))
    assert(b0 == Set(1L, 4L), s"got $b0")
    // batch 1: u2 replays u1's exact turn sequence → behavioral dup
    // drops against the store; a genuinely new thread survives
    val b1 = ingest(1L,
      (2L, 11L, 3L, dupThread, dupTurns),
      (3L, 21L, 2L, "ask@5 answer@6", Seq("ask@5", "answer@6")))
    assert(b1 == Set(21L), s"got $b1")
    // at-least-once replay of batch 1: same survivors, no double merge
    val replay = ThreadStreams.threadCurateIngestBatch(store,
      accepted.toSeq.toDF(tcols: _*),
      Seq((2L, 11L, 3L, dupThread, dupTurns),
        (3L, 21L, 2L, "ask@5 answer@6", Seq("ask@5", "answer@6")))
        .toDF(tcols: _*), 1L)
    assert(replay.select("thread_key").as[Long].collect().toSet == Set(21L),
      "replay must compute the same survivors")
    // SFT pairs extract statelessly from the surviving threads
    val pairs = WindowOps.pairsFromTurns(accepted.toSeq.toDF(tcols: _*))
      .as[(Long, Long, Long, String, String)].collect().toSet
    assert(pairs == Set(
      (1L, 1L, 1L, "view@7", "click@8"),
      (1L, 1L, 2L, "click@8", "view@9"),
      (3L, 21L, 1L, "ask@5", "answer@6")), s"got $pairs")
  }
}
