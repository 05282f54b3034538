package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Conversational-thread assembly and SFT-pair extraction
  * (WindowOps.assembleThreads / threadTurnPairs): golden trace on a
  * hand-built event log — session split on the 2 h gap, (ts, event_id)
  * tie order inside a thread, pair positions. Cross-engine value
  * parity runs at the driver gate. */
class ThreadAssemblySpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, minute: Long, typ: String,
      k: Int): (Long, Timestamp, Long, String, Double, String) =
    (id, new Timestamp(minute * 60000L), user, typ, 1.0, s"""{"k": $k}""")

  private lazy val events = Seq(
    // user 1, session A: three turns; ids break the equal-ts tie
    ev(10L, 1L, 0, "view", 1), ev(11L, 1L, 5, "click", 2),
    ev(12L, 1L, 9, "buy", 3),
    // 2h+ gap → session B: two turns
    ev(13L, 1L, 9 + 121, "view", 4), ev(14L, 1L, 9 + 130, "click", 5),
    // user 2: one singleton turn — a thread with NO pair
    ev(20L, 2L, 50, "error", 9)
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("threads split on the gap and serialize in (ts, event_id) order") {
    events.createOrReplaceTempView("ignored") // not used; direct call below
    val dir = java.nio.file.Files
      .createTempDirectory("graft-thread-spec").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.packs.WindowOps.assembleThreads(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 10L, 3L, "view@1 click@2 buy@3"),
      (1L, 13L, 2L, "view@4 click@5"),
      (2L, 20L, 1L, "error@9")), s"got $got")

    val pairs = graft.packs.WindowOps.threadTurnPairs(spark, dir)
      .as[(Long, Long, Long, String, String)].collect().toSet
    assert(pairs == Set(
      (1L, 10L, 1L, "view@1", "click@2"),
      (1L, 10L, 2L, "click@2", "buy@3"),
      (1L, 13L, 1L, "view@4", "click@5")), s"got $pairs")
  }
}
