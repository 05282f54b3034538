package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.operators.{AsOfJoin, RangeJoin}

/** Advanced time-window operators absent from the reference (SURVEY.md
  * §2.4 "absent surface") but core to a streaming engine: session
  * windows, sliding windows, and the as-of enrichment join. All three
  * have exact DuckDB oracles (gaps-and-islands for sessions, explicit
  * window enumeration for sliding, native ASOF JOIN for as-of).
  */
object WindowOps extends QueryPack {

  private val GapMs = 7200000L // 2h session gap

  /** Shared session-aggregation body: the batch query below and the
    * streaming twin (streaming/WindowStreams.sessionAggStream) apply
    * this SAME plan to their respective sources, so the batch DuckDB
    * oracle transitively pins the streaming form (parity spec:
    * WindowParitySpec). */
  def sessionAggOn(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "2 hours"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        unix_millis(col("session_window.end")).as("session_end_ms"),
        col("n_events"), col("value_cents"))

  /** session_agg — per-user session windows (2 h inactivity gap). */
  def sessionAgg(spark: SparkSession, sfDir: String): DataFrame =
    sessionAggOn(Tables.events(spark, sfDir))

  /** thread_dedup — exact dedup over the ASSEMBLED thread strings
    * (keyed by thread_key): identical event sequences across users are
    * the behavioral-duplicate signal (bots, scripted sessions,
    * replayed logs) that conversational pipelines drop before
    * training. Pure composition: [[assembleThreads]] feeding
    * [[graft.operators.Dedup.exact]] — the thread IS the document. */
  def threadDedup(spark: SparkSession, sfDir: String): DataFrame =
    threadDedupOn(Tables.events(spark, sfDir))

  def threadDedupOn(events: DataFrame): DataFrame =
    graft.operators.Dedup.exact(
      assembleThreadsOn(events), "thread_key", "thread")

  /** pipeline_curate_threads — the conversational pipeline end to end:
    * assemble threads → drop behavioral duplicates (keep the canonical
    * min-key thread of each identical event sequence) → extract the
    * SURVIVING threads' SFT turn pairs. The document pipelines'
    * composition discipline applied to conversational data: every
    * stage is a gated piece ([[assembleThreads]], [[threadDedup]]'s
    * keep rule, [[threadTurnPairs]]), glued by one semi-join. */
  def pipelineCurateThreads(spark: SparkSession, sfDir: String): DataFrame =
    pipelineCurateThreadsOn(Tables.events(spark, sfDir))

  def pipelineCurateThreadsOn(events: DataFrame): DataFrame = {
    val keepers = threadDedupOn(events)
      .select(col("keep_id").as("thread_key"))
    threadTurnPairsOn(events)
      .join(keepers, Seq("thread_key"), "left_semi")
      .select(col("user_id"), col("thread_key"), col("pos"),
        col("prompt"), col("response"))
  }

  /** thread_turn_pairs — adjacent (prompt, response) turn pairs within
    * each assembled thread: the SFT-pair extraction step of a
    * conversational pipeline (every consecutive turn pair becomes a
    * candidate training example, positioned within its thread). Same
    * sessionize as [[assembleThreads]]; the pairing is one lead() over
    * the per-(user, session) ordered window. */
  def threadTurnPairs(spark: SparkSession, sfDir: String): DataFrame =
    threadTurnPairsOn(Tables.events(spark, sfDir))

  def threadTurnPairsOn(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sessioned = sessionedTurns(events)
    val bySess = Window.partitionBy(col("user_id"), col("sess"))
      .orderBy(col("ts"), col("event_id"))
    sessioned
      .withColumn("thread_key",
        min(col("event_id")).over(Window.partitionBy(col("user_id"), col("sess"))))
      .withColumn("pos", row_number().over(bySess).cast("long"))
      .withColumn("response", lead(col("turn"), 1).over(bySess))
      .filter(col("response").isNotNull)
      .select(col("user_id"), col("thread_key"), col("pos"),
        col("turn").as("prompt"), col("response"))
  }

  /** assemble_threads — the chat-log → training-example preprocessing
    * shape: per user, events sessionized on the same 2 h gap rule and
    * SERIALIZED in event order into one thread string (role@payload
    * turns — here event_type@k), keyed by the session's min event id.
    * This is the assembly step every conversational-data pipeline runs
    * before the document-level curation ops take over (the thread
    * string IS the document downstream).
    *
    * Scale shape: sessionize is the per-USER ordered window (state
    * bounded by a user's history, the session_agg discipline);
    * serialization is a partial-agg collect per (user, session) —
    * bounded by session length — sorted in-memory per group and
    * joined to one string. Deterministic order: (ts, event_id) breaks
    * timestamp ties identically in both engines. */
  def assembleThreads(spark: SparkSession, sfDir: String): DataFrame =
    assembleThreadsOn(Tables.events(spark, sfDir))

  /** The serialized-turn PROJECTION shared by the batch sessionize and
    * the streaming session_window twin ([[graft.streaming
    * .ThreadStreams]]): one definition of what a "turn" is. */
  private[graft] def turnRows(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").as("k"))
      .withColumn("turn", concat(col("event_type"), lit("@"), col("k")))

  /** The shared sessionized-turn head of every thread op: the 2 h gap
    * rule over the (ts, event_id) total order, plus the serialized
    * turn column — ONE implementation, so the assembly, dedup, pair,
    * and composed forms cannot drift. */
  private def sessionedTurns(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    turnRows(events)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >= GapMs * 1000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** The thread-assembly AGGREGATION exprs, shared verbatim by the
    * batch groupBy(user, sess) and the streaming
    * groupBy(session_window, user) — the [[sessionAggOn]] discipline
    * applied to assembly: the two forms differ only in HOW the session
    * key is derived (window-function gaps-and-islands vs merging
    * session_window state), which the 2 h gap rule makes equivalent
    * (same-session iff consecutive gap < 2 h; ThreadStreamSpec pins
    * parity). `turns` rides along sorted so the pair extraction can
    * share one definition too. */
  private[graft] def threadAggExprs: Seq[org.apache.spark.sql.Column] = {
    val sortedTurns = transform(array_sort(collect_list(struct(
      unix_micros(col("ts")).as("t"), col("event_id").as("i"),
      col("turn").as("s")))), x => x.getField("s"))
    Seq(
      min(col("event_id")).as("thread_key"),
      count(lit(1)).as("n_turns"),
      concat_ws(" ", sortedTurns).as("thread"),
      sortedTurns.as("turns"))
  }

  def assembleThreadsOn(events: DataFrame): DataFrame = {
    val exprs = threadAggExprs
    sessionedTurns(events)
      .groupBy(col("user_id"), col("sess"))
      .agg(exprs.head, exprs.tail: _*)
      .select(col("user_id"), col("thread_key"), col("n_turns"),
        col("thread"))
  }

  /** Turn-pair extraction from an assembled thread's sorted `turns`
    * array ([[threadAggExprs]]'s fourth column) — the streaming twin's
    * pair form: consecutive (prompt, response) with 1-based pos,
    * exactly [[threadTurnPairsOn]]'s output (which derives the same
    * pairs via lead() over the per-session window — ThreadStreamSpec
    * pins the two equal). Stateless on top of the assembly agg, so it
    * composes onto an Append-mode streaming aggregation. */
  private[graft] def pairsFromTurns(threads: DataFrame): DataFrame =
    threads
      .select(col("user_id"), col("thread_key"),
        posexplode(expr(
          "transform(slice(turns, 1, greatest(size(turns) - 1, 0)), " +
            "(t, i) -> named_struct('prompt', t, 'response', turns[i + 1]))")))
      .select(col("user_id"), col("thread_key"),
        (col("pos") + 1).cast("long").as("pos"),
        col("col.prompt").as("prompt"), col("col.response").as("response"))

  /** Shared sliding-window body — same single-implementation pattern as
    * [[sessionAggOn]]. */
  def slidingWindowOn(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "60 seconds", "30 seconds"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        unix_millis(col("window.start")).as("ws_ms"),
        unix_millis(col("window.end")).as("we_ms"),
        col("n"), col("value_cents"))

  /** sliding_window — 60 s windows sliding by 30 s (every event lands in
    * exactly two windows). */
  def slidingWindow(spark: SparkSession, sfDir: String): DataFrame =
    slidingWindowOn(Tables.events(spark, sfDir))

  /** asof_join — trades (odd event ids) enriched with the latest quote
    * (even event ids) at-or-before each trade, per user. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val quotes = e.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("ts"), col("value"))
    val trades = e.filter(col("event_id") % 2 === 1)
      .select(col("user_id"), col("ts"), col("event_id"))
    AsOfJoin.asOf(trades, quotes, "user_id", "ts", "value")
      .select(
        col("event_id"),
        col("user_id"),
        unix_millis(col("ts")).as("trade_ts_ms"),
        coalesce(col("asof_value"), lit(-1.0)).as("quote_value"),
        coalesce(unix_millis(col("asof_ts")), lit(-1L)).as("quote_ts_ms"))
  }

  /** range_join — events enriched into 10-minute per-user campaign
    * windows (every 100th event opens one) via the binned interval
    * join: an EQUI-join on (user, bin), never a nested-loop inequality
    * join (operators/RangeJoin; plan guarded in PlanSpec). */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val windows = e.filter(col("event_id") % 100 === 0)
      .select(col("user_id"), col("event_id").as("win_id"),
        unix_millis(col("ts")).as("start_ms"),
        (unix_millis(col("ts")) + 600000L).as("end_ms"))
    val probe = e.select(col("user_id"), col("event_id"),
      unix_millis(col("ts")).as("ts_ms"))
    RangeJoin.binned(probe, windows, "user_id", "ts_ms",
        "start_ms", "end_ms", binWidthMs = 600000L)
      .select(col("win_id"), col("event_id"), col("ts_ms"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "session_agg" -> (sessionAgg _),
    "assemble_threads" -> (assembleThreads _),
    "thread_turn_pairs" -> (threadTurnPairs _),
    "thread_dedup" -> (threadDedup _),
    "pipeline_curate_threads" -> (pipelineCurateThreads _),
    "sliding_window" -> (slidingWindow _),
    "asof_join" -> (asofJoin _),
    "range_join" -> (rangeJoin _)
  )

  override def oracleSql: Map[String, String] = Map(
    // Gaps-and-islands; Spark session semantics: a gap of exactly the
    // duration starts a NEW session (windows are [ts, ts+gap) merged on
    // overlap), hence >= in the break condition. Compare in micros.
    "session_agg" ->
      s"""WITH o AS (
         |  SELECT user_id, ts, value,
         |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
         |              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= ${GapMs * 1000} THEN 1
         |              ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), s AS (
         |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM o
         |)
         |SELECT user_id,
         |       min(epoch_ms(ts)) AS session_start_ms,
         |       (max(epoch_us(ts)) + ${GapMs * 1000}) // 1000 AS session_end_ms,
         |       count(*) AS n_events,
         |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         |FROM s GROUP BY user_id, sess""".stripMargin,

    // same gaps-and-islands sessionize with the (ts, event_id) total
    // order; the thread is an ORDER BY string_agg — Spark's sorted
    // collect_list twin
    "assemble_threads" ->
      s"""WITH o AS (
         |  SELECT user_id, ts, event_id, event_type,
         |         json_extract_string(props, '$$.k') AS k,
         |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
         |              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= ${GapMs * 1000} THEN 1
         |              ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), s AS (
         |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM o
         |)
         |SELECT user_id, min(event_id) AS thread_key,
         |       count(*)::BIGINT AS n_turns,
         |       string_agg(event_type || '@' || k, ' '
         |         ORDER BY ts, event_id) AS thread
         |FROM s GROUP BY user_id, sess""".stripMargin,

    // the SAME assembled-thread relation, md5-keyed exact-dedup tail
    // (the Dedup.exact shape: min-key canonical + copy count)
    "thread_dedup" ->
      s"""WITH o AS (
         |  SELECT user_id, ts, event_id, event_type,
         |         json_extract_string(props, '$$.k') AS k,
         |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
         |              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= ${GapMs * 1000} THEN 1
         |              ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), s AS (
         |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM o
         |), th AS (
         |  SELECT min(event_id) AS thread_key,
         |         string_agg(event_type || '@' || k, ' '
         |           ORDER BY ts, event_id) AS thread
         |  FROM s GROUP BY user_id, sess
         |)
         |SELECT md5(thread) AS text_hash,
         |       min(thread_key) AS keep_id,
         |       count(*)::BIGINT AS n_copies
         |FROM th GROUP BY md5(thread)""".stripMargin,

    // the composed conversational pipeline: the thread_dedup CTEs
    // (verbatim — session, assembly, md5 keep rule) plus the
    // thread_turn_pairs pairing CTE, glued by one join on the
    // surviving canonical keys
    "pipeline_curate_threads" ->
      s"""WITH o AS (
         |  SELECT user_id, ts, event_id, event_type,
         |         json_extract_string(props, '$$.k') AS k,
         |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
         |              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= ${GapMs * 1000} THEN 1
         |              ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), s AS (
         |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM o
         |), th AS (
         |  SELECT min(event_id) AS thread_key,
         |         string_agg(event_type || '@' || k, ' '
         |           ORDER BY ts, event_id) AS thread
         |  FROM s GROUP BY user_id, sess
         |), keep AS (
         |  SELECT min(thread_key) AS thread_key
         |  FROM th GROUP BY md5(thread)
         |), t AS (
         |  SELECT user_id, sess, ts, event_id,
         |         event_type || '@' || k AS turn,
         |         min(event_id) OVER (PARTITION BY user_id, sess) AS thread_key,
         |         CAST(row_number() OVER ws AS BIGINT) AS pos,
         |         lead(event_type || '@' || k) OVER ws AS response
         |  FROM s
         |  WINDOW ws AS (PARTITION BY user_id, sess ORDER BY ts, event_id)
         |)
         |SELECT t.user_id, t.thread_key, t.pos,
         |       t.turn AS prompt, t.response
         |FROM t JOIN keep USING (thread_key)
         |WHERE t.response IS NOT NULL""".stripMargin,

    // the SAME session CTEs; pairing = lead()/row_number() over the
    // per-(user, session) total order
    "thread_turn_pairs" ->
      s"""WITH o AS (
         |  SELECT user_id, ts, event_id, event_type,
         |         json_extract_string(props, '$$.k') AS k,
         |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
         |              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= ${GapMs * 1000} THEN 1
         |              ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), s AS (
         |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM o
         |), t AS (
         |  SELECT user_id, sess, ts, event_id,
         |         event_type || '@' || k AS turn,
         |         min(event_id) OVER (PARTITION BY user_id, sess) AS thread_key,
         |         CAST(row_number() OVER ws AS BIGINT) AS pos,
         |         lead(event_type || '@' || k) OVER ws AS response
         |  FROM s
         |  WINDOW ws AS (PARTITION BY user_id, sess ORDER BY ts, event_id)
         |)
         |SELECT user_id, thread_key, pos, turn AS prompt, response
         |FROM t WHERE response IS NOT NULL""".stripMargin,

    "sliding_window" ->
      """WITH b AS (
        |  SELECT unnest([(epoch_ms(ts) // 30000) * 30000,
        |                 (epoch_ms(ts) // 30000) * 30000 - 30000]) AS ws,
        |         value
        |  FROM events
        |)
        |SELECT ws AS ws_ms, ws + 60000 AS we_ms, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM b GROUP BY ws""".stripMargin,

    // The build side is deduped to one row per (key, ts) — max(value),
    // matching AsOfJoin's deterministic tie-break — so DuckDB's ASOF
    // pick among tied timestamps can never diverge from the engine.
    "asof_join" ->
      """WITH q0 AS (SELECT user_id, ts, value FROM events WHERE event_id % 2 = 0),
        |     q AS (SELECT user_id, ts, max(value) AS value
        |           FROM q0 GROUP BY user_id, ts),
        |     t AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 2 = 1)
        |SELECT t.event_id, t.user_id,
        |       epoch_ms(t.ts) AS trade_ts_ms,
        |       coalesce(q.value, -1.0) AS quote_value,
        |       coalesce(epoch_ms(q.ts), -1) AS quote_ts_ms
        |FROM t ASOF LEFT JOIN q
        |  ON t.user_id = q.user_id AND q.ts <= t.ts""".stripMargin,

    // the oracle IS the naive inequality join — the engine's binned
    // equi-join must produce the identical pair set
    "range_join" ->
      """WITH w AS (
        |  SELECT user_id, event_id AS win_id,
        |         epoch_ms(ts) AS start_ms, epoch_ms(ts) + 600000 AS end_ms
        |  FROM events WHERE event_id % 100 = 0
        |), e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
        |)
        |SELECT w.win_id, e.event_id, e.ts_ms
        |FROM w JOIN e ON w.user_id = e.user_id
        | AND e.ts_ms BETWEEN w.start_ms AND w.end_ms""".stripMargin
  )
}
