package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the event-time-correct streaming twin of
  * [[graft.operators.AsOfJoin]] (trade enriched with the latest quote
  * at-or-before its timestamp, per key; quote ties at one timestamp →
  * max value, matching the batch tie-break).
  *
  * Neither stream-stream joins nor window aggregates can express
  * "latest row at-or-before" in Structured Streaming, so this is the
  * Processor-API seam (SURVEY.md §2.8) doing real work: both streams
  * union into one watermarked, key-grouped stream and a
  * flatMapGroupsWithState handler holds per-key state. A trade CANNOT
  * be answered on arrival — an older quote may still arrive within the
  * lateness SLA — so trades buffer until the watermark passes their
  * timestamp, at which point every quote that could precede them has
  * arrived (watermark contract) and the enrichment is exact. Emission
  * is driven by event-time timers (the state handler only runs for a
  * key when it has input or a timer fires), set to the earliest
  * pending trade.
  *
  * State per key is bounded by the watermark horizon, independent of
  * stream length:
  *  - ONE folded quote at-or-below the watermark (only the latest can
  *    ever win an as-of for a future trade — older ones are
  *    unreachable and evicted),
  *  - quotes inside the horizon (ts > watermark),
  *  - pending trades inside the horizon.
  *
  * Streaming-vs-batch delta (documented): rows later than the
  * watermark delay are dropped by the watermark operator; batch sees
  * everything. In-horizon results are identical — AsOfStreamSpec pins
  * parity against AsOfJoin.asOf on the same rows.
  */
object AsOfStream {

  /** Union-tagged input row: quotes carry `value`, trades carry
    * `tradeId`. */
  case class AsOfEvent(key: Long, ts: Timestamp, isQuote: Boolean,
      value: Double, tradeId: Long)

  case class AsOfState(
      bestBelowTs: Long, bestBelowVal: Double, hasBestBelow: Boolean,
      quotes: List[(Long, Double)], trades: List[(Long, Long)])

  case class AsOfResult(key: Long, trade_id: Long, ts_ms: Long,
      asof_value: Option[Double], asof_ts_ms: Option[Long])

  /** Build the tagged union from two DataFrames with the batch
    * operator's column contract: trades (key, ts, tradeId), quotes
    * (key, ts, value). */
  def taggedUnion(trades: DataFrame, quotes: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, tradeIdCol: String): DataFrame =
    quotes.select(col(keyCol).as("key"), col(tsCol).as("ts"),
        lit(true).as("isQuote"), col(valueCol).cast("double").as("value"),
        lit(0L).as("tradeId"))
      .unionByName(trades.select(col(keyCol).as("key"), col(tsCol).as("ts"),
        lit(false).as("isQuote"), lit(0.0).as("value"),
        col(tradeIdCol).cast("long").as("tradeId")))

  /** `events`: a STREAMING Dataset of [[AsOfEvent]] (see
    * [[taggedUnion]]). Emits one [[AsOfResult]] per trade, exactly
    * once, when the watermark passes its timestamp. */
  def asOf(events: Dataset[AsOfEvent], watermarkDelay: String): Dataset[AsOfResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(handle)
  }

  // (ts, value) ordering shared with the batch tie-break: later ts
  // wins; at equal ts the larger value wins.
  private def better(a: (Long, Double), b: (Long, Double)): (Long, Double) =
    if (a._1 > b._1 || (a._1 == b._1 && a._2 >= b._2)) a else b

  private[streaming] def handle(key: Long, rows: Iterator[AsOfEvent],
      state: GroupState[AsOfState]): Iterator[AsOfResult] = {
    val wm = state.getCurrentWatermarkMs()
    val prev = state.getOption.getOrElse(
      AsOfState(0L, 0.0, hasBestBelow = false, Nil, Nil))
    var quotes = prev.quotes
    var trades = prev.trades
    rows.foreach { e =>
      if (e.isQuote) quotes = (e.ts.getTime, e.value) :: quotes
      else trades = (e.ts.getTime, e.tradeId) :: trades
    }
    // Emit every trade the watermark has STRICTLY passed: Spark's
    // late-row filter only drops ts < watermark, so a quote with
    // ts == wm is not late and may still arrive — a trade ripening at
    // ts == wm could answer without its winning at-or-before quote
    // (diverging from batch AsOfJoin). Strict < closes that boundary;
    // the timers already wake at wm+1, so timer-driven emission was
    // strict all along. Sort for deterministic output order only —
    // correctness is per-trade.
    val (ripe, pending) = trades.partition(_._1 < wm)
    val out = ripe.sortBy(t => (t._1, t._2)).map { case (tMs, tid) =>
      val candidates =
        (if (prev.hasBestBelow) List((prev.bestBelowTs, prev.bestBelowVal)) else Nil) ++
          quotes.filter(_._1 <= tMs)
      val asof = candidates.reduceOption(better)
      AsOfResult(key, tid, tMs, asof.map(_._2), asof.map(_._1))
    }
    // Evict: fold every quote at-or-below the watermark into the single
    // best-below row; keep in-horizon quotes and pending trades.
    val (below, above) = quotes.partition(_._1 <= wm)
    val foldedBelow = ((if (prev.hasBestBelow)
      List((prev.bestBelowTs, prev.bestBelowVal)) else Nil) ++ below)
      .reduceOption(better)
    val next = AsOfState(
      foldedBelow.map(_._1).getOrElse(0L),
      foldedBelow.map(_._2).getOrElse(0.0),
      foldedBelow.isDefined, above, pending)
    if (next.quotes.isEmpty && next.trades.isEmpty && !next.hasBestBelow) {
      state.remove()
    } else {
      state.update(next)
      // Wake this key when the watermark passes its earliest pending
      // trade — or its earliest in-horizon quote, so an idle key's
      // quote list folds down to the single best-below row instead of
      // lingering at its last-activity size. (Must be strictly beyond
      // the current watermark.)
      (pending.map(_._1) ++ next.quotes.map(_._1)).minOption.foreach { t =>
        state.setTimeoutTimestamp(math.max(t, wm + 1))
      }
    }
    out.iterator
  }
}
