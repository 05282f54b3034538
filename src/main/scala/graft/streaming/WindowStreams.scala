package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.packs.WindowOps

/** Streaming twins of the WindowOps batch window aggregations.
  *
  * Each form is literally the batch aggregation body applied to a
  * watermarked stream — ONE implementation, two callers — so the batch
  * DuckDB oracles (`session_agg`, `sliding_window` in
  * CORRECTNESS_r*.json) transitively pin the streaming plans, and the
  * WindowParitySpec closes the loop by asserting streaming output ==
  * batch output on the same event set.
  *
  * Scale/semantics notes:
  *  - Append output mode: a session / window row is emitted exactly
  *    once, when the watermark passes its end — the result set is the
  *    batch result restricted to finalized windows. State is evicted at
  *    the same moment, so state size is bounded by (open windows ×
  *    groups inside the watermark horizon), independent of stream
  *    length.
  *  - `session_window` merges sessions across micro-batches in the
  *    state store (the stateful shape the reference's DSL era lacked —
  *    SURVEY.md §2.4 absent surface); the sliding form keeps 2 open
  *    windows per 30 s slide.
  *  - The watermark delay is the caller's lateness SLA: events later
  *    than the delay are dropped by the watermark operator, which is
  *    the documented streaming-vs-batch delta (batch sees everything).
  */
object WindowStreams {

  /** Per-user 2 h-gap session aggregation over a streaming event source
    * with event-time column `ts`. Output matches
    * [[graft.packs.WindowOps.sessionAgg]] on the finalized horizon.
    */
  def sessionAggStream(events: DataFrame, watermarkDelay: String): DataFrame =
    WindowOps.sessionAggOn(events.withWatermark("ts", watermarkDelay))

  /** 60 s / 30 s sliding-window aggregation over a streaming event
    * source. Output matches [[graft.packs.WindowOps.slidingWindow]] on
    * the finalized horizon.
    */
  def slidingWindowStream(events: DataFrame, watermarkDelay: String): DataFrame =
    WindowOps.slidingWindowOn(events.withWatermark("ts", watermarkDelay))
}
