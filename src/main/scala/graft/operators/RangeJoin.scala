package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval range join: probe rows (key, ts) matched to build intervals
  * (key, start, end] ∋ ts — the time-range enrichment join Spark plans
  * as a broadcast-nested-loop (per-pair predicate evaluation) when
  * written as an inequality join.
  *
  * Scale path is bin bucketing, the standard interval-join trick: pick
  * a bin width, assign each probe row to the single bin floor(ts/w),
  * explode each interval into the bins it covers, and EQUI-join on
  * (key, bin) before the exact range filter. The per-pair predicate
  * becomes a hash join: cost ≈ |probe| + Σ interval spans/w + matched
  * pairs, instead of |probe|·|build-per-key|. A probe row has exactly
  * one bin, so a matching (probe, interval) pair meets in exactly one
  * bin — no dedup stage needed.
  *
  * Pick `binWidthMs` near the typical interval length: each interval
  * then covers ~2 bins and the bin join fans out minimally. Degenerate
  * giant intervals (≫ bin width) amplify the build side linearly in
  * their span — cap them upstream or raise the width (documented knob,
  * same spirit as the dedup bucket caps).
  */
object RangeJoin {

  /** `probe`: (keyCol, tsMsCol, probe cols…); `build`: (keyCol,
    * startMsCol, endMsCol, build cols…), epoch-ms longs, inclusive
    * bounds. Returns matched pairs (all probe + build columns). */
  def binned(
      probe: DataFrame,
      build: DataFrame,
      keyCol: String,
      tsMsCol: String,
      startMsCol: String,
      endMsCol: String,
      binWidthMs: Long): DataFrame = {
    require(binWidthMs > 0, "binWidthMs must be positive")
    val p = probe.withColumn("__bin", floor(col(tsMsCol) / binWidthMs))
    val b = build.withColumn("__bin",
      explode(sequence(
        floor(col(startMsCol) / binWidthMs),
        floor(col(endMsCol) / binWidthMs))))
    p.join(b, Seq(keyCol, "__bin"))
      .filter(col(tsMsCol) >= col(startMsCol) && col(tsMsCol) <= col(endMsCol))
      .drop("__bin")
  }
}
