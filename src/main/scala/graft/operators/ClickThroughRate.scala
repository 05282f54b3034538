package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's `StreamStreamJoin` CTR pipeline
  * (StreamStreamJoin.java:51-169), re-expressed Spark-first.
  *
  * Declared KSQL (StreamStreamJoin.java:27-43): windowed LEFT JOIN of
  * impressions with clicks on impressionid within ±60 s, then
  * `CREATE TABLE ctr AS SELECT adid,
  *  (count(*) WHERE clickid != NULL) / count(*) FROM ads_with_clicks`.
  *
  * The reference pays 3 broker shuffles (re-key ×2 into the join, re-key
  * into the agg; SURVEY.md §3.2). The Spark plan pays the same logical
  * shuffles — two Exchanges on impression_id into the join, one on ad_id
  * into the aggregate — but the aggregate's map-side partial combine means
  * the third shuffle carries one row per (partition, ad), not per joined
  * record. At 100 TB: both join inputs hash-partition on the join key
  * (no broadcast — both sides are streams/large), AQE handles skewed
  * impression ids; the per-ad aggregate is tiny (~|ads| rows).
  */
object ClickThroughRate {

  /** J1: windowed left-outer equi-join, batch form (SURVEY.md §2.3).
    * Inputs need `impression_id` + `impression_time_ms` on the left and
    * `impression_id` + `click_time_ms` + `click_id` on the right.
    * `windowMs` is the symmetric half-window (reference: 60 s,
    * JoinWindows.of(60 s) at StreamStreamJoin.java:95).
    * Output adds `was_clicked` (P5: clickString != null,
    * StreamStreamJoin.java:91-93). */
  def joinImpressionsClicks(
      impressions: DataFrame,
      clicks: DataFrame,
      windowMs: Long = 60000L): DataFrame = {
    val clk = clicks.select(
      col("impression_id").as("clk_impression_id"),
      col("click_time_ms"),
      col("click_id"))
    impressions
      .join(
        clk,
        col("impression_id") === col("clk_impression_id") &&
          col("click_time_ms").between(
            col("impression_time_ms") - windowMs,
            col("impression_time_ms") + windowMs),
        "left_outer")
      .withColumn("was_clicked", col("click_id").isNotNull)
      .drop("clk_impression_id")
  }

  /** A6 faithful quirk: a clicked impression increments ONLY the click
    * counter, so num_impressions counts non-clicked impressions only
    * (StreamStreamJoin.java:119-127). */
  def adCounts(joined: DataFrame): DataFrame =
    joined.groupBy(col("ad_id")).agg(
      count(when(!col("was_clicked"), 1)).as("num_impressions"),
      count(when(col("was_clicked"), 1)).as("num_clicks"))

  /** A7 faithful quirk: guards clicks==0 only — an ad whose every
    * impression was clicked yields Infinity (StreamStreamJoin.java:132-143;
    * Java double division by zero). Spark 4's ANSI mode refuses x/0 for
    * any numeric type, so the Infinity branch is written out explicitly. */
  def ctrFaithful(counts: DataFrame): Column =
    when(col("num_clicks") === 0, lit(0.0))
      .when(col("num_impressions") === 0, lit(Double.PositiveInfinity))
      .otherwise(col("num_clicks").cast("double") /
        col("num_impressions").cast("double"))

  /** Corrected semantics per the declared KSQL (StreamStreamJoin.java:38-43):
    * clicks / total impressions (clicked + non-clicked), 0 when empty. */
  def ctrCorrected(counts: DataFrame): Column = {
    val total = col("num_impressions") + col("num_clicks")
    when(total === 0, lit(0.0))
      .otherwise(col("num_clicks").cast("double") / total)
  }

  /** Full pipeline: join → per-ad counts → CTR (both variants). */
  def ctrByAd(impressions: DataFrame, clicks: DataFrame,
      windowMs: Long = 60000L): DataFrame = {
    val counts = adCounts(joinImpressionsClicks(impressions, clicks, windowMs))
    counts.select(
      col("ad_id"),
      col("num_impressions"),
      col("num_clicks"),
      ctrFaithful(counts).as("ctr"),
      ctrCorrected(counts).as("ctr_corrected"))
  }
}
