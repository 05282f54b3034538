package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic impressions/clicks derivation from the driver's `events`
  * table (FIXTURES.md §2): the reference's ad streams are ksql-datagen
  * synthetic (StreamStreamJoin.java:44-47), so for batch verification we
  * derive equivalent streams from shared deterministic input — Spark and
  * the DuckDB oracle compute them from identical parquet, no RNG.
  *
  * Shape mirrors FIXTURES.md §1.2/1.3: ~90 ad ids / ~90 user ids; every
  * event is an impression; every 5th event produces a click on its own
  * impression with a time offset in [-90 s, +90 s), so ~2/3 of clicks
  * land inside the ±60 s join window and the rest exercise the
  * out-of-window path.
  */
object AdFixtures {

  def impressions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      unix_millis(col("ts")).as("impression_time_ms"),
      concat(lit("impression_"), col("event_id").cast("string")).as("impression_id"),
      concat(lit("user_"), (col("user_id") % 90).cast("string")).as("user_id"),
      concat(lit("ad_"), (col("event_id") % 90).cast("string")).as("ad_id"))

  def clicks(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_id") % 5 === 0)
      .select(
        (unix_millis(col("ts")) + (col("event_id") % 180000) - 90000).as("click_time_ms"),
        concat(lit("user_"), (col("user_id") % 90).cast("string")).as("user_id"),
        concat(lit("impression_"), col("event_id").cast("string")).as("impression_id"),
        concat(lit("ad_"), (col("event_id") % 90).cast("string")).as("ad_id"),
        concat(lit("click_"), col("event_id").cast("string")).as("click_id"))

  /** DuckDB CTEs computing the identical derivation; prepend to oracle SQL. */
  val oracleCtes: String =
    """WITH imp AS (
      |  SELECT epoch_ms(ts) AS impression_time_ms,
      |         concat('impression_', CAST(event_id AS VARCHAR)) AS impression_id,
      |         concat('user_', CAST(user_id % 90 AS VARCHAR)) AS user_id,
      |         concat('ad_', CAST(event_id % 90 AS VARCHAR)) AS ad_id
      |  FROM events
      |), clk AS (
      |  SELECT epoch_ms(ts) + (event_id % 180000) - 90000 AS click_time_ms,
      |         concat('user_', CAST(user_id % 90 AS VARCHAR)) AS user_id,
      |         concat('impression_', CAST(event_id AS VARCHAR)) AS impression_id,
      |         concat('ad_', CAST(event_id % 90 AS VARCHAR)) AS ad_id,
      |         concat('click_', CAST(event_id AS VARCHAR)) AS click_id
      |  FROM events WHERE event_id % 5 = 0
      |)""".stripMargin
}
