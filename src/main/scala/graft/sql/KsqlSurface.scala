package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.sources.AdFixtures

/** The reference's declarative surface made real (SURVEY.md §3.3).
  *
  * The reference author wrote KSQL in comments (Aggregations.java:71-77,
  * StreamStreamJoin.java:27-43) and hand-compiled it to DSL calls; there
  * is no parser in the repo. Here the same statements run as genuine SQL
  * text through Spark's full lifecycle — ANTLR parse → Analyzer →
  * Catalyst optimize → physical planning — over temp views of the
  * decoded streams. This is the "CREATE STREAM ... / SELECT ..." entry
  * point a KSQL user would migrate to.
  */
object KsqlSurface {

  /** CREATE STREAM equivalents: register the decoded stream relations. */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.events(spark, sfDir)
      .select(col("ts"), col("value"))
      .createOrReplaceTempView("orders_stream")
    AdFixtures.impressions(spark, sfDir).createOrReplaceTempView("impressions")
    AdFixtures.clicks(spark, sfDir).createOrReplaceTempView("clicks")
  }

  /** KSQL: SELECT constant_key, avg(order_total*2), avg(order_total)
    * FROM orders GROUP BY constant_key (+ 30 s tumbling window)
    * — Aggregations.java:71-77. The averages are the reference's A4/A5
    * (sum, sum, count)-then-divide decomposition over exact cents sums
    * (hash-deterministic — see WindowedAverages). */
  def windowedAvgSql(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(
      """WITH a AS (
        |  SELECT w,
        |         CAST(sum(CAST(round(v * 2 * 100) AS BIGINT)) AS BIGINT) AS s2c,
        |         CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS s1c,
        |         count(1) AS n
        |  FROM (SELECT window(ts, '30 seconds') AS w, value AS v FROM orders_stream)
        |  GROUP BY w
        |)
        |SELECT concat(CAST(unix_millis(w.start) AS STRING), '-',
        |              CAST(unix_millis(w.end) AS STRING), '-0') AS win_key,
        |       round((CAST(s2c AS DOUBLE) / 100.0) / CAST(n AS DOUBLE), 4) AS avg_total_x2,
        |       round((CAST(s1c AS DOUBLE) / 100.0) / CAST(n AS DOUBLE), 4) AS avg_total,
        |       n
        |FROM a""".stripMargin)
  }

  /** KSQL: CREATE STREAM ads_with_clicks AS SELECT * FROM impressions
    * LEFT JOIN clicks WITHIN 60 SECONDS ON impressionid
    * — StreamStreamJoin.java:35-37. */
  def adsWithClicksSql(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(
      """SELECT i.impression_id,
        |       i.ad_id,
        |       c.click_id IS NOT NULL AS was_clicked,
        |       coalesce(c.click_id, '') AS click_id
        |FROM impressions i LEFT JOIN clicks c
        |  ON i.impression_id = c.impression_id
        | AND c.click_time_ms BETWEEN i.impression_time_ms - 60000
        |                         AND i.impression_time_ms + 60000""".stripMargin)
  }

  /** KSQL: CREATE TABLE ctr AS SELECT adid,
    * (count(*) WHERE clickid != NULL) / count(*) FROM ads_with_clicks
    * GROUP BY adid — StreamStreamJoin.java:38-43 (faithful A6/A7
    * semantics incl. quirks). */
  def ctrSql(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(
      """WITH joined AS (
        |  SELECT i.ad_id, c.click_id IS NOT NULL AS was_clicked
        |  FROM impressions i LEFT JOIN clicks c
        |    ON i.impression_id = c.impression_id
        |   AND c.click_time_ms BETWEEN i.impression_time_ms - 60000
        |                           AND i.impression_time_ms + 60000
        |), counts AS (
        |  SELECT ad_id,
        |         count(IF(NOT was_clicked, 1, NULL)) AS num_impressions,
        |         count(IF(was_clicked, 1, NULL)) AS num_clicks
        |  FROM joined GROUP BY ad_id
        |)
        |SELECT ad_id, num_impressions, num_clicks,
        |       round(CASE WHEN num_clicks = 0 THEN 0.0D
        |                  WHEN num_impressions = 0 THEN double('Infinity')
        |                  ELSE CAST(num_clicks AS DOUBLE) / CAST(num_impressions AS DOUBLE)
        |             END, 4) AS ctr
        |FROM counts""".stripMargin)
  }
}
