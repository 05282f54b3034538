package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack
import graft.sources.AdFixtures
import graft.sql.KsqlSurface

/** The KSQL-comment statements as genuine Spark SQL (SURVEY.md §3.3) —
  * same oracles as their DataFrame twins, but exercising the parse →
  * analyze → optimize lifecycle. */
object SqlSurfaceOps extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_windowed_avg" -> (KsqlSurface.windowedAvgSql _),
    "sql_ads_with_clicks" -> (KsqlSurface.adsWithClicksSql _),
    "sql_ctr" -> (KsqlSurface.ctrSql _)
  )

  override def oracleSql: Map[String, String] = Map(
    "sql_windowed_avg" ->
      """WITH b AS (
        |  SELECT (epoch_ms(ts) // 30000) * 30000 AS ws, value AS v
        |  FROM events
        |)
        |SELECT
        |  concat(CAST(ws AS VARCHAR), '-', CAST(ws + 30000 AS VARCHAR), '-0') AS win_key,
        |  round(avg(v * 2), 4) AS avg_total_x2,
        |  round(avg(v), 4) AS avg_total,
        |  count(*) AS n
        |FROM b GROUP BY ws""".stripMargin,

    "sql_ads_with_clicks" -> (AdFixtures.oracleCtes +
      """
        |SELECT imp.impression_id,
        |       imp.ad_id,
        |       (clk.click_id IS NOT NULL) AS was_clicked,
        |       coalesce(clk.click_id, '') AS click_id
        |FROM imp LEFT JOIN clk
        |  ON imp.impression_id = clk.impression_id
        | AND clk.click_time_ms BETWEEN imp.impression_time_ms - 60000
        |                           AND imp.impression_time_ms + 60000""".stripMargin),

    "sql_ctr" -> (AdFixtures.oracleCtes +
      """, joined AS (
        |  SELECT imp.ad_id, (clk.click_id IS NOT NULL) AS was_clicked
        |  FROM imp LEFT JOIN clk
        |    ON imp.impression_id = clk.impression_id
        |   AND clk.click_time_ms BETWEEN imp.impression_time_ms - 60000
        |                             AND imp.impression_time_ms + 60000
        |), counts AS (
        |  SELECT ad_id,
        |         count(CASE WHEN NOT was_clicked THEN 1 END) AS num_impressions,
        |         count(CASE WHEN was_clicked THEN 1 END) AS num_clicks
        |  FROM joined GROUP BY ad_id
        |)
        |SELECT ad_id, num_impressions, num_clicks,
        |       round(CASE WHEN num_clicks = 0 THEN 0.0
        |             WHEN num_impressions = 0 THEN CAST('Infinity' AS DOUBLE)
        |             ELSE CAST(num_clicks AS DOUBLE) / num_impressions END, 4) AS ctr
        |FROM counts""".stripMargin)
  )
}
