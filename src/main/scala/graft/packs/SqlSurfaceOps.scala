package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack
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

  // The SQL-text queries verify against the SAME oracle strings as
  // their DataFrame twins (shared in ReferencePipelines) — one spec.
  override def oracleSql: Map[String, String] = Map(
    "sql_windowed_avg" -> ReferencePipelines.windowedAvgOracle,

    "sql_ads_with_clicks" -> ReferencePipelines.ctrJoinOracle,

    "sql_ctr" -> (ReferencePipelines.ctrCountsCtes +
      s"""
         |SELECT ad_id, num_impressions, num_clicks,
         |${ReferencePipelines.ctrFaithfulSelect}
         |FROM counts""".stripMargin)
  )
}
