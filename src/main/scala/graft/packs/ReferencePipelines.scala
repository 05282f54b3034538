package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.operators.WindowedAverages

/** Batch-verifiable forms of the reference's two pipelines, computed over
  * the driver's deterministic `events` table (orders-proxy: `ts` → event
  * time, `value` → order_total; FIXTURES.md §2).
  */
object ReferencePipelines extends QueryPack {

  /** windowed_avg — the Aggregations pipeline (SURVEY.md §3.1) on events. */
  def windowedAvg(spark: SparkSession, sfDir: String): DataFrame =
    WindowedAverages
      .windowedAvg(Tables.events(spark, sfDir), "ts", "value")
      .select(
        col("win_key"),
        round(col("avg_total_x2"), 4).as("avg_total_x2"),
        round(col("avg_total"), 4).as("avg_total"),
        col("n"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "windowed_avg" -> (windowedAvg _)
  )

  override def oracleSql: Map[String, String] = Map(
    "windowed_avg" ->
      """WITH b AS (
        |  SELECT (epoch_ms(ts) // 30000) * 30000 AS ws, value AS v
        |  FROM events
        |)
        |SELECT
        |  concat(CAST(ws AS VARCHAR), '-', CAST(ws + 30000 AS VARCHAR), '-0') AS win_key,
        |  round(avg(v * 2), 4) AS avg_total_x2,
        |  round(avg(v), 4) AS avg_total,
        |  count(*) AS n
        |FROM b GROUP BY ws""".stripMargin
  )
}
