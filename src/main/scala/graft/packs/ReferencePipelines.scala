package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.operators.{ClickThroughRate, WindowedAverages}
import graft.sources.AdFixtures

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

  /** ctr_join — J1's row-level join output (impressions ⟕ clicks ±60 s). */
  def ctrJoin(spark: SparkSession, sfDir: String): DataFrame =
    ClickThroughRate
      .joinImpressionsClicks(
        AdFixtures.impressions(spark, sfDir),
        AdFixtures.clicks(spark, sfDir))
      .select(
        col("impression_id"),
        col("ad_id"),
        col("was_clicked"),
        coalesce(col("click_id"), lit("")).as("click_id"))

  /** ctr — the full CTR table (SURVEY.md §3.2), faithful + corrected. */
  def ctr(spark: SparkSession, sfDir: String): DataFrame = {
    val out = ClickThroughRate.ctrByAd(
      AdFixtures.impressions(spark, sfDir),
      AdFixtures.clicks(spark, sfDir))
    out.select(
      col("ad_id"),
      col("num_impressions"),
      col("num_clicks"),
      round(col("ctr"), 4).as("ctr"),
      round(col("ctr_corrected"), 4).as("ctr_corrected"))
  }

  /** avro_roundtrip — the reference's OTHER wire format (its ad streams
    * are ksql-datagen Avro, impressions.avro / click.avro): impressions
    * fixture → the reference's exact record schema (field names incl.
    * the `impresssiontime` typo) → Avro binary → decode → back. The
    * identity oracle proves the binary codec round-trips the stream —
    * S5/S6's csv_roundtrip for the Avro wire. */
  def avroRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.AvroCodec
    val wire = AdFixtures.impressions(spark, sfDir).select(
      col("impression_time_ms").as("impresssiontime"),
      col("impression_id").as("impressionid"),
      col("user_id").as("userid"),
      col("ad_id").as("adid"))
    AvroCodec.decode(
        AvroCodec.encode(wire, AvroCodec.ImpressionSchemaJson),
        "value", AvroCodec.ImpressionSchemaJson)
      .select(col("impresssiontime").as("impression_time_ms"),
        col("impressionid").as("impression_id"),
        col("userid").as("user_id"),
        col("adid").as("ad_id"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "windowed_avg" -> (windowedAvg _),
    "ctr_join" -> (ctrJoin _),
    "ctr" -> (ctr _),
    "avro_roundtrip" -> (avroRoundtrip _)
  )

  // Shared oracle bodies — SqlSurfaceOps verifies the SQL-text twins of
  // these pipelines against the SAME oracle strings, so a correction in
  // one place can't silently diverge the two verification specs.

  /** Oracle for the windowed-average pipeline (and sql_windowed_avg).
    * Averages derive from exact cents sums on both sides (the pack-wide
    * "re-aggregated doubles are never hash-compared" rule — see
    * RelationalOps): long sums are order-independent, and the final
    * division sequence (long→double, /100.0, /n) is the identical IEEE
    * expression in both engines. */
  val windowedAvgOracle: String =
    """WITH b AS (
      |  SELECT (epoch_ms(ts) // 30000) * 30000 AS ws, value AS v
      |  FROM events
      |), a AS (
      |  SELECT ws,
      |         CAST(sum(CAST(round(v * 2 * 100) AS BIGINT)) AS BIGINT) AS s2c,
      |         CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS s1c,
      |         count(*) AS n
      |  FROM b GROUP BY ws
      |)
      |SELECT
      |  concat(CAST(ws AS VARCHAR), '-', CAST(ws + 30000 AS VARCHAR), '-0') AS win_key,
      |  round((CAST(s2c AS DOUBLE) / 100.0) / n, 4) AS avg_total_x2,
      |  round((CAST(s1c AS DOUBLE) / 100.0) / n, 4) AS avg_total,
      |  n
      |FROM a""".stripMargin

  /** Oracle for the row-level join output (and sql_ads_with_clicks). */
  val ctrJoinOracle: String = AdFixtures.oracleCtes +
    """
      |SELECT imp.impression_id,
      |       imp.ad_id,
      |       (clk.click_id IS NOT NULL) AS was_clicked,
      |       coalesce(clk.click_id, '') AS click_id
      |FROM imp LEFT JOIN clk
      |  ON imp.impression_id = clk.impression_id
      | AND clk.click_time_ms BETWEEN imp.impression_time_ms - 60000
      |                           AND imp.impression_time_ms + 60000""".stripMargin

  /** Shared join + per-ad counts CTE chain for the CTR oracles. */
  val ctrCountsCtes: String = AdFixtures.oracleCtes +
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
      |)""".stripMargin

  /** Faithful-CTR select expression (A7 quirks incl. Infinity branch). */
  val ctrFaithfulSelect: String =
    """round(CASE WHEN num_clicks = 0 THEN 0.0
      |      WHEN num_impressions = 0 THEN CAST('Infinity' AS DOUBLE)
      |      ELSE CAST(num_clicks AS DOUBLE) / num_impressions END, 4) AS ctr""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    // identity oracle: the Avro encode→decode must reproduce the
    // impressions fixture exactly
    "avro_roundtrip" -> (AdFixtures.oracleCtes +
      "\nSELECT impression_time_ms, impression_id, user_id, ad_id FROM imp"),

    "windowed_avg" -> windowedAvgOracle,

    "ctr_join" -> ctrJoinOracle,

    "ctr" -> (ctrCountsCtes +
      s"""
         |SELECT ad_id, num_impressions, num_clicks,
         |$ctrFaithfulSelect,
         |round(CASE WHEN num_impressions + num_clicks = 0 THEN 0.0
         |      ELSE CAST(num_clicks AS DOUBLE) / (num_impressions + num_clicks) END, 4) AS ctr_corrected
         |FROM counts""".stripMargin)
  )
}
