package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{QueryPack, Tables}
import graft.sql.KsqlSurface

/** The KSQL-comment statements as genuine Spark SQL (SURVEY.md §3.3) —
  * same oracles as their DataFrame twins, but exercising the parse →
  * analyze → optimize lifecycle — plus an extension-operator query
  * written entirely against the registered graft_* SQL functions. */
object SqlSurfaceOps extends QueryPack {

  /** Blocked n-gram Jaccard dedup as pure SQL text over the graft_*
    * native-expression functions (GraftFunctions) — proves the SQL
    * surface of the extension operators end-to-end through the DuckDB
    * gate, against the SAME oracle as the DataFrame twin. The window
    * count mirrors blockedNgramJaccard's maxBlockSize cap. */
  def dedupNgramSql(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Dedup.{NgramMaxBlockSize, NgramPrefixLen, NgramShingleN, NgramThreshold}
    graft.functions.GraftFunctions.register(spark) // idempotent
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    spark.sql(
      s"""WITH t AS (
         |  SELECT * FROM (
         |    SELECT doc_id, substring(text, 1, $NgramPrefixLen) AS blk,
         |           graft_shingles(text, $NgramShingleN) AS sh,
         |           count(1) OVER (PARTITION BY substring(text, 1, $NgramPrefixLen)) AS blk_n
         |    FROM documents
         |  ) WHERE blk_n <= $NgramMaxBlockSize
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       round(graft_jaccard(a.sh, b.sh), 4) AS jac
         |FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |WHERE graft_jaccard(a.sh, b.sh) >= $NgramThreshold""".stripMargin)
  }

  /** The training-output layout (shard + concat-and-chunk pack) as pure
    * SQL text — the declarative twin of
    * [[graft.operators.TextAnalysis.packSequences]]: the salted
    * md5-derived shard/order hashes spelled in builtin SQL functions
    * (`conv(substring(md5(..)))` IS the md5h60 idiom), the same fused
    * rank + running-sum window, the same integer `div`/`pmod` sequence
    * arithmetic. Same oracle string as the DataFrame twin. */
  def packSequencesSql(spark: SparkSession, sfDir: String): DataFrame = {
    val ns = TextOps.NumShards
    val b = TextOps.PackBudget
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    spark.sql(
      s"""WITH s AS (
         |  SELECT doc_id,
         |    pmod(CAST(conv(substring(md5(concat('shard#', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT), $ns) AS shard,
         |    CAST(conv(substring(md5(concat('ord#', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) AS ord,
         |    CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), w AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS BIGINT) AS pos,
         |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM s
         |)
         |SELECT doc_id, shard, pos, n_tokens,
         |  CAST((cum - n_tokens) div $b AS BIGINT) AS seq_first,
         |  CAST((cum - 1) div $b AS BIGINT) AS seq_last,
         |  CAST(pmod(cum - n_tokens, $b) AS BIGINT) AS seq_offset
         |FROM w""".stripMargin)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_windowed_avg" -> (KsqlSurface.windowedAvgSql _),
    "sql_ads_with_clicks" -> (KsqlSurface.adsWithClicksSql _),
    "sql_ctr" -> (KsqlSurface.ctrSql _),
    "sql_dedup_ngram" -> (dedupNgramSql _),
    "sql_pack_sequences" -> (packSequencesSql _)
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
         |FROM counts""".stripMargin),

    "sql_dedup_ngram" -> DedupOps.ngramJaccardOracle,

    "sql_pack_sequences" -> TextOps.oracleSql("pack_sequences")
  )
}
