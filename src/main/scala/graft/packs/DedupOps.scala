package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.operators.Dedup

/** Dedup queries over the documents table. Exact + blocked-Jaccard have
  * full DuckDB oracles; MinHash/SimHash rely on engine-specific 64-bit
  * hashes (xxhash64) DuckDB can't reproduce → rows-only for the driver,
  * with value-level assertions in DedupSpec (planted near-dups).
  */
object DedupOps extends QueryPack {

  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, sfDir), "doc_id", "text")

  def dedupNgramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.blockedNgramJaccard(Tables.documents(spark, sfDir), "doc_id", "text")
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))

  def dedupMinhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(spark, sfDir), "doc_id", "text")
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))

  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, sfDir), "doc_id", "text")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_simhash" -> (dedupSimhash _)
  )

  /** Shared with sql_dedup_ngram (SqlSurfaceOps): the SQL-function twin
    * verifies against the SAME oracle string, so the two surfaces can't
    * silently diverge. */
  val ngramJaccardOracle: String =
    """WITH t AS (
        |  SELECT doc_id, substr(text, 1, 40) AS blk,
        |         list_transform(generate_series(1, len(toks) - 2),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
        |              ELSE CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
        |                   / len(list_distinct(a.sh || b.sh)) END AS jac
        |  FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |)
        |SELECT doc_a, doc_b, round(jac, 4) AS jac
        |FROM pairs WHERE jac >= 0.8""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "dedup_ngram_jaccard" -> ngramJaccardOracle
  )
}
