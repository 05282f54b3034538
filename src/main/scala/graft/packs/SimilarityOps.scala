package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.operators.SimilaritySearch

/** Similarity-search queries over the embeddings table. The brute-force
  * top-k and threshold pair search have full DuckDB oracles (identical
  * index-ordered double math + post-round ranking). The LSH path uses
  * engine-side seeded hyperplanes → rows-only for the driver; recall is
  * asserted against brute force in SimilaritySearchSpec.
  */
object SimilarityOps extends QueryPack {

  private def queriesDf(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  def annBrute(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.bruteForceTopK(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      queriesDf(spark, sfDir), k = 10)

  def annLsh(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.lshTopK(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      queriesDf(spark, sfDir), k = 10)

  /** Same result as ann_brute through the bounded-heap aggregate —
    * registered against the SAME oracle to prove bit-identity. */
  def annTopkAgg(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.bruteForceTopKHeap(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      queriesDf(spark, sfDir), k = 10)

  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    // train once per (dataset, params) per JVM — verify/bench re-execute
    // each query; retraining the quantizer per execution is a scale-killer
    val centroids = graft.operators.IvfIndex.trainCached(
      vectors, datasetKey = sfDir, nlist = 16, iters = 2)
    graft.operators.IvfIndex.topK(vectors, queriesDf(spark, sfDir), centroids,
      k = 10, nprobe = 4)
  }

  def embeddingNearDupLsh(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.lshNearDupPairs(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      threshold = 0.4)

  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.cosineNearDupPairs(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      threshold = 0.4)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_brute" -> (annBrute _),
    "ann_lsh" -> (annLsh _),
    "ann_topk_agg" -> (annTopkAgg _),
    "ann_ivf" -> (annIvf _),
    "embedding_neardup" -> (embeddingNearDup _),
    "embedding_neardup_lsh" -> (embeddingNearDupLsh _)
  )

  private val normCte =
    """WITH v AS (
      |  SELECT vec_id, embedding,
      |         sqrt(list_sum(list_transform(generate_series(1, 64),
      |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
      |  FROM embeddings
      |)""".stripMargin

  private def annBruteOracle: String = normCte +
    """, q AS (
      |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
      |  FROM v WHERE vec_id % 100 = 0
      |), scored AS (
      |  SELECT q.query_id, v.vec_id,
      |         round(CASE WHEN q.q_nrm * v.nrm = 0 THEN 0.0
      |           ELSE list_sum(list_transform(generate_series(1, 64),
      |                  i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))
      |                / (q.q_nrm * v.nrm) END, 4) AS sim
      |  FROM q, v WHERE v.vec_id <> q.query_id
      |)
      |SELECT query_id, vec_id, sim, rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY sim DESC, vec_id ASC) AS rk
      |  FROM scored
      |) WHERE rk <= 10""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    // same oracle for both — proves the heap aggregate's bit-identity
    "ann_topk_agg" -> annBruteOracle,
    "ann_brute" -> annBruteOracle,

    "embedding_neardup" -> (normCte +
      """
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |       round(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
        |         ELSE list_sum(list_transform(generate_series(1, 64),
        |                i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |              / (a.nrm * b.nrm) END, 4) AS sim
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE round(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
        |         ELSE list_sum(list_transform(generate_series(1, 64),
        |                i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |              / (a.nrm * b.nrm) END, 4) >= 0.4""".stripMargin)
  )
}
