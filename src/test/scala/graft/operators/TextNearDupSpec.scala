package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.HashEmbed

/** The text semantic near-dup paths (chunks → hash embeddings → pair
  * verification): a planted duplicated document must surface through
  * BOTH the exact verifier and the LSH blocker, and the LSH pair set
  * is a subset of the exact one (blocking can only lose candidates,
  * never invent pairs — verification is the same exact cosine). */
class TextNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def chunkVectors(docs: DataFrame): DataFrame =
    TextAnalysis.chunkDocuments(docs, "doc_id", "text", 32, 8)
      .select((col("doc_id") * graft.packs.TextOps.ChunkVecBase + col("chunk_idx")).as("vec_id"),
        HashEmbed(col("text"), 64).as("embedding"))

  private def docPairs(pairs: DataFrame): Set[(Long, Long)] =
    pairs.select(expr(s"vec_a div ${graft.packs.TextOps.ChunkVecBase}").as("a"), expr(s"vec_b div ${graft.packs.TextOps.ChunkVecBase}").as("b"))
      .filter(col("a") =!= col("b"))
      .as[(Long, Long)].collect().toSet

  test("planted duplicate surfaces through exact AND LSH; LSH ⊆ exact") {
    val base = Tables.documents(spark, sf).limit(40)
      .select(col("doc_id"), col("text"))
    // plant: doc 0's text re-appears under id 9999 — its chunk vectors
    // are IDENTICAL, so every chunk pair scores cosine 1.0
    val planted = base.filter(col("doc_id") === 0)
      .select(lit(9999L).as("doc_id"), col("text"))
    val vectors = chunkVectors(base.unionByName(planted))

    val exact = docPairs(
      SimilaritySearch.cosineNearDupPairs(vectors, threshold = 0.95))
    val lsh = docPairs(SimilaritySearch.lshNearDupPairs(vectors,
      threshold = 0.95, maxBucketSize = 250))

    assert(exact.contains((0L, 9999L)),
      s"exact path must find the planted duplicate, got $exact")
    assert(lsh.contains((0L, 9999L)),
      "identical chunk vectors co-bucket in every table — the LSH path " +
        "must find the planted duplicate")
    assert(lsh.subsetOf(exact),
      s"LSH may only lose pairs to blocking, never invent them: " +
        s"extra ${lsh -- exact}")
  }
}
