package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilaritySearch

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("heap top-k matches window top-k exactly (ties, ranks, order)") {
    // deliberate score ties to exercise the id tie-break
    val scored = Seq(
      ("q1", 1L, 0.9), ("q1", 2L, 0.9), ("q1", 3L, 0.8), ("q1", 4L, 0.95),
      ("q2", 5L, 0.1), ("q2", 6L, 0.1), ("q2", 7L, 0.1), ("q2", 8L, 0.1)
    ).toDF("g", "id", "s")
    val out = scored.groupBy(col("g"))
      .agg(TopKByScore(col("s"), col("id"), 3).as("topk"))
      .select(col("g"), posexplode(col("topk")))
      .select(col("g"), col("pos"), col("col.score"), col("col.id"))
      .as[(String, Int, Double, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.filter(_._1 == "q1").map(r => (r._4, r._3)).toSeq ==
      Seq((4L, 0.95), (1L, 0.9), (2L, 0.9)))
    assert(out.filter(_._1 == "q2").map(_._4).toSeq == Seq(5L, 6L, 7L))
  }

  test("bruteForceTopKHeap is bit-identical to the window formulation on testdata") {
    val vectors = graft.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val queries = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val window = SimilaritySearch.bruteForceTopK(vectors, queries, 10)
      .as[(Long, Long, Double, Long)].collect().toSet
    val heap = SimilaritySearch.bruteForceTopKHeap(vectors, queries, 10)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(heap == window)
  }

  test("partial combine survives repartitioning (merge path exercised)") {
    val scored = (1L to 1000L).map(i => ("g", i, (i % 97).toDouble))
      .toDF("g", "id", "s").repartition(8)
    val out = scored.groupBy(col("g"))
      .agg(TopKByScore(col("s"), col("id"), 5).as("topk"))
      .select(posexplode(col("topk")))
      .select(col("col.id"), col("col.score"))
      .as[(Long, Double)].collect().toSeq
    // score 96 occurs at ids 96, 193, 290, 387, 484 → top-5 by (score desc, id asc)
    assert(out == Seq((96L, 96.0), (193L, 96.0), (290L, 96.0),
      (387L, 96.0), (484L, 96.0)))
  }
}
