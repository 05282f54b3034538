package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quality-decile token histogram + curriculum layout: bucket edges,
  * mass conservation, stage assignment, and the stratification
  * contract (within a (stage, shard) cell the curriculum preserves the
  * shardAssign pack order). */
class CurationLayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sf)

  test("quality histogram conserves doc and token mass; buckets in range") {
    val hist = TextAnalysis.qualityTokenHistogram(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    assert(hist.nonEmpty)
    hist.foreach { case (bucket, nDocs, nTokens, shareBp) =>
      assert(bucket >= 0L && bucket <= 9L)
      assert(nDocs > 0L && nTokens > 0L)
      assert(shareBp >= 0L && shareBp <= 10000L)
    }
    assert(hist.map(_._2).sum == docs.count())
    val totalTokens = docs
      .select(sum(size(TextAnalysis.tokens(col("text")))).cast("long"))
      .as[Long].head()
    assert(hist.map(_._3).sum == totalTokens)
    // per-bucket floor loses < 1 bp each
    val shareSum = hist.map(_._4).sum
    assert(shareSum <= 10000L && shareSum > 10000L - hist.length)
  }

  test("quality histogram buckets equal recomputation from qualityScore") {
    val expected = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .join(docs, "doc_id")
      .select(
        least(expr("CAST(round(quality * 10000, 0) AS BIGINT) div 1000"),
          lit(9L)).as("bucket"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val got = TextAnalysis.qualityTokenHistogram(docs, "doc_id", "text")
      .select("bucket", "n_docs", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
  }

  private val cutoffs = graft.packs.TextOps.CurriculumCutoffsBp

  test("curriculum: stage matches quality cutoffs, pos contiguous per cell") {
    val cur = TextAnalysis.curriculumOrder(docs, "doc_id", "text",
      nShards = 4, cutoffsBp = cutoffs)
    val joined = cur.join(
      TextAnalysis.qualityScore(docs, "doc_id", "text"), "doc_id")
      .select(col("stage"), col("shard"), col("pos"),
        expr("CAST(round(quality * 10000, 0) AS BIGINT)").as("q_bp"))
      .as[(Long, Long, Long, Long)].collect()
    assert(joined.length == docs.count())
    joined.foreach { case (stage, shard, pos, qBp) =>
      val expected = cutoffs.indexWhere(qBp >= _) match {
        case -1 => cutoffs.size.toLong
        case i => i.toLong
      }
      assert(stage == expected, s"q_bp=$qBp stage=$stage")
      assert(shard >= 0L && shard < 4L && pos >= 1L)
    }
    // every stage populated on the real corpus; pos is 1..n per cell
    assert(joined.map(_._1).distinct.sorted.toSeq ==
      (0L to cutoffs.size.toLong))
    joined.groupBy(t => (t._1, t._2)).foreach { case (_, cell) =>
      assert(cell.map(_._3).sorted.toSeq == (1L to cell.length.toLong))
    }
  }

  test("curriculum preserves shardAssign relative order within a cell") {
    val cur = TextAnalysis.curriculumOrder(docs, "doc_id", "text",
      nShards = 4, cutoffsBp = cutoffs)
      .select(col("doc_id"), col("stage"), col("shard"),
        col("pos").as("cur_pos"))
    val pack = TextAnalysis.shardAssign(docs, "doc_id", nShards = 4)
      .select(col("doc_id"), col("pos").as("pack_pos"))
    val cells = cur.join(pack, "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(t => (t._2, t._3))
    cells.foreach { case (_, cell) =>
      val byCur = cell.sortBy(_._4).map(_._1).toSeq
      val byPack = cell.sortBy(_._5).map(_._1).toSeq
      assert(byCur == byPack)
    }
  }
}
