package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.packs.TextOps

/** Repeat-factor upsampling and the chunk loss-mask: epoch copies are
  * exact for integer factors, md5-gated for fractional ones, absent
  * for factor-0 sources; loss ranges partition every document's token
  * stream exactly once. */
class RepeatFactorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val out = TextAnalysis.repeatFactorSample(docs,
    "doc_id", "source", TextOps.RepeatFactorsBp, TextOps.RepeatDefaultBp)
    .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  private def copiesOf(src: String): Map[Long, Seq[Long]] =
    out.filter(_._2 == src).groupBy(_._1)
      .map { case (id, rows) => id -> rows.map(_._3).toSeq.sorted }

  test("integer factor: every src0 doc appears exactly 3 times, copies dense") {
    val n = docs.filter(col("source") === "src0").count()
    val c = copiesOf("src0")
    assert(c.size.toLong == n)
    assert(c.values.forall(_ == Seq(0L, 1L, 2L)))
  }

  test("fractional factor: src1 docs get 2 or 3 copies per the md5 gate") {
    val ids = docs.filter(col("source") === "src1")
      .select(col("doc_id")).as[Long].collect().toSeq
    val c = copiesOf("src1")
    assert(c.keySet == ids.toSet, "every src1 doc appears")
    assert(c.values.forall(v => v == Seq(0L, 1L) || v == Seq(0L, 1L, 2L)))
    // the third copy is exactly the md5-gated half
    val emb = new graft.functions.HashEmbedder(1)
    val gated = ids.filter(id => emb.md5h60(s"rep#$id") % 10000 < 5000).toSet
    assert(c.filter(_._2.size == 3).keySet == gated)
    assert(gated.nonEmpty && gated.size < ids.size,
      "both gate outcomes must be live at this corpus size")
  }

  test("sub-epoch and zero factors down-sample and exclude") {
    val n2 = docs.filter(col("source") === "src2").count()
    val c2 = copiesOf("src2")
    assert(c2.values.forall(_ == Seq(0L)), "sub-epoch docs appear at most once")
    assert(c2.nonEmpty && c2.size.toLong < n2, "sub-epoch keeps a strict subset")
    assert(copiesOf("src3").isEmpty, "factor 0 emits nothing")
  }

  test("unlisted sources default to exactly one epoch") {
    val n = docs.filter(col("source") === "src7").count()
    val c = copiesOf("src7")
    assert(c.size.toLong == n && c.values.forall(_ == Seq(0L)))
  }

  test("chunk loss ranges partition each document's tokens exactly once") {
    val ct = TextOps.ChunkTokens
    val co = TextOps.ChunkOverlap
    val ranges = TextAnalysis.chunkLossMask(docs, "doc_id", "text", ct, co)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val nTokens = docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(ranges.keySet == nTokens.keySet)
    ranges.foreach { case (id, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._3 == 1L, s"doc $id: first range starts at 1")
      assert(sorted.last._4 == nTokens(id), s"doc $id: last range ends at n")
      sorted.sliding(2).foreach {
        case Array((_, _, _, to), (_, _, from, _)) =>
          assert(from == to + 1, s"doc $id: ranges must tile without gap/overlap")
        case _ => ()
      }
      // masked prefix = overlap on every non-first chunk
      val chunkStarts = sorted.map { case (_, idx, from, _) =>
        idx -> (from - (if (idx > 0) co else 0)) }
      chunkStarts.foreach { case (idx, start) =>
        assert(start == 1 + idx * (ct - co), s"doc $id chunk $idx start")
      }
    }
  }

  test("loss-mask chunks align one-to-one with chunkDocuments") {
    val ct = TextOps.ChunkTokens
    val co = TextOps.ChunkOverlap
    val chunks = TextAnalysis.chunkDocuments(docs, "doc_id", "text", ct, co)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val masks = TextAnalysis.chunkLossMask(docs, "doc_id", "text", ct, co)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(chunks.keySet == masks.keySet)
    masks.foreach { case (k @ (_, idx), (from, to)) =>
      val expected = chunks(k) - (if (idx > 0) co else 0)
      assert(to - from + 1 == expected,
        s"chunk $k: unmasked length ${to - from + 1} != n_tokens - overlap")
    }
  }
}
