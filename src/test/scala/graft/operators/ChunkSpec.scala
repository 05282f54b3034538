package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Overlapping fixed-window chunking invariants: full coverage,
  * exact overlap between consecutive chunks, short final chunk,
  * sub-window identity, and reconstruction of the original token
  * stream from the stride-deduplicated chunks. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, win: Int, ov: Int): Seq[(Long, String, Long)] =
    TextAnalysis.chunkDocuments(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", win, ov)
      .select(col("chunk_idx"), col("text"), col("n_tokens"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)

  test("hand-checked windows: overlap, short tail, sub-window identity") {
    // 10 tokens, window 4, overlap 2 → starts 1,3,5,7 (a start of 9
    // would only re-cover chunk 3's tail — no pure-overlap chunks)
    val got = chunksOf("a b c d e f g h i j", 4, 2)
    assert(got == Seq(
      (0L, "a b c d", 4L), (1L, "c d e f", 4L), (2L, "e f g h", 4L),
      (3L, "g h i j", 4L)))
    // doc at the window emits exactly one chunk equal to itself
    assert(chunksOf("a b c d", 4, 2) == Seq((0L, "a b c d", 4L)))
    // doc under the window too
    assert(chunksOf("a", 4, 2) == Seq((0L, "a", 1L)))
    // zero overlap tiles exactly
    assert(chunksOf("a b c d e", 2, 0) ==
      Seq((0L, "a b", 2L), (1L, "c d", 2L), (2L, "e", 1L)))
  }

  test("corpus invariants: coverage, stride reconstruction, n_tokens") {
    val docs = Tables.documents(spark, sf).limit(50)
    val win = 16
    val ov = 4
    val chunks = TextAnalysis.chunkDocuments(docs, "doc_id", "text", win, ov)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    docs.as[(Long, String, String, String, Long)].collect().foreach {
      case (id, text, _, _, _) =>
        val toks = text.split(" ", -1)
        val cs = chunks(id)
        // chunk idx contiguous from 0; counts match the slice lengths
        assert(cs.map(_._2).toSeq == (0L until cs.length.toLong).toSeq)
        cs.foreach { case (_, i, t, n) =>
          assert(t.split(" ", -1).length == n, s"doc $id chunk $i")
        }
        // dropping each chunk's leading overlap (except chunk 0)
        // reconstructs the original token stream exactly
        val rebuilt = cs.toSeq.flatMap { case (_, i, t, _) =>
          val parts = t.split(" ", -1).toSeq
          if (i == 0) parts else parts.drop(ov)
        }
        assert(rebuilt == toks.toSeq, s"doc $id: chunks must cover the stream")
    }
  }
}
