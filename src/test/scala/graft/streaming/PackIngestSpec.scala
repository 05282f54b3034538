package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.TextAnalysis

/** The pack-ingest loop: each batch extends the training layout
  * arrival-major with seam-exact token-stream continuity across batch
  * (and restart) boundaries, state bounded by the shard count, and
  * at-least-once replays re-emitting the identical rows. */
class PackIngestSpec extends SparkSpec {
  import spark.implicits._

  private val NShards = 4
  private val Budget = 32

  private type PackRow = (Long, Long, Long, Long, Long, Long, Long)

  private def collectPacked(df: org.apache.spark.sql.DataFrame): Seq[PackRow] =
    df.as[PackRow].collect().toSeq.sortBy(r => (r._2, r._3))

  /** The ShardPackSpec invariants, over an already-concatenated
    * per-shard stream: contiguous positions from 1, each doc starting
    * exactly where the previous ended, seq ids/offsets the pure prefix
    * sum of the whole stream. */
  private def assertSeamExact(rows: Seq[PackRow]): Unit =
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val inOrder = rs.sortBy(_._3)
      assert(inOrder.map(_._3) == (1L to rs.length).toSeq,
        s"shard $shard: positions must be 1..n contiguous across batches")
      var cum = 0L
      inOrder.foreach { case (id, _, _, n, first, last, off) =>
        assert(n >= 1)
        assert(off == cum % Budget, s"doc $id: offset $off != ${cum % Budget}")
        assert(first == cum / Budget, s"doc $id: seq_first")
        assert(last == (cum + n - 1) / Budget, s"doc $id: seq_last")
        cum += n
      }
    }

  test("sequential ingest: seam-exact layout, batch-arithmetic parity, bounded state, replay + restart exact") {
    val dir = Files.createTempDirectory("graft-pack-ingest").toString
    val store = new PackStore(NShards, Budget, dir)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    def part(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === lit(i))

    val e0 = collectPacked(
      StreamingPipelines.packIngestBatch(store, part(0), "doc_id", "text", 0L))
    val e1 = collectPacked(
      StreamingPipelines.packIngestBatch(store, part(1), "doc_id", "text", 1L))
    val e2 = collectPacked(
      StreamingPipelines.packIngestBatch(store, part(2), "doc_id", "text", 2L))
    assert(e0.nonEmpty && e1.nonEmpty && e2.nonEmpty)

    // the concatenated stream obeys the batch operator's invariants
    // ACROSS batch boundaries — mid-sequence seams included
    assertSeamExact(e0 ++ e1 ++ e2)

    // drift-proof arithmetic: the first batch (base 0) IS the batch
    // operator on that slice
    val batchForm = collectPacked(
      TextAnalysis.packSequences(part(0), "doc_id", "text", NShards, Budget))
    assert(e0 == batchForm,
      "batch 0 must equal packSequences on the same slice")

    // bounded state: folded history + last contribution only
    val t = store.table(spark)
    assert(t.count() <= 2L * NShards, "state must be <= 2*nShards rows")
    val ids = t.select(col("batch_id")).distinct().as[Long].collect().toSet
    assert(ids.subsetOf(Set(PackStore.FoldedBatch, 2L)),
      s"older contributions must fold, got batch_ids $ids")

    // at-least-once replay of the last batch: identical emission, no
    // state growth, merge no-op
    val replay = collectPacked(
      StreamingPipelines.packIngestBatch(store, part(2), "doc_id", "text", 2L))
    assert(replay == e2, "replay must re-emit the identical rows")
    assert(store.table(spark).count() == t.count())

    // restart adoption: a new JVM's store on the same dir continues the
    // stream — a replayed last batch is still exact, and the NEXT batch
    // starts in the very token slot batch 2 ended
    val adopted = new PackStore(NShards, Budget, dir)
    assert(adopted.isReplay(2L), "adoption must restore the replay guard")
    val replayAdopted = collectPacked(StreamingPipelines.packIngestBatch(
      adopted, part(2), "doc_id", "text", 2L))
    assert(replayAdopted == e2, "post-restart replay must be exact")
    val extra = Seq((1000003L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val e3 = collectPacked(StreamingPipelines.packIngestBatch(
      adopted, extra, "doc_id", "text", 3L))
    assert(e3.size == 1)
    assertSeamExact(e0 ++ e1 ++ e2 ++ e3)
  }

  test("BPE-denominated ingest: same seam machinery under the subword count") {
    // the countOf seam: the streaming twin inherits the batch
    // operator's token-denomination parameter, so the BPE layout
    // streams with the identical window/fold body — batch 0 must equal
    // packSequencesWith on the same slice, and the concatenated stream
    // keeps the seam-exact invariants under the subword counts
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val merges = graft.operators.BpeTokenizer.trainCached(docs, sf, "text",
      graft.packs.TextOps.MaxBpeWords, graft.packs.TextOps.NumBpeMerges)
    def bpe(t: org.apache.spark.sql.Column) =
      graft.functions.BpeTokenCount(t, merges)
    val store = new PackStore(NShards, Budget,
      Files.createTempDirectory("graft-pack-bpe").toString)
    def part(i: Int) = docs.filter(pmod(col("doc_id"), lit(2)) === lit(i))
    val e0 = collectPacked(StreamingPipelines.packIngestBatch(
      store, part(0), "doc_id", "text", 0L, countOf = bpe))
    val e1 = collectPacked(StreamingPipelines.packIngestBatch(
      store, part(1), "doc_id", "text", 1L, countOf = bpe))
    assertSeamExact(e0 ++ e1)
    val batchForm = collectPacked(TextAnalysis.packSequencesWith(
      part(0), "doc_id", "text", NShards, Budget, bpe))
    assert(e0 == batchForm,
      "batch 0 must equal packSequencesWith under the same BPE table")
    // and the denomination is genuinely different from whitespace
    val wsForm = collectPacked(
      TextAnalysis.packSequences(part(0), "doc_id", "text", NShards, Budget))
    assert(e0 != wsForm, "BPE counts must actually change the layout")
  }

  test("merge refuses sentinel batch ids") {
    val store = new PackStore(2, 16)
    val contrib = Seq((0L, 1L, 5L)).toDF("shard", "n_docs", "n_tokens")
    intercept[IllegalArgumentException] {
      store.merge(contrib, VersionedParquetStore.NoBatchId)
    }
  }

  test("adoption refuses mismatched layout parameters AND cross-type adoption") {
    val dir = Files.createTempDirectory("graft-pack-params").toString
    new PackStore(4, 32, dir)
    // a restart with a different budget or shard count would re-chunk
    // the already-emitted layout — construction must fail loudly
    intercept[IllegalArgumentException] { new PackStore(4, 64, dir) }
    intercept[IllegalArgumentException] { new PackStore(8, 32, dir) }
    // matching parameters but the WRONG store type: a padded store
    // adopting concat-and-chunk totals must fail at construction, not
    // as a schema error mid-stream
    intercept[IllegalArgumentException] { new PaddedPackStore(4, 32, dir) }
    new PackStore(4, 32, dir) // identical type + parameters still adopt
  }
}
