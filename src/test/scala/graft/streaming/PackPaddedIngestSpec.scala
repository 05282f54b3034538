package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.TextAnalysis

/** The padded-pack ingest loop: each batch continues every shard's
  * token stream under the padded fold — mid-sequence continuation and
  * boundary pads both crossing batch (and restart) boundaries exactly,
  * resume state bounded at 2·nShards rows, replays re-emitting the
  * identical rows. */
class PackPaddedIngestSpec extends SparkSpec {
  import spark.implicits._

  private val NShards = 4
  private val Budget = 32

  private type Row8 = (Long, Long, Long, Long, Long, Long, Long, Long)

  private def collectPacked(df: org.apache.spark.sql.DataFrame): Seq[Row8] =
    df.as[Row8].collect().toSeq.sortBy(r => (r._2, r._3))

  /** The padded reference fold over an already-concatenated per-shard
    * stream (the PackPaddedSpec invariants, across batch seams). */
  private def assertPaddedLayout(rows: Seq[Row8], budget: Long): Unit =
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val inOrder = rs.sortBy(_._3)
      assert(inOrder.map(_._3) == (1L to rs.length).toSeq,
        s"shard $shard: positions must be 1..n contiguous across batches")
      var nextSeq = 0L
      var nextOff = 0L
      inOrder.foreach { case (id, _, _, n, first, last, off, pad) =>
        val expPad = if (nextOff > 0 && nextOff + n > budget) budget - nextOff else 0L
        val expSeq = if (expPad > 0) nextSeq + 1 else nextSeq
        val expOff = if (expPad > 0) 0L else nextOff
        assert(pad == expPad, s"doc $id: pad_before $pad != $expPad")
        assert(first == expSeq && off == expOff, s"doc $id: start slot")
        assert(last == expSeq + (expOff + n - 1) / budget, s"doc $id: seq_last")
        val endOff = (expOff + n) % budget
        nextSeq = if (endOff == 0) last + 1 else last
        nextOff = endOff
      }
    }

  test("sequential ingest: padded fold continues across batches, batch-arithmetic parity, bounded state, replay + restart exact") {
    val dir = Files.createTempDirectory("graft-padded-pack-ingest").toString
    val store = new PaddedPackStore(NShards, Budget, dir)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    def part(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === lit(i))

    val e0 = collectPacked(StreamingPipelines.packPaddedIngestBatch(
      store, part(0), "doc_id", "text", 0L))
    val e1 = collectPacked(StreamingPipelines.packPaddedIngestBatch(
      store, part(1), "doc_id", "text", 1L))
    val e2 = collectPacked(StreamingPipelines.packPaddedIngestBatch(
      store, part(2), "doc_id", "text", 2L))
    assert(e0.nonEmpty && e1.nonEmpty && e2.nonEmpty)

    // the concatenated stream obeys the padded fold ACROSS batch
    // boundaries; the seams must exercise BOTH continuation cases
    assertPaddedLayout(e0 ++ e1 ++ e2, Budget.toLong)
    val laterBatches = e1 ++ e2
    assert(laterBatches.exists(r => r._7 > 0),
      "a later batch must continue mid-sequence (fit in the remainder)")
    assert(laterBatches.exists(r => r._8 > 0),
      "a later batch must pad somewhere (boundary isolation held)")

    // drift-proof arithmetic: batch 0 (state (0,0,0)) IS the batch op
    val batchForm = collectPacked(TextAnalysis.packSequencesPadded(
      part(0), "doc_id", "text", NShards, Budget))
    assert(e0 == batchForm, "batch 0 must equal packSequencesPadded")

    // bounded state: folded triples + last batch's triples only
    val t = store.table(spark)
    assert(t.count() <= 2L * NShards, "state must be <= 2*nShards rows")
    val ids = t.select(col("batch_id")).distinct().as[Long].collect().toSet
    assert(ids.subsetOf(Set(PackStore.FoldedBatch, 2L)),
      s"older state must fold, got batch_ids $ids")

    // at-least-once replay of the last batch: identical emission, no
    // state growth, merge no-op
    val replay = collectPacked(StreamingPipelines.packPaddedIngestBatch(
      store, part(2), "doc_id", "text", 2L))
    assert(replay == e2, "replay must re-emit the identical rows")
    assert(store.table(spark).count() == t.count())

    // restart adoption: a new JVM's store on the same dir continues —
    // a replayed last batch stays exact, and the NEXT batch resumes in
    // the very slot batch 2 ended (mid-sequence included)
    val adopted = new PaddedPackStore(NShards, Budget, dir)
    assert(adopted.isReplay(2L), "adoption must restore the replay guard")
    assert(collectPacked(StreamingPipelines.packPaddedIngestBatch(
      adopted, part(2), "doc_id", "text", 2L)) == e2)
    val extra = Seq((1000003L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val e3 = collectPacked(StreamingPipelines.packPaddedIngestBatch(
      adopted, extra, "doc_id", "text", 3L))
    assert(e3.size == 1)
    assertPaddedLayout(e0 ++ e1 ++ e2 ++ e3, Budget.toLong)
  }

  test("merge refuses sentinel batch ids") {
    val store = new PaddedPackStore(2, 16)
    val st = Seq((0L, 1L, 0L, 5L)).toDF("shard", "n_docs", "next_seq", "next_off")
    intercept[IllegalArgumentException] {
      store.merge(st, VersionedParquetStore.NoBatchId)
    }
  }
}
