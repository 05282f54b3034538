package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Paragraph-granular dedup ([[Paragraphs]]): keep-first verdicts over
  * normalized units, order-preserving reassembly, and the
  * [[ParagraphStore]] ordered-batch equivalence + replay contracts. */
class ParagraphsSpec extends SparkSpec {
  import spark.implicits._

  test("delimiter units: repeated paragraph dropped downstream, kept at first occurrence; blanks vanish") {
    val docs = Seq(
      (1L, "All rights reserved.\nAlpha beta gamma.\n\nDelta epsilon."),
      (2L, "Zeta eta theta.\nAll rights reserved."),
      // normalization collapses case/punct variants onto one key
      (3L, "ALL RIGHTS, RESERVED!!\nIota kappa."))
      .toDF("doc_id", "text")
    val units = Paragraphs.unitsByDelimiter(docs, "doc_id", "text")
    // the blank line is a separator, not a unit
    assert(units.filter(col("doc_id") === 1L).count() == 3)
    val v = Paragraphs.verdictsOfUnits(units)
      .select("doc_id", "par_idx", "keep")
      .as[(Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(v((1L, 0L)), "first occurrence keeps")
    assert(!v((2L, 1L)), "verbatim repeat drops")
    assert(!v((3L, 0L)), "case/punct variant shares the normalized key and drops")
    assert(v((2L, 0L)) && v((3L, 1L)), "host content survives")

    val out = Paragraphs.scrubOfUnits(docs, "doc_id",
        Paragraphs.verdictsOfUnits(units), sep = "\n")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 1 intact (minus the structural blank), doc 2 loses only the
    // boilerplate, doc 3's variant is gone but its content stays
    assert(out(1L) == (("All rights reserved.\nAlpha beta gamma.\nDelta epsilon.", 3L, 0L)))
    assert(out(2L) == (("Zeta eta theta.", 1L, 1L)))
    assert(out(3L) == (("Iota kappa.", 1L, 1L)))
  }

  test("window units: an exact-dup doc scrubs to empty; the keeper is untouched") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq((10L, base), (20L, base), (30L, "fresh words only here"))
      .toDF("doc_id", "text")
    val out = Paragraphs.scrubByWindow(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(10L) == ((base, 3L, 0L)), "keeper reassembles verbatim")
    assert(out(20L) == (("", 0L, 3L)), "full dup scrubs to empty text")
    assert(out(30L)._2 == 1L && out(30L)._3 == 0L)
  }

  test("ParagraphStore: ordered batches == one-shot; probe is read-only; replay-exact") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val batch0 = docs.filter(col("doc_id") < 250L)
    val batch1 = docs.filter(col("doc_id") >= 250L)
    val store = new ParagraphStore(s"par_spec_${System.nanoTime()}")

    val out0 = store.scrubProbe(batch0, "doc_id", "text")
    // empty store: the probe is pure within-batch dedup
    assert(out0.as[(Long, String, Long, Long)].collect().toSet ==
      Paragraphs.scrubByWindow(batch0, "doc_id", "text")
        .as[(Long, String, Long, Long)].collect().toSet)
    store.ingest(batch0, "doc_id", "text", batchId = 0L)
    val out1 = store.scrubProbe(batch1, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSet
    store.ingest(batch1, "doc_id", "text", batchId = 1L)

    // ordered-split equivalence: the two-batch union IS the one-shot
    val oneShot = Paragraphs.scrubByWindow(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSet
    val streamed = Paragraphs.scrubByWindow(batch0, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSet ++ out1
    assert(streamed == oneShot,
      "ordered batches through the store must equal the one-shot scrub")

    // at-least-once replay of batch 1: its own merged keys would mark
    // every batch-1 unit seen — excludeBatchIds restores the original
    // probe input exactly
    val replayMerge = store.table(spark).count()
    store.ingest(batch1, "doc_id", "text", batchId = 1L) // no-op merge
    assert(store.table(spark).count() == replayMerge,
      "replayed merge must not grow the store")
    val replay = store.scrubProbe(batch1, "doc_id", "text",
        excludeBatchIds = true)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(replay == out1, "replay with excludeBatchIds re-emits exactly")
  }

  test("paragraphIngestBatch: ordered stream == one-shot; replay lazy and exact") {
    import graft.streaming.StreamingPipelines
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val batch0 = docs.filter(col("doc_id") < 250L)
    val batch1 = docs.filter(col("doc_id") >= 250L)
    val store = new ParagraphStore(s"par_ingest_${System.nanoTime()}")

    val out0 = StreamingPipelines
      .paragraphIngestBatch(store, batch0, "doc_id", "text", batchId = 0L)
      .as[(Long, String, Long, Long)].collect().toSet
    val out1 = StreamingPipelines
      .paragraphIngestBatch(store, batch1, "doc_id", "text", batchId = 1L)
      .as[(Long, String, Long, Long)].collect().toSet
    val oneShot = Paragraphs.scrubByWindow(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out0 ++ out1 == oneShot,
      "ordered ingest batches must emit the one-shot scrub row-for-row")

    // at-least-once replay of batch 1 AFTER its merge: identical rows,
    // no store growth (excludeBatchIds restores the probe input)
    val rows = store.table(spark).count()
    val replay = StreamingPipelines
      .paragraphIngestBatch(store, batch1, "doc_id", "text", batchId = 1L)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(replay == out1)
    assert(store.table(spark).count() == rows,
      "replayed merge must not grow the store")
  }

  test("window scrub preserves token order across kept windows") {
    // windows 0 and 2 unique, window 1 duplicated from another doc:
    // reassembly must stitch 0 then 2, never sort by content
    val w = Paragraphs.WindowTokens
    val mid = (1 to w).map(i => s"dup$i").mkString(" ")
    val head = (1 to w).map(i => s"zz$i").mkString(" ")
    val tail = (1 to w).map(i => s"aa$i").mkString(" ")
    val docs = Seq((1L, mid), (2L, s"$head $mid $tail"))
      .toDF("doc_id", "text")
    val out = Paragraphs.scrubByWindow(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(2L) == ((s"$head $tail", 2L, 1L)),
      "kept windows must reassemble in par_idx order (zz before aa)")
  }
}
