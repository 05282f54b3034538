package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.streaming.FilePointer
import org.apache.spark.sql.functions._

/** Incremental duplicated-span detection: the batch's spans against
  * seen ∪ batch must equal the FULL-corpus detector restricted to
  * batch ids — recompute form, store-backed probe (zero seen-side
  * window work, pinned), restart adoption, and replay-exact
  * `excludeBatchIds` semantics. */
class IncrementalSpanSpec extends SparkSpec {
  import spark.implicits._

  private def spanSet(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long)].collect().toSet

  private def split(mod: Int) = {
    val docs = Tables.documents(spark, sf)
    (docs.filter(col("doc_id") % mod === 0),
      docs.filter(col("doc_id") % mod =!= 0))
  }

  test("incremental ≡ full-corpus spans restricted to batch ids (real corpus)") {
    val (batch, seen) = split(5)
    val got = spanSet(Dedup.incrementalDuplicateSpansFrom(
      batch, Dedup.spanGrams(seen, "doc_id", "text"), "doc_id", "text"))
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    val want = spanSet(Dedup.duplicateSpans(
      Tables.documents(spark, sf), "doc_id", "text"))
      .filter(s => batchIds(s._1))
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty, "testdata should contain spans touching the batch")
  }

  test("cross-batch-only and batch-internal-only duplications both detected") {
    val boiler = (1 to 9).map(i => s"b$i").mkString(" ") // 9 tokens >= k=8
    val intern = (1 to 8).map(i => s"i$i").mkString(" ")
    def pad(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val seen = Seq((10L, s"${pad("s", 20)} $boiler")).toDF("doc_id", "text")
    val batch = Seq(
      // span duplicated ONLY against the seen corpus (once in batch)
      (1L, s"$boiler ${pad("x", 20)}"),
      // span duplicated ONLY within the batch (absent from seen)
      (2L, s"${pad("y", 20)} $intern"),
      (3L, s"$intern ${pad("z", 20)}"),
      // no duplication at all
      (4L, pad("w", 30))).toDF("doc_id", "text")
    val got = spanSet(Dedup.incrementalDuplicateSpansFrom(
      batch, Dedup.spanGrams(seen, "doc_id", "text"), "doc_id", "text"))
    val want = Set((1L, 0L, 9L), (2L, 20L, 8L), (3L, 0L, 8L))
    assert(got == want, s"got $got want $want")
  }

  test("store probe ≡ recompute form; zero window/hash work over the seen side") {
    val (batch, seen) = split(5)
    val store = new GramStore("graft_gram_store_spec")
    store.ingest(seen, "doc_id", "text")
    val probe = store.probe(batch, "doc_id", "text")
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("graft_gram_store_spec"),
      s"probe must scan the persisted gram table:\n$p")
    // the ONLY window/md5 stage allowed is the batch side's, and that
    // lives behind its lazy localCheckpoint (LogicalRDD) — nothing in
    // the visible plan may recompute grams
    assert(!p.contains("graft_shingles") && !p.contains("md5("),
      s"no windowing/hash stage may run above the stored scan:\n$p")
    val got = spanSet(probe)
    val want = spanSet(Dedup.incrementalDuplicateSpansFrom(
      batch, Dedup.spanGrams(seen, "doc_id", "text"), "doc_id", "text"))
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty)
  }

  test("restart adopts the persisted table; replay probe stays exact via excludeBatchIds") {
    val dir = Files.createTempDirectory("gramstore")
    val ptr = dir.resolve("grams.ptr")
    val (batch, seen) = split(5)
    val first = new GramStore("graft_gram_store_restart",
      pointer = new FilePointer(ptr))
    first.ingest(seen, "doc_id", "text", batchId = 1L)
    val want = spanSet(first.probe(batch, "doc_id", "text"))

    // a NEW instance over the same pointer file (new JVM in prod) must
    // read the same table and produce the same probe
    val adopted = new GramStore("graft_gram_store_restart",
      pointer = new FilePointer(ptr))
    assert(spanSet(adopted.probe(batch, "doc_id", "text")) == want,
      "restart must adopt the persisted gram table")
    // ...and its replay guard must survive the restart
    assert(adopted.isReplay(1L), "lastBatch must persist across restart")

    // ingest-loop shape: after the batch itself is merged, a replayed
    // probe WITHOUT exclusion would see its own grams as 'seen' and
    // mark every window; excludeBatchIds restores the original output
    adopted.ingest(batch, "doc_id", "text", batchId = 2L)
    val replay = spanSet(adopted.probe(batch, "doc_id", "text",
      excludeBatchIds = true))
    assert(replay == want,
      s"replay probe must equal the original: extra=${replay -- want} missing=${want -- replay}")
    val polluted = spanSet(adopted.probe(batch, "doc_id", "text"))
    assert(polluted != want,
      "control: without exclusion the replayed batch self-matches (if this " +
        "starts passing the exclusion test proves nothing)")
  }
}
