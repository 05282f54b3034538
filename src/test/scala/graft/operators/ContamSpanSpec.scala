package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Span-granular decontamination: benchmark-overlapping token ranges
  * are reported as maximal spans and stripped while the document is
  * KEPT — planted-phrase geometry, island merging across nearby hits,
  * store-probe equivalence, and strip exactness. */
class ContamSpanSpec extends SparkSpec {
  import spark.implicits._

  private val N = 3 // shingle width under test (the registered queries' n)

  private def pad(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")

  // a 5-token benchmark phrase quoted mid-document
  private val phrase = "alpha beta gamma delta epsilon"
  private val bench = Seq((100L, s"${pad("q", 4)} $phrase")).toDF("doc_id", "text")

  private def spans(docs: org.apache.spark.sql.DataFrame) =
    TextAnalysis.contaminationSpans(docs, bench, "doc_id", "text", N)
      .as[(Long, Long, Long)].collect().toSet

  test("a quoted benchmark phrase becomes ONE maximal span covering it") {
    // tokens 0-9 padding, 10-14 the phrase, 15-24 padding: 3-gram hits
    // at positions 10,11,12 merge into span_start=10, span_tokens=5
    val docs = Seq((1L, s"${pad("a", 10)} $phrase ${pad("b", 10)}"))
      .toDF("doc_id", "text")
    assert(spans(docs) == Set((1L, 10L, 5L)))
  }

  test("hits more than n apart stay separate islands; nearer merge") {
    // phrase at 0-4 and again at 0-4+gap; island rule merges window
    // positions <= n apart, so a 1-token gap between phrase copies
    // (windows at 2 and 6: 4 > 3) still splits... use explicit layouts
    val far = Seq((2L, s"$phrase ${pad("m", 10)} $phrase")).toDF("doc_id", "text")
    assert(spans(far) == Set((2L, 0L, 5L), (2L, 15L, 5L)))
    // adjacent copies: windows 0,1,2 then 5,6,7 — gap 3 <= n, ONE span
    val near = Seq((3L, s"$phrase $phrase")).toDF("doc_id", "text")
    assert(spans(near) == Set((3L, 0L, 10L)))
  }

  test("uncontaminated docs emit no spans; sub-n overlaps don't fire") {
    // only 2 consecutive shared tokens — below the 3-gram probe
    val docs = Seq(
      (4L, pad("clean", 12)),
      (5L, s"${pad("c", 6)} alpha beta ${pad("d", 6)}")).toDF("doc_id", "text")
    assert(spans(docs).isEmpty)
  }

  test("store probe == inline spans (the decontaminate_spans_store seam)") {
    val docs = Seq(
      (1L, s"${pad("a", 10)} $phrase ${pad("b", 10)}"),
      (2L, s"$phrase ${pad("m", 10)} $phrase"),
      (4L, pad("clean", 12))).toDF("doc_id", "text")
    val store = new BenchmarkStore(s"contam_span_spec_${System.nanoTime()}", N)
    store.ingest(bench, "text")
    val got = TextAnalysis.contaminationSpansFrom(docs, store.table(spark),
      "doc_id", "text", N).as[(Long, Long, Long)].collect().toSet
    assert(got == spans(docs))
  }

  test("strip removes exactly the span tokens and keeps the document") {
    val docs = Seq(
      (1L, s"${pad("a", 3)} $phrase ${pad("b", 2)}"),
      (4L, pad("clean", 5))).toDF("doc_id", "text")
    val got = Dedup.stripSpans(docs,
        TextAnalysis.contaminationSpans(docs, bench, "doc_id", "text", N),
        "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map { case (id, t, n) => id -> ((t, n)) }.toMap
    assert(got(1L) == ((s"${pad("a", 3)} ${pad("b", 2)}", 5L)))
    assert(got(4L) == ((pad("clean", 5), 0L)))
  }

  test("streaming scrub stage == batch strip restricted to the batch") {
    val docs = Seq(
      (1L, s"${pad("a", 3)} $phrase ${pad("b", 2)}"),
      (2L, s"$phrase ${pad("m", 10)} $phrase"),
      (4L, pad("clean", 5))).toDF("doc_id", "text")
    val store = new BenchmarkStore(s"contam_strip_stream_${System.nanoTime()}", N)
    store.ingest(bench, "text")
    def strip(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamingPipelines
        .decontaminateStripBatch(store, df, "doc_id", "text")
        .as[(Long, String, Long)].collect().toSet
    val whole = strip(docs)
    val batched = strip(docs.filter(col("doc_id") < 2L)) ++
      strip(docs.filter(col("doc_id") >= 2L))
    assert(batched == whole, "the scrub is per-document — any batch split agrees")
    assert(whole.exists(_._3 > 0) && whole.exists(_._3 == 0))
  }

  test("every doc with a span is flagged by the doc-level probe") {
    val docs = Seq(
      (1L, s"${pad("a", 10)} $phrase ${pad("b", 10)}"),
      (4L, pad("clean", 12))).toDF("doc_id", "text")
    val flagged = TextAnalysis.contamination(docs, bench, "doc_id", "text", N)
      .filter(col("flagged")).select("doc_id").as[Long].collect().toSet
    val withSpans = spans(docs).map(_._1)
    assert(withSpans.subsetOf(flagged) && withSpans == Set(1L))
  }
}
