package graft.streaming

import graft.SparkSpec
import graft.operators.EmbStore

/** The store-backed incremental near-dup ingest loop on the TEXT side
  * ([[StreamingPipelines.textNearDupIngestBatch]]): sequential RAW-DOC
  * batches are chunked + hash-embedded, probe the persisted chunk
  * bucket/vector tables, drop near-dup DOCS of the accepted corpus
  * (and later batch-internal dups), and ingest only the survivors'
  * chunk vectors — with at-least-once replay a no-op on both tables. */
class TextNearDupIngestSpec extends SparkSpec {
  import spark.implicits._

  // spec-local chunking: 8-token windows, 2-token overlap → a 10-token
  // doc yields chunks at starts 1 and 7. Docs sharing their first 8
  // tokens share chunk 1 verbatim (cosine 1.0 — a near-dup pair at any
  // threshold); docs with disjoint vocabularies hash to near-orthogonal
  // vectors.
  private val CT = 8
  private val CO = 2
  private val Base = 1000L
  private def doc(prefix: String, tail: String): String =
    ((1 to 8).map(i => s"$prefix$i") ++ Seq(s"${tail}9", s"${tail}10"))
      .mkString(" ")

  test("sequential doc ingest: near-dup docs drop across batches, replay is a no-op") {
    val store = new EmbStore("graft_textemb_ingest", buckets = 2)
    def ingest(batchId: Long, docs: (Long, String)*): Set[Long] =
      StreamingPipelines.textNearDupIngestBatch(store,
          docs.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.9,
          chunkTokens = CT, chunkOverlap = CO, vecBase = Base,
          embedDim = 64, batchId = batchId)
        .select("doc_id").as[Long].collect().toSet

    // batch 0: 11 shares doc 10's first chunk (batch-internal near-dup,
    // later id drops); 12 has a disjoint vocabulary and survives. A
    // doc's OWN overlapping chunks must never pair it out (cross-doc
    // filter), or nothing would ever survive.
    val b0 = ingest(0L, 10L -> doc("alpha", "x"), 11L -> doc("alpha", "y"),
      12L -> doc("beta", "x"))
    assert(b0 == Set(10L, 12L), s"got $b0")

    // batch 1: 20 near-dups the ACCEPTED 10 → drops via the store
    // probe; 21 is fresh; 22 near-dups 21 batch-internally → drops
    val b1 = ingest(1L, 20L -> doc("alpha", "z"), 21L -> doc("gamma", "x"),
      22L -> doc("gamma", "y"))
    assert(b1 == Set(21L), s"got $b1")

    // at-least-once replay of batch 1: identical survivor set, and the
    // store tables must not grow (the replay guard covers both tables)
    val vecRows = store.vectorRows(spark).count()
    val b1r = ingest(1L, 20L -> doc("alpha", "z"), 21L -> doc("gamma", "x"),
      22L -> doc("gamma", "y"))
    assert(b1r == Set(21L), s"replay changed the drop set: $b1r")
    assert(store.vectorRows(spark).count() == vecRows,
      "replay must not re-ingest survivor chunks")

    // batch 2: 30 near-dups the batch-1 SURVIVOR 21 (its buckets are
    // live in the store); 31 near-dups the DROPPED 11 only via its
    // surviving canonical 10 — both drop
    val b2 = ingest(2L, 30L -> doc("gamma", "z"), 31L -> doc("alpha", "w"))
    assert(b2 == Set.empty, s"got $b2")

    // the store holds exactly the surviving docs' chunks: 3 docs × 2
    // chunks, ids under the doc*base+idx arithmetic
    val stored = store.vectorRows(spark).select("vec_id").as[Long]
      .collect().toSet
    assert(stored == Set(10L, 12L, 21L)
      .flatMap(d => Set(d * Base, d * Base + 1)), s"got $stored")
  }

  test("doc ingest loop drives from a real stream via foreachBatch") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new EmbStore("graft_textemb_ingest_stream", buckets = 2)
    val accepted = scala.collection.mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = StreamingPipelines.textNearDupIngestBatch(store, batch,
            "doc_id", "text", threshold = 0.9, chunkTokens = CT,
            chunkOverlap = CO, vecBase = Base, embedDim = 64,
            batchId = batchId)
          .select("doc_id").as[Long].collect()
        accepted.synchronized { accepted ++= out }
        ()
      }.start()
    try {
      in.addData(1L -> doc("alpha", "x"), 2L -> doc("beta", "x"))
      q.processAllAvailable()
      in.addData(3L -> doc("alpha", "y")) // near-dup of accepted 1 → dropped
      q.processAllAvailable()
      assert(accepted.synchronized(accepted.toSet) == Set(1L, 2L),
        s"got ${accepted.synchronized(accepted.toSet)}")
    } finally q.stop()
  }
}
