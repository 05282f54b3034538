package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Dedup

/** Golden trace for streaming SimHash near-dup detection: exact-once
  * pair emission (min-matching-band rule), cross-batch pairing inside
  * the watermark horizon, eviction beyond it, and streaming ≡ batch
  * on the in-horizon document set. */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog tonight"
  private val textB = "completely different words about spark query engines"

  test("streaming simhash near-dups: exact-once pairs, horizon eviction, batch parity") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = NearDupStream
      .simhashNearDups(in.toDF.toDF("doc_id", "ts", "text"),
        "doc_id", "ts", "text", watermark = "60 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out")
      .start()

    def ts(s: Long) = new Timestamp(s * 1000)
    def pairs(): Seq[(Long, Long, Int)] =
      spark.table("neardup_out").as[(Long, Long, Int)].collect().toSeq

    try {
      // batch 1: exact dup pair (1,2) — collides in ALL 4 bands, the
      // min-band rule must still emit it exactly once; 3 is unrelated
      in.addData((1L, ts(100), textA), (2L, ts(105), textA), (3L, ts(110), textB))
      q.processAllAvailable()
      assert(pairs().sorted == Seq((1L, 2L, 0)), s"got ${pairs()}")

      // batch 2, inside the horizon: 4 pairs with both 1 and 2
      in.addData((4L, ts(120), textA))
      q.processAllAvailable()
      assert(pairs().sorted == Seq((1L, 2L, 0), (1L, 4L, 0), (2L, 4L, 0)),
        s"got ${pairs()}")

      // streaming == batch simhashPairs on the same in-horizon docs
      val batch = Dedup.simhashPairs(
          Seq((1L, textA), (2L, textA), (3L, textB), (4L, textA))
            .toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Long, Long)].collect()
        .map(p => (p._1, p._2, p._3.toInt)).toSeq.sorted
      assert(pairs().sorted == batch)

      // advance the watermark far past docs 1-4 (two sentinel batches;
      // unique texts so the sentinels pair with nothing)
      in.addData((90L, ts(5000), "sentinel zeta eta theta iota kappa lambda mu nu xi"))
      q.processAllAvailable()
      in.addData((91L, ts(9000), "omicron pi rho sigma tau upsilon phi chi psi omega"))
      q.processAllAvailable()

      // 5 is a dup of evicted docs — no new pair may reference them
      in.addData((5L, ts(9100), textA))
      q.processAllAvailable()
      assert(pairs().sorted == Seq((1L, 2L, 0), (1L, 4L, 0), (2L, 4L, 0)),
        s"evicted docs must not pair: ${pairs()}")

      // but a fresh in-horizon dup of 5 pairs with it
      in.addData((6L, ts(9110), textA))
      q.processAllAvailable()
      assert(pairs().sorted.contains((5L, 6L, 0)))
    } finally q.stop()
  }

  test("streaming minhash near-dups: verified jaccard, exact-once, eviction, batch parity") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val textA2 = "the quick brown fox jumps over the lazy dog today" // near-dup of textA
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = NearDupStream
      .minhashNearDups(in.toDF.toDF("doc_id", "ts", "text"),
        "doc_id", "ts", "text", watermark = "60 seconds", threshold = 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_mh_out")
      .start()

    def ts(s: Long) = new Timestamp(s * 1000)
    def pairs(): Seq[(Long, Long, Double)] =
      spark.table("neardup_mh_out").as[(Long, Long, Double)].collect().toSeq

    try {
      // batch 1: exact dup pair (1,2) collides in ALL 8 bands — the
      // min-matching-band rule must emit exactly once; 3 is unrelated
      in.addData((1L, ts(100), textA), (2L, ts(105), textA), (3L, ts(110), textB))
      q.processAllAvailable()
      assert(pairs().sorted == Seq((1L, 2L, 1.0)), s"got ${pairs()}")

      // batch 2, inside the horizon: 4 is a NEAR-dup (one shingle off)
      // of both 1 and 2 — verified jaccard must ride along
      in.addData((4L, ts(120), textA2))
      q.processAllAvailable()
      val expectJac = 7.0 / 9.0 // 8 shingles each, 7 shared
      assert(pairs().sorted == Seq((1L, 2L, 1.0), (1L, 4L, expectJac), (2L, 4L, expectJac)),
        s"got ${pairs()}")

      // streaming == batch minhashLsh on the same in-horizon docs
      val batch = Dedup.minhashLsh(
          Seq((1L, textA), (2L, textA), (3L, textB), (4L, textA2))
            .toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(pairs().sorted == batch, s"stream ${pairs().sorted} vs batch $batch")

      // advance the watermark far past docs 1-4
      in.addData((90L, ts(5000), "sentinel zeta eta theta iota kappa lambda mu nu xi"))
      q.processAllAvailable()
      in.addData((91L, ts(9000), "omicron pi rho sigma tau upsilon phi chi psi omega"))
      q.processAllAvailable()

      // 5 is a dup of evicted docs — no new pair may reference them
      in.addData((5L, ts(9100), textA))
      q.processAllAvailable()
      assert(!pairs().exists(p => p._2 == 5L), s"evicted docs must not pair: ${pairs()}")

      // but a fresh in-horizon dup of 5 pairs with it
      in.addData((6L, ts(9110), textA))
      q.processAllAvailable()
      assert(pairs().contains((5L, 6L, 1.0)))
    } finally q.stop()
  }
}
