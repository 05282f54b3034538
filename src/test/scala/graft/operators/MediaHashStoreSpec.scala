package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The persisted media-fingerprint path: probing the stored banded
  * hashes must equal the full capped pair search restricted to pairs
  * touching the batch, run zero decode/banding work over the seen
  * side, and stay replay-exact under excludeBatchIds. */
class MediaHashStoreSpec extends SparkSpec {
  import spark.implicits._

  test("store probe ≡ touching-batch restriction; seen side never re-decodes; replay-exact") {
    val docs = Tables.documents(spark, sf)
    def hashesOf(pred: org.apache.spark.sql.Column) =
      Multimodal.imageAHashes(spark,
        Multimodal.syntheticPngAssets(spark, docs.filter(pred))).toDF()

    val store = new MediaHashStore("graft_media_store_spec")
    store.ingest(hashesOf(col("doc_id") % 5 =!= 0), batchId = 0L)
    val batchHashes = hashesOf(col("doc_id") % 5 === 0)

    val probeDf = store.probe(batchHashes)
    // Plan pin: the seen side is the persisted banded table — no image
    // decode (mapPartitions over assets) and no banding explode may
    // appear above the stored scan; the only SerializeFromObject (the
    // decode seam) belongs to the BATCH side's hash computation.
    val p = probeDf.queryExecution.executedPlan.toString
    assert(p.contains("graft_media_store_spec"),
      s"probe must scan the persisted fingerprint table:\n$p")
    assert("SerializeFromObject".r.findAllIn(p).size <= 1,
      s"only the batch side may run the decode seam:\n$p")

    val got = probeDf.as[(Long, Long, Long)].collect().toSet
    // reference: full self-dedup over ALL hashes, restricted to pairs
    // touching the batch
    val all = Multimodal.imageHammingPairs(hashesOf(lit(true)))
      .as[(Long, Long, Long)].collect().toSet
    val want = all.filter(t => t._1 % 5 == 0 || t._2 % 5 == 0)
    assert(got == want, s"probe drifted: ${got.size} vs ${want.size} pairs")
    assert(got.nonEmpty, "fixture must produce touching-batch pairs")

    // replay: after the batch merges, excludeBatchIds restores the
    // original probe input and output
    store.ingest(batchHashes, batchId = 1L)
    val replay = store.probe(batchHashes, excludeBatchIds = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(replay == got, "replayed probe must equal the original run")
  }
}
