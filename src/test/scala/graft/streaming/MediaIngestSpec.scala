package graft.streaming

import graft.SparkSpec
import graft.operators.{MediaHashStore, Multimodal}

/** The media dedup-at-ingest loop: cross-batch near-dup assets drop
  * against the accumulated fingerprint corpus, batch-internal pairs
  * drop the later id, and an at-least-once replay re-emits the same
  * survivors without growing the store. */
class MediaIngestSpec extends SparkSpec {
  import spark.implicits._

  private def png(seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = (x * 30 + seed) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hashesOf(assets: (Long, Array[Byte])*) =
    Multimodal.imageAHashes(spark, assets.map { case (id, b) =>
      Multimodal.MediaAsset(id, "image", b, Multimodal.MediaMeta(8, 8, 0, 0L))
    }.toDS()).toDF()

  test("cross-batch drop, batch-internal later-id drop, replay no-growth") {
    val store = new MediaHashStore("graft_media_store_ingest", buckets = 4)

    def ingest(batchId: Long, assets: (Long, Array[Byte])*): Set[Long] =
      StreamingPipelines.mediaDedupIngestBatch(store, hashesOf(assets: _*),
          batchId = batchId)
        .select("asset_id").as[Long].collect().toSet

    // batch 0: two distinct images (different aHash) both survive;
    // 11 and 12 share identical bytes → 12 (later id) drops in-batch
    val b0 = ingest(0L, 10L -> png(0), 11L -> png(128), 12L -> png(128))
    assert(b0 == Set(10L, 11L), s"got $b0")

    // batch 1: 20 duplicates the ACCEPTED 10 → dropped via the store;
    // 21 is new → survives
    val b1 = ingest(1L, 20L -> png(0), 21L -> png(64))
    assert(b1 == Set(21L), s"got $b1")

    // replay batch 1: identical survivors, store unchanged
    val rows = store.table(spark).count()
    val segs = store.liveSegments
    val replay = ingest(1L, 20L -> png(0), 21L -> png(64))
    assert(replay == b1, s"replay drifted: $replay")
    assert(store.table(spark).count() == rows && store.liveSegments == segs,
      "replay must not grow the store")
  }
}
