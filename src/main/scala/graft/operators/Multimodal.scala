package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/
  * video travel as opaque `binary` columns plus typed metadata; decode /
  * feature-extraction runs batched per partition at a single well-marked
  * seam.
  *
  * The Spark-side contract here is real and tested — schema, batch
  * shape, partitioning, determinism. The actual codec (libvips/ffmpeg
  * via JNI, or a Python worker over Arrow batches — the Scala analog of
  * a Pandas `mapInPandas` UDF) is NOT available in this container, so
  * `RealDecoder` is a clearly-marked stub and tests run against the
  * deterministic `FakeDecoder`.
  *
  * Scale notes: assets are large blobs — `spark.sql.files.
  * maxPartitionBytes` bounds scan partitions; decode is CPU-bound, so
  * `repartition(n)` before `featurize` controls decode parallelism
  * independently of scan layout; features (small fixed-width vectors)
  * are what shuffles downstream, never the bytes.
  */
object Multimodal {

  // Fixture + pipeline knobs, shared with the generated DuckDB oracles
  // (packs/TextOps interpolates these — the Dedup.Ngram* pattern): a
  // fixture tweak propagates to the SQL through the one constant
  // instead of silently breaking the gate via a stale literal.
  val FixtureWidth = 640
  val FixtureHeight = 480
  val FixtureSampleRate = 16000
  val MsPerChar = 10L
  val FrameSamples = 4
  val ResizeMaxEdge = 256

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int,
      durationMs: Long)

  final case class MediaAsset(asset_id: Long, kind: String,
      bytes: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(asset_id: Long, kind: String,
      n_bytes: Long, fingerprint: Long, embedding: Array[Float])

  /** Decoder seam — one batched call per asset; implementations must be
    * Serializable (shipped to executors). */
  trait MediaDecoder extends Serializable {
    def decode(asset: MediaAsset): MediaFeatures
  }

  /** Deterministic stand-in: features derived from a rolling hash of the
    * bytes. Same plumbing, batch shape and schema as a real codec.
    *
    * The hash is the mod-1e9+7 fold over unsigned bytes (first byte
    * seeds the accumulator — list_reduce semantics), the same shape as
    * the doc_fingerprint oracle, so multimodal_features gets a full
    * cross-engine DuckDB oracle instead of a rows-only check. */
  object FakeDecoder extends MediaDecoder {
    override def decode(a: MediaAsset): MediaFeatures = {
      val n = a.bytes.length
      var h = 0L
      if (n > 0) {
        h = (a.bytes(0) & 0xff).toLong
        var i = 1
        while (i < n) { h = (31 * h + (a.bytes(i) & 0xff)) % 1000000007L; i += 1 }
      }
      val emb = Array.tabulate(8) { d =>
        // spread the hash into 8 deterministic floats in [-1, 1]; the
        // (d+1) factor keeps dimension 0 mixed too (h < 2^30 after the
        // mod, so xor-ing with 0 would pin dim 0 near -1 for every asset)
        (((h ^ ((d + 1) * 0x9e3779b97f4a7c15L)) >>> 11).toDouble /
          (1L << 53).toDouble * 2 - 1).toFloat
      }
      MediaFeatures(a.asset_id, a.kind, a.bytes.length.toLong, h, emb)
    }
  }

  /** Real codec stub — requires image/audio native libs absent from this
    * container. Plug point documented; do not call in tests. */
  object RealDecoder extends MediaDecoder {
    override def decode(a: MediaAsset): MediaFeatures =
      ??? // JNI/FFI call into libvips (image) / ffmpeg (audio/video)
  }

  /** Batched per-partition feature extraction over the decoder seam. */
  def featurize(spark: SparkSession, assets: Dataset[MediaAsset],
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.mapPartitions(_.map(decoder.decode))
  }

  /** Frame-sample plan for video assets: evenly spaced sample
    * timestamps (ms) across the clip — the Column-level plumbing a real
    * frame extractor consumes (decode happens at the MediaDecoder seam;
    * this keeps WHICH frames to pull declarative and pushdown-friendly). */
  def frameOffsetsMs(durationMs: org.apache.spark.sql.Column,
      frames: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(frames - 1)),
      i => (i * durationMs / frames).cast("long"))

  /** Target-size metadata for a resize stage: preserves aspect ratio
    * against a max edge; pure metadata math, the decoder does the pixels. */
  def resizeMeta(width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column, maxEdge: Int): org.apache.spark.sql.Column = {
    val scale = least(lit(1.0),
      lit(maxEdge.toDouble) / greatest(width, height).cast("double"))
    struct(
      round(width * scale).cast("int").as("target_width"),
      round(height * scale).cast("int").as("target_height"))
  }

  /** Deterministic media synthesis from the documents table (no binary
    * testdata exists): bytes = utf-8 text, kind cycles by id. */
  def syntheticAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "utf-8").as("bytes"),
        struct(lit(FixtureWidth).as("width"), lit(FixtureHeight).as("height"),
          lit(FixtureSampleRate).as("sampleRate"),
          (length(col("text")) * MsPerChar).cast("long").as("durationMs")).as("meta"))
      .as[MediaAsset]
  }
}
