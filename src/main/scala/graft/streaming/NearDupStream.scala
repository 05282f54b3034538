package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{MinhashBands, SimHash64, WordShingles}

/** Streaming near-duplicate detection — the streaming forms of
  * `Dedup.simhashPairs` (hamming fingerprints) and `Dedup.minhashLsh`
  * (verified-Jaccard LSH), for dedup-at-ingest in a training-data
  * pipeline (drop near-dups as documents arrive instead of re-scanning
  * the corpus).
  *
  * Plan shape: scan-side [[SimHash64]] fingerprint (zero-shuffle
  * projection) → explode into 4 sixteen-bit bands → ONE shuffle on the
  * band bucket → `flatMapGroupsWithState` holding the bucket's recent
  * fingerprints. State is per-bucket and watermark-evicted, so memory
  * is bounded by the arrival rate × watermark horizon, never corpus
  * size; fingerprints (8 bytes) are all that's stored — never text.
  *
  * Exactly-once pair emission without a second stateful operator: a
  * hamming-≤k pair collides in every matching band, so each candidate
  * is emitted only by the bucket whose band index equals the pair's
  * MINIMUM matching band — a pure function of the two fingerprints,
  * computable locally in whichever bucket sees the pair.
  *
  * Semantic bound (documented streaming tradeoff): two documents pair
  * only if the earlier one is still within the watermark horizon when
  * the later arrives. Batch `simhashPairs` is the unbounded-horizon
  * reference; NearDupStreamSpec pins streaming ≡ batch inside the
  * horizon and eviction beyond it.
  */
object NearDupStream {

  private val Bands = 4

  final case class BandedDoc(bucket: Long, docId: Long, simhash: Long,
      ts: java.sql.Timestamp) {
    def tsMs: Long = ts.getTime
  }
  /** State entry — slim on purpose: no bucket (it's the group key), no
    * Timestamp object; per stored doc the state carries 24 bytes. */
  final case class StoredDoc(docId: Long, simhash: Long, tsMs: Long)
  final case class Pair(doc_a: Long, doc_b: Long, hamming: Int)

  private def bandVal(h: Long, j: Int): Long = (h >>> (j * 16)) & 0xFFFFL

  /** Lowest band index where the two fingerprints agree (-1 if none). */
  private def minMatchingBand(a: Long, b: Long): Int = {
    var j = 0
    while (j < Bands) {
      if (bandVal(a, j) == bandVal(b, j)) return j
      j += 1
    }
    -1
  }

  private def process(maxHamming: Int)(
      bucket: Long,
      rows: Iterator[BandedDoc],
      state: GroupState[List[StoredDoc]]): Iterator[Pair] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val wm = state.getCurrentWatermarkMs()
    var stored = state.getOption.getOrElse(Nil).filter(_.tsMs >= wm)
    val out = List.newBuilder[Pair]
    val band = (bucket >>> 16).toInt
    // deterministic order within the batch (state arrival order)
    rows.toArray.sortBy(d => (d.tsMs, d.docId)).foreach { d =>
      stored.foreach { s =>
        if (s.docId != d.docId) {
          val h = java.lang.Long.bitCount(s.simhash ^ d.simhash)
          if (h <= maxHamming && minMatchingBand(s.simhash, d.simhash) == band)
            out += Pair(math.min(s.docId, d.docId), math.max(s.docId, d.docId), h)
        }
      }
      stored ::= StoredDoc(d.docId, d.simhash, d.tsMs)
    }
    if (stored.isEmpty) state.remove()
    else {
      state.update(stored)
      // clean the bucket up once the watermark passes its newest doc
      state.setTimeoutTimestamp(stored.map(_.tsMs).max + 1)
    }
    out.result().iterator
  }

  /** `docs` must carry (idCol: integral, tsCol: timestamp, textCol:
    * string); returns append-mode (doc_a, doc_b, hamming) pairs. */
  def simhashNearDups(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      watermark: String = "60 seconds",
      maxHamming: Int = 3): Dataset[Pair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bandCols = (0 until Bands).map { j =>
      lit(j.toLong) * 65536L +
        shiftright(col("simhash"), j * 16).bitwiseAND(0xFFFFL)
    }
    docs
      // rows with a null id/time/text can't fingerprint — drop them
      // instead of crashing the non-nullable encoder mid-batch
      .filter(col(idCol).isNotNull && col(tsCol).isNotNull &&
        col(textCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .select(
        col(idCol).cast("long").as("docId"),
        // the watermark tag rides on this column — it must survive into
        // the stateful operator for EventTimeTimeout to be legal
        col(tsCol).as("ts"),
        SimHash64(col(textCol)).as("simhash"))
      .select(col("docId"), col("ts"), col("simhash"),
        explode(array(bandCols: _*)).as("bucket"))
      .as[BandedDoc]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(maxHamming))
  }

  // ---- MinHash-LSH streaming form ---------------------------------
  //
  // Same topology as the SimHash form — scan-side fingerprinting
  // (fused native MinhashBands: shingle-hash → k minima → band keys),
  // explode into `bands` buckets, ONE shuffle on (band, band_key),
  // watermark-evicted per-bucket state — but candidates are VERIFIED
  // with the exact shingle Jaccard before emission, matching the batch
  // operator's semantics. That verification is why state carries each
  // doc's shingle array (×bands buckets): the memory price of
  // verified single-shuffle pairs. `maxBucketSize` bounds degenerate
  // (boilerplate) buckets by evicting the oldest entries — the
  // streaming analog of the batch bucket cap (which drops oversized
  // buckets whole); precision/recall knob, documented tradeoff.
  //
  // Exactly-once without a dedup operator: a pair whose signatures
  // agree in several bands collides in several buckets, but band keys
  // are part of the stored state, so every bucket can compute the
  // pair's MINIMUM matching band locally and only the bucket whose
  // band index equals it emits.

  final case class MinhashBandedDoc(docId: Long, ts: java.sql.Timestamp,
      sh: Seq[String], bandKeys: Seq[Long], band: Int, bandKey: Long)
  final case class StoredMinhashDoc(docId: Long, tsMs: Long,
      bandKeys: Seq[Long], sh: Seq[String])
  final case class JacPair(doc_a: Long, doc_b: Long, jac: Double)

  /** Lowest band index where the two band-key arrays agree (-1 if none). */
  private def minMatchingKeyBand(a: Seq[Long], b: Seq[Long]): Int = {
    val n = math.min(a.length, b.length)
    var j = 0
    while (j < n) {
      if (a(j) == b(j)) return j
      j += 1
    }
    -1
  }

  /** Exact distinct-set Jaccard — the same semantics as the batch
    * verifier (graft.functions.JaccardSimilarity): 0.0 on empty union. */
  private def jaccardDistinct(a: Seq[String], b: Seq[String]): Double = {
    val sa = a.toSet
    val sb = b.toSet
    val union = sa.union(sb).size
    if (union == 0) 0.0 else sa.intersect(sb).size.toDouble / union
  }

  private def processMinhash(threshold: Double, maxBucketSize: Int)(
      key: (Int, Long),
      rows: Iterator[MinhashBandedDoc],
      state: GroupState[List[StoredMinhashDoc]]): Iterator[JacPair] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val wm = state.getCurrentWatermarkMs()
    var stored = state.getOption.getOrElse(Nil).filter(_.tsMs >= wm)
    val out = List.newBuilder[JacPair]
    val band = key._1
    // deterministic order within the batch (state arrival order)
    rows.toArray.sortBy(d => (d.ts.getTime, d.docId)).foreach { d =>
      stored.foreach { s =>
        if (s.docId != d.docId &&
            minMatchingKeyBand(s.bandKeys, d.bandKeys) == band) {
          val jac = jaccardDistinct(s.sh, d.sh)
          if (jac >= threshold)
            out += JacPair(math.min(s.docId, d.docId),
              math.max(s.docId, d.docId), jac)
        }
      }
      stored ::= StoredMinhashDoc(d.docId, d.ts.getTime, d.bandKeys, d.sh)
      // Newest-first list: cap overflow drops the oldest. Interaction
      // with the min-band exactly-once rule (documented recall bound):
      // if THIS bucket is a pair's minimum matching band and evicts the
      // earlier doc, higher-band buckets still co-holding the pair
      // suppress it (their band != min) — eviction cannot be observed
      // across buckets, so the pair is missed, not emitted twice. That
      // only happens when the min-band bucket is degenerate (> cap),
      // where the batch twin drops the WHOLE bucket: streaming recall
      // under cap pressure is bounded below by batch-with-dropped-
      // bucket recall minus pairs whose other shared bands are under
      // cap. Never a duplicate emission either way.
      if (stored.length > maxBucketSize)
        stored = stored.take(maxBucketSize)
    }
    if (stored.isEmpty) state.remove()
    else {
      state.update(stored)
      // clean the bucket up once the watermark passes its newest doc
      state.setTimeoutTimestamp(stored.map(_.tsMs).max + 1)
    }
    out.result().iterator
  }

  // ---- drop-verdict form (curation-at-ingest) ----------------------
  //
  // Same banding/state topology as minhashNearDups, but instead of
  // emitting PAIRS it emits one verdict row per (doc, band): `dropped`
  // is true when the bucket holds an earlier in-horizon doc whose exact
  // shingle Jaccard clears the threshold. The min-band exactly-once
  // machinery is unnecessary here — verdicts are collapsed per doc with
  // a bool-or by the micro-batch consumer (all of a doc's band rows
  // ride the SAME trigger, so the collapse is a plain batch groupBy in
  // foreachBatch, not a second stateful operator). Dropped docs still
  // enter state: a third doc near-duping an already-dropped one must
  // also drop — the streaming analog of transitive clustering, where
  // only the cluster's first arrival survives.

  final case class CurateDoc(docId: Long, ts: java.sql.Timestamp,
      lang: String, text: String, sh: Seq[String], band: Int, bandKey: Long)
  final case class CurateVerdict(doc_id: Long, ts: java.sql.Timestamp,
      lang: String, text: String, dropped: Boolean)

  private def processCurate(threshold: Double, maxBucketSize: Int)(
      key: (Int, Long),
      rows: Iterator[CurateDoc],
      state: GroupState[List[StoredMinhashDoc]]): Iterator[CurateVerdict] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val wm = state.getCurrentWatermarkMs()
    var stored = state.getOption.getOrElse(Nil).filter(_.tsMs >= wm)
    val out = List.newBuilder[CurateVerdict]
    // deterministic arrival order: the later of an in-batch pair drops
    rows.toArray.sortBy(d => (d.ts.getTime, d.docId)).foreach { d =>
      val matched = stored.exists(s => s.docId != d.docId &&
        jaccardDistinct(s.sh, d.sh) >= threshold)
      out += CurateVerdict(d.docId, d.ts, d.lang, d.text, matched)
      stored ::= StoredMinhashDoc(d.docId, d.ts.getTime, Nil, d.sh)
      if (stored.length > maxBucketSize) stored = stored.take(maxBucketSize)
    }
    if (stored.isEmpty) state.remove()
    else {
      state.update(stored)
      state.setTimeoutTimestamp(stored.map(_.tsMs).max + 1)
    }
    out.result().iterator
  }

  /** Per-band drop verdicts for curation-at-ingest: one row per (doc,
    * band) with `dropped` = an earlier in-horizon near-dup shares the
    * bucket. Docs too short to shingle bypass the stateful stage with
    * an always-keep verdict (they cannot pair — the batch pipeline
    * keeps them too). Collapse per doc with
    * [[StreamingPipelines.collapseCurated]] inside foreachBatch. */
  def minhashDropVerdicts(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      langCol: String,
      watermark: String = "60 seconds",
      shingleN: Int = 3,
      bands: Int = 8,
      rows: Int = 4,
      threshold: Double = 0.8,
      maxBucketSize: Int = 1000): Dataset[CurateVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      .filter(col(idCol).isNotNull && col(tsCol).isNotNull &&
        col(textCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .select(
        col(idCol).cast("long").as("docId"),
        col(tsCol).as("ts"),
        col(langCol).cast("string").as("lang"),
        col(textCol).as("text"),
        WordShingles(col(textCol), shingleN).as("sh"))
    val shingled = base.filter(size(col("sh")) > 0)
      .withColumn("bandKeys", MinhashBands(col("sh"), bands, rows))
      .select(col("docId"), col("ts"), col("lang"), col("text"), col("sh"),
        posexplode(col("bandKeys")))
      .select(col("docId"), col("ts"), col("lang"), col("text"), col("sh"),
        col("pos").cast("int").as("band"), col("col").as("bandKey"))
      .as[CurateDoc]
      .groupByKey(d => (d.band, d.bandKey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processCurate(threshold, maxBucketSize))
    val shortDocs = base.filter(size(col("sh")) === 0)
      .select(col("docId").as("doc_id"), col("ts"), col("lang"), col("text"),
        lit(false).as("dropped"))
      .as[CurateVerdict]
    shingled.union(shortDocs)
  }

  /** Streaming MinHash-LSH near-dup pairs: `docs` must carry (idCol:
    * integral, tsCol: timestamp, textCol: string); returns append-mode
    * (doc_a, doc_b, jac) pairs with exact-Jaccard-verified similarity,
    * identical to batch `Dedup.minhashLsh` on the same in-horizon doc
    * set (NearDupStreamSpec pins the parity). Two documents pair only
    * if the earlier is still within the watermark horizon when the
    * later arrives — the documented streaming bound. Second documented
    * bound: when a pair's MINIMUM matching band lands in a bucket that
    * overflowed `maxBucketSize` and evicted the earlier doc, the pair
    * is dropped even if other bands still co-hold it (see
    * processMinhash) — matching the spirit of the batch cap, which
    * drops oversized buckets whole. */
  def minhashNearDups(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      watermark: String = "60 seconds",
      shingleN: Int = 3,
      bands: Int = 8,
      rows: Int = 4,
      threshold: Double = 0.8,
      maxBucketSize: Int = 1000): Dataset[JacPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(tsCol).isNotNull &&
        col(textCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .select(
        col(idCol).cast("long").as("docId"),
        // the watermark tag rides on this column — it must survive into
        // the stateful operator for EventTimeTimeout to be legal
        col(tsCol).as("ts"),
        WordShingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0) // sub-n-token docs can't pair (batch parity)
      .withColumn("bandKeys", MinhashBands(col("sh"), bands, rows))
      .select(col("docId"), col("ts"), col("sh"), col("bandKeys"),
        posexplode(col("bandKeys")))
      .select(col("docId"), col("ts"), col("sh"), col("bandKeys"),
        col("pos").cast("int").as("band"), col("col").as("bandKey"))
      .as[MinhashBandedDoc]
      .groupByKey(d => (d.band, d.bandKey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processMinhash(threshold, maxBucketSize))
  }
}
