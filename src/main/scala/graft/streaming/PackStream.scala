package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.TextAnalysis.packSequences]] —
  * the training-output layout maintained incrementally over an
  * unbounded ingest stream.
  *
  * Batch packing orders the WHOLE corpus by the salted hash; a stream
  * cannot re-sort history (the already-emitted layout is immutable), so
  * the streaming layout is arrival-major: batches occupy the token
  * stream in arrival order, hash-ordered WITHIN each batch. The only
  * state that needs to persist is per-shard totals — how many docs and
  * tokens each shard has absorbed — because the packing arithmetic is a
  * pure prefix sum: batch N's rows are exactly
  * `packColumns(shardPackRows(batch))` on top of batches 1..N-1's
  * accumulated totals (ONE shared arithmetic with the batch operator,
  * so the two forms cannot drift).
  *
  * State shape: `(batch_id, shard, n_docs, n_tokens)` — the folded
  * history (one `FoldedBatch` row per shard) plus the LAST batch's
  * per-shard contribution, ≤ 2·nShards rows forever. Keeping the last
  * contribution under its own batch_id is what makes replay exact: the
  * base offsets for batch B read `batch_id < B`, so an at-least-once
  * REPLAY of the last batch (its contribution already merged, tagged B)
  * recomputes the identical emission — the same
  * exclude-the-batch's-own-rows trick the band/gram stores use, in
  * aggregate form. Each merge folds everything older than the incoming
  * batch into the `FoldedBatch` rows, so state stays bounded by the
  * shard count, never the stream length.
  *
  * nShards and budget live ON the store: a layout is only coherent if
  * every batch agrees on both (a mid-stream budget change would
  * re-chunk the already-emitted sequence ids).
  */
final class PackStore(val nShards: Int, val budget: Int, dir: String) {

  def this(nShards: Int, budget: Int) =
    this(nShards, budget,
      Files.createTempDirectory("graft-pack-store").toString)

  require(nShards >= 1, s"nShards must be >= 1, got $nShards")
  require(budget >= 1, s"budget must be >= 1, got $budget")

  private val store = new VersionedParquetStore(dir, adoptExisting = true)

  /** Current totals table: (batch_id, shard, n_docs, n_tokens). Empty
    * before the first merge. ≤ 2·nShards rows by construction. */
  def table(spark: SparkSession): DataFrame = store.current match {
    case None =>
      import spark.implicits._
      Seq.empty[(Long, Long, Long, Long)]
        .toDF("batch_id", "shard", "n_docs", "n_tokens")
    case Some(d) => spark.read.parquet(d)
  }

  /** Per-shard base offsets for batch `batchId`: the stream's mass
    * STRICTLY BEFORE it — (shard, base_docs, base_toks). Excluding the
    * batch's own id (not just "everything") is the replay-exactness
    * seam; monotonic foreachBatch ids make the two equivalent on a
    * first run. */
  def totalsBefore(spark: SparkSession, batchId: Long): DataFrame =
    table(spark).filter(col("batch_id") < lit(batchId))
      .groupBy(col("shard"))
      .agg(sum(col("n_docs")).cast("long").as("base_docs"),
        sum(col("n_tokens")).cast("long").as("base_toks"))

  /** True when `batchId` was already merged — [[merge]] would no-op and
    * the emission for it is a pure replay read. */
  def isReplay(batchId: Long): Boolean = store.isReplay(batchId)

  /** Merge one batch's per-shard contribution (shard, n_docs,
    * n_tokens): fold all older rows into the `FoldedBatch` sentinel,
    * append the contribution under its own batch_id. batchId-idempotent
    * via the shared version-publish guard. */
  def merge(contrib: DataFrame, batchId: Long): Unit = synchronized {
    require(batchId >= 0,
      s"PackStore.merge needs a real (monotonic, >= 0) batchId for its " +
        s"base-offset arithmetic, got $batchId")
    val spark = contrib.sparkSession
    store.publish(batchId) { nextDir =>
      val folded = table(spark).filter(col("batch_id") < lit(batchId))
        .groupBy(col("shard"))
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("n_tokens")).cast("long").as("n_tokens"))
        .select(lit(PackStore.FoldedBatch).as("batch_id"), col("shard"),
          col("n_docs"), col("n_tokens"))
      val tagged = contrib.select(lit(batchId).as("batch_id"),
        col("shard").cast("long").as("shard"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_tokens").cast("long").as("n_tokens"))
      folded.unionByName(tagged)
        .write.mode(SaveMode.Overwrite).parquet(nextDir)
    }
  }
}

object PackStore {
  /** batch_id sentinel for folded history rows — strictly below every
    * real foreachBatch id, so `batch_id < B` always includes them. */
  val FoldedBatch: Long = -1L
}

/** Streaming twin of [[graft.operators.TextAnalysis.packSequencesPadded]]
  * — the document-isolated training layout maintained incrementally.
  *
  * The padded fold's whole cross-batch state is one resume triple per
  * shard — (n_docs, next_seq, next_off): where the shard's token stream
  * currently ends. Batch N's rows are exactly
  * `paddedPackColumns(shardPackRows(batch))` re-seeded from that triple
  * (the SAME fold the batch operator runs from (0,0,0) — one arithmetic,
  * no drift), and the state after the batch derives from the batch's
  * OUTPUT alone (its per-shard last row), never from a rescan.
  *
  * Unlike [[PackStore]]'s additive totals, resume state is
  * last-writer-wins: `stateBefore(B)` picks each shard's row with the
  * highest batch_id < B (an argmax over ≤ 2·nShards rows, not a sum).
  * The same replay seam applies — a replayed batch's own rows are
  * excluded by the strict inequality, so an at-least-once re-delivery
  * re-seeds from the original triple and re-emits identical rows. Each
  * merge folds all older state into [[PackStore.FoldedBatch]]-tagged
  * rows (one per shard ever seen) plus the incoming batch's rows under
  * its own id: state stays ≤ 2·nShards rows forever, and shards absent
  * from a batch carry their folded state forward untouched. */
final class PaddedPackStore(val nShards: Int, val budget: Int, dir: String) {

  def this(nShards: Int, budget: Int) =
    this(nShards, budget,
      Files.createTempDirectory("graft-padded-pack-store").toString)

  require(nShards >= 1, s"nShards must be >= 1, got $nShards")
  require(budget >= 1, s"budget must be >= 1, got $budget")

  private val store = new VersionedParquetStore(dir, adoptExisting = true)

  /** Current state table: (batch_id, shard, n_docs, next_seq,
    * next_off). Empty before the first merge. ≤ 2·nShards rows. */
  def table(spark: SparkSession): DataFrame = store.current match {
    case None =>
      import spark.implicits._
      Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("batch_id", "shard", "n_docs", "next_seq", "next_off")
    case Some(d) => spark.read.parquet(d)
  }

  /** Each shard's NEWEST state row among `batch_id < batchId` — the
    * one argmax both [[stateBefore]] and [[merge]]'s fold reduce with
    * (struct ordered by batch_id first; real ids ≥ 0 outrank the
    * folded sentinel): one spelling, so the resume read and the fold
    * cannot disagree on which row is newest. */
  private def newestBefore(spark: SparkSession, batchId: Long): DataFrame =
    table(spark).filter(col("batch_id") < lit(batchId))
      .groupBy(col("shard"))
      .agg(max(struct(col("batch_id"), col("n_docs"), col("next_seq"),
        col("next_off"))).as("s"))

  /** Per-shard resume triples for batch `batchId`: each shard's
    * newest state STRICTLY BEFORE it — (shard, base_docs, base_seq,
    * base_off) — so a shard updated by the last batch resumes from
    * that batch, everything else from its folded row. */
  def stateBefore(spark: SparkSession, batchId: Long): DataFrame =
    newestBefore(spark, batchId)
      .select(col("shard"), col("s.n_docs").as("base_docs"),
        col("s.next_seq").as("base_seq"), col("s.next_off").as("base_off"))

  /** True when `batchId` was already merged — [[merge]] would no-op and
    * the emission for it is a pure replay read. */
  def isReplay(batchId: Long): Boolean = store.isReplay(batchId)

  /** Merge one batch's per-shard resume state (shard, n_docs,
    * next_seq, next_off — the state AFTER the batch): fold every older
    * row into per-shard `FoldedBatch` sentinels (shards the batch
    * didn't touch keep their state there), append the batch's rows
    * under its own id. batchId-idempotent via the shared
    * version-publish guard. */
  def merge(stateAfter: DataFrame, batchId: Long): Unit = synchronized {
    require(batchId >= 0,
      s"PaddedPackStore.merge needs a real (monotonic, >= 0) batchId " +
        s"for its resume arithmetic, got $batchId")
    val spark = stateAfter.sparkSession
    store.publish(batchId) { nextDir =>
      val folded = newestBefore(spark, batchId)
        .select(lit(PackStore.FoldedBatch).as("batch_id"), col("shard"),
          col("s.n_docs").as("n_docs"), col("s.next_seq").as("next_seq"),
          col("s.next_off").as("next_off"))
      val tagged = stateAfter.select(lit(batchId).as("batch_id"),
        col("shard").cast("long").as("shard"),
        col("n_docs").cast("long").as("n_docs"),
        col("next_seq").cast("long").as("next_seq"),
        col("next_off").cast("long").as("next_off"))
      folded.unionByName(tagged)
        .write.mode(SaveMode.Overwrite).parquet(nextDir)
    }
  }
}
