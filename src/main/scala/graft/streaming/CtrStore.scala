package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's CTR KTable as a foreachBatch merge target
  * (SURVEY.md §3.2: update-mode aggregation can't chain after a
  * stream-stream join, so the per-batch increments get merged into an
  * external keyed table).
  *
  * The merge is fully distributed: each batch's increments (already
  * aggregated to group cardinality by ctrIncrements) are unioned with
  * the current table and re-aggregated by key, and the result is
  * written as a new immutable version directory — the copy-on-write
  * version-publish machinery lives in [[VersionedParquetStore]]
  * (shared with the quality-floor store), including the at-least-once
  * replay guard: pass foreachBatch's batchId to [[merge]] and a
  * replayed micro-batch's increments apply exactly once. Nothing is
  * ever collected to the driver on the merge path — `snapshot()` is
  * the queryable-store READ surface (bounded by ad cardinality, the
  * reference's interactive-query analog), not part of the pipeline.
  */
final class CtrStore(dir: String) {

  def this() = this(Files.createTempDirectory("graft-ctr-store").toString)

  // adoptExisting: a restarted driver resumes the committed version
  // (and its replay guard) instead of silently zeroing the KTable —
  // the whole point of a PERSISTED merge target
  private val store = new VersionedParquetStore(dir, adoptExisting = true)

  /** Current table as a DataFrame: (ad_id, num_impressions, num_clicks). */
  def table(spark: SparkSession): DataFrame = store.current match {
    case None =>
      import spark.implicits._
      Seq.empty[(String, Long, Long)]
        .toDF("ad_id", "num_impressions", "num_clicks")
    case Some(d) => spark.read.parquet(d)
  }

  /** Merge a batch of (ad_id, num_impressions, num_clicks) increments:
    * union + keyed re-aggregation + copy-on-write publish. Pass the
    * foreachBatch `batchId` so a replayed batch is a no-op. */
  def merge(increments: DataFrame,
      batchId: Long = VersionedParquetStore.NoBatchId): Unit = {
    val spark = increments.sparkSession
    val inc = increments.select(
      col("ad_id"),
      col("num_impressions").cast("long").as("num_impressions"),
      col("num_clicks").cast("long").as("num_clicks"))
    store.publish(batchId) { nextDir =>
      table(spark).unionByName(inc)
        .groupBy(col("ad_id"))
        .agg(sum(col("num_impressions")).as("num_impressions"),
          sum(col("num_clicks")).as("num_clicks"))
        .write.mode(SaveMode.Overwrite).parquet(nextDir)
    }
  }

  /** Faithful A7 snapshot (quirks included) — the queryable-store read
    * API; the collect here is the OUTPUT surface (|ads| rows), not the
    * merge path. Requires an active SparkSession. */
  def snapshot(): Map[String, (Long, Long, Double)] = {
    val spark = SparkSession.active
    table(spark).collect().map { r =>
      val (ad, imps, clks) = (r.getString(0), r.getLong(1), r.getLong(2))
      val ctr =
        if (clks == 0) 0.0
        else if (imps == 0) Double.PositiveInfinity
        else clks.toDouble / imps
      ad -> (imps, clks, ctr)
    }.toMap
  }
}
