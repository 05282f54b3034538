package graft.streaming

import java.nio.file.{Files, Paths}

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
  * written as a new immutable version directory — read-version N,
  * write-version N+1, publish by bumping the version. That is exactly
  * the copy-on-write MERGE a Delta/Iceberg table does at scale; plain
  * versioned parquet keeps it dependency-free here. Nothing is ever
  * collected to the driver on the merge path — `snapshot()` is the
  * queryable-store READ surface (bounded by ad cardinality, the
  * reference's interactive-query analog), not part of the pipeline.
  */
final class CtrStore(dir: String) {

  def this() = this(Files.createTempDirectory("graft-ctr-store").toString)

  // Versions are immutable once written; `version` is the publish
  // pointer (foreachBatch serializes merges per query, so no CAS
  // needed — batch N+1 never starts before batch N's merge returns).
  @volatile private var version: Int = 0

  private def versionDir(v: Int): String = s"$dir/v$v"

  /** Current table as a DataFrame: (ad_id, num_impressions, num_clicks). */
  def table(spark: SparkSession): DataFrame =
    if (version == 0) {
      import spark.implicits._
      Seq.empty[(String, Long, Long)]
        .toDF("ad_id", "num_impressions", "num_clicks")
    } else spark.read.parquet(versionDir(version))

  /** Merge a batch of (ad_id, num_impressions, num_clicks) increments:
    * union + keyed re-aggregation + copy-on-write publish. */
  def merge(increments: DataFrame): Unit = {
    val spark = increments.sparkSession
    val inc = increments.select(
      col("ad_id"),
      col("num_impressions").cast("long").as("num_impressions"),
      col("num_clicks").cast("long").as("num_clicks"))
    val next = version + 1
    table(spark).unionByName(inc)
      .groupBy(col("ad_id"))
      .agg(sum(col("num_impressions")).as("num_impressions"),
        sum(col("num_clicks")).as("num_clicks"))
      .write.mode(SaveMode.Overwrite).parquet(versionDir(next))
    version = next
    // retire versions older than the previous one (kept for any
    // in-flight reader of N-1)
    val stale = Paths.get(dir).resolve(s"v${next - 2}")
    if (next >= 2 && Files.exists(stale)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(stale)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
      finally walk.close()
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
