package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The reference's CTR KTable as a foreachBatch merge target
  * (SURVEY.md §3.2: update-mode aggregation can't chain after a
  * stream-stream join, so the per-batch increments get merged into an
  * external keyed store — on a cluster a Delta/JDBC MERGE, here an
  * in-memory map with identical merge semantics).
  *
  * Only group-cardinality increment rows (one per touched ad per batch,
  * already aggregated distributed) reach the store — never joined rows.
  */
final class CtrStore {

  private val counts = TrieMap.empty[String, (Long, Long)]

  /** Merge a batch of (ad_id, num_impressions, num_clicks) increments. */
  def merge(increments: DataFrame): Unit =
    increments
      .select(col("ad_id"), col("num_impressions"), col("num_clicks"))
      .collect()
      .foreach { r =>
        val (ad, di, dc) = (r.getString(0), r.getLong(1), r.getLong(2))
        val (i0, c0) = counts.getOrElse(ad, (0L, 0L))
        counts.put(ad, (i0 + di, c0 + dc))
      }

  /** Faithful A7 snapshot (quirks included). */
  def snapshot(): Map[String, (Long, Long, Double)] =
    counts.readOnlySnapshot().toMap.map { case (ad, (imps, clks)) =>
      val ctr =
        if (clks == 0) 0.0
        else if (imps == 0) Double.PositiveInfinity
        else clks.toDouble / imps
      ad -> (imps, clks, ctr)
    }
}
