package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.model.ImpressionAndClick

/** Per-ad running counters as explicit keyed state — the Spark analog of
  * the reference's A6 aggregate over a KeyValueStore
  * (StreamStreamJoin.java:105-131) and of the Processor API it imports
  * but never uses (Aggregations.java:15-20, SURVEY.md §2.8).
  *
  * `mapGroupsWithState` in update mode: each micro-batch emits one
  * updated row per touched ad — the KTable changelog cadence at
  * micro-batch granularity. State is per-key (numImpressions, numClicks),
  * partitioned by ad across executors; at scale this is exactly the
  * RocksDB-state-store shape (set
  * spark.sql.streaming.stateStore.providerClass to the RocksDB provider).
  */
object StatefulCounts {

  final case class AdCounts(numImpressions: Long, numClicks: Long)

  final case class AdCtrUpdate(
      adId: String,
      numImpressions: Long,
      numClicks: Long,
      ctr: Double)

  /** Faithful A6/A7 semantics (quirks included; SURVEY.md §7.5.4). */
  private def update(
      adId: String,
      rows: Iterator[ImpressionAndClick],
      state: GroupState[AdCounts]): AdCtrUpdate = {
    var AdCounts(imps, clks) = state.getOption.getOrElse(AdCounts(0L, 0L))
    rows.foreach { r => if (r.wasClicked) clks += 1 else imps += 1 }
    state.update(AdCounts(imps, clks))
    val ctr =
      if (clks == 0) 0.0
      else if (imps == 0) Double.PositiveInfinity
      else clks.toDouble / imps
    AdCtrUpdate(adId, imps, clks, ctr)
  }

  def runningAdCounts(spark: SparkSession,
      joined: Dataset[ImpressionAndClick]): Dataset[AdCtrUpdate] = {
    import spark.implicits._
    joined
      .groupByKey(_.adId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }
}
