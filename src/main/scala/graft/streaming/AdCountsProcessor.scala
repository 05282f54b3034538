package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model.ImpressionAndClick
import graft.streaming.StatefulCounts.{AdCounts, AdCtrUpdate}

/** The per-ad running counters on Spark 4's `transformWithState` — the
  * successor API to mapGroupsWithState (typed per-key state handles,
  * TTL, timers, RocksDB-first design). Same faithful A6/A7 semantics as
  * StatefulCounts; kept alongside it so the engine exposes both the
  * stable and the modern arbitrary-state API.
  *
  * At scale: ValueState is per-key in the state store (RocksDB provider
  * for large cardinality); TTLConfig would bound state for ad churn —
  * NONE here to mirror the reference's unbounded KeyValueStore
  * (StreamStreamJoin.java:130).
  */
class AdCountsProcessor
    extends StatefulProcessor[String, ImpressionAndClick, AdCtrUpdate] {

  @transient private var counts: ValueState[AdCounts] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getValueState[AdCounts](
      "counts", Encoders.product[AdCounts], TTLConfig.NONE)

  override def handleInputRows(
      adId: String,
      rows: Iterator[ImpressionAndClick],
      timers: TimerValues): Iterator[AdCtrUpdate] = {
    var AdCounts(imps, clks) = Option(counts.get()).getOrElse(AdCounts(0L, 0L))
    rows.foreach { r => if (r.wasClicked) clks += 1 else imps += 1 }
    counts.update(AdCounts(imps, clks))
    val ctr =
      if (clks == 0) 0.0
      else if (imps == 0) Double.PositiveInfinity
      else clks.toDouble / imps
    Iterator.single(AdCtrUpdate(adId, imps, clks, ctr))
  }
}

object AdCountsProcessor {
  def runningAdCounts(spark: SparkSession,
      joined: Dataset[ImpressionAndClick]): Dataset[AdCtrUpdate] = {
    import spark.implicits._
    joined
      .groupByKey(_.adId)
      .transformWithState(new AdCountsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
