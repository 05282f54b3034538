package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's `Aggregations` pipeline (Aggregations.java:59-173),
  * re-expressed Spark-first.
  *
  * Declared KSQL (Aggregations.java:71-77):
  *   SELECT constant_key, avg(order_total*2), avg(order_total)
  *   FROM orders GROUP BY constant_key   -- + 30 s tumbling window
  *
  * The reference hand-builds: project+prune (Aggregations.java:86-94) →
  * constant-key groupBy (":96") → 30 s tumbling window (":98") → custom
  * (sum,sum,count) accumulator (":100-129") → avg finalizer (":131-139")
  * → "start-end-key" output key (":141-148").
  *
  * Here the whole thing is one declarative plan: Catalyst does the column
  * pruning, and `avg`'s internal partial/final split IS the reference's
  * manual (sum,sum,count)-then-divide decomposition — map-side partial
  * aggregation means the shuffle carries one row per (partition, window),
  * not one per input record. At 100 TB the plan is:
  * scan(pruned: ts, v) → partial HashAggregate → Exchange(window) →
  * final HashAggregate, which is the minimal-shuffle shape for a global
  * windowed aggregate.
  */
object WindowedAverages {

  /** Tumbling-window global averages; works on batch AND streaming input
    * (same plan, Structured Streaming's unification).
    *
    * Input: any df with an event-time column and a double value column.
    * Output: window_start_ms/window_end_ms (epoch ms), win_key in the
    * reference's "startMs-endMs-key" format (Aggregations.java:143-147;
    * constant key "0" per Aggregations.java:96), avg(v*2), avg(v), n.
    *
    * The averages are derived from exact integer cents sums + the count
    * — literally the reference's A4/A5 decomposition ("keep (sum, sum,
    * count) in state, divide at the end", Aggregations.java:99-139) made
    * float-deterministic: a re-aggregated double sum orders its adds
    * differently per partitioning (never hash-comparable across engines
    * or even across runs), while a long sum is exact and the final
    * long→double division is one IEEE op. Money is cents-precision, so
    * round(v·100) loses nothing.
    */
  def windowedAvg(
      df: DataFrame,
      tsCol: String,
      vCol: String,
      windowDuration: String = "30 seconds"): DataFrame = {
    df.select(
        window(col(tsCol), windowDuration).as("w"),
        (col(vCol) * 2).as("v2x"),
        col(vCol).as("v"))
      .groupBy(col("w"))
      .agg(
        sum(round(col("v2x") * 100).cast("long")).as("s2c"),
        sum(round(col("v") * 100).cast("long")).as("s1c"),
        count(lit(1)).as("n"))
      .withColumn("avg_total_x2",
        (col("s2c").cast("double") / 100.0) / col("n").cast("double"))
      .withColumn("avg_total",
        (col("s1c").cast("double") / 100.0) / col("n").cast("double"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        unix_millis(col("w.end")).as("window_end_ms"),
        concat_ws("-",
          unix_millis(col("w.start")).cast("string"),
          unix_millis(col("w.end")).cast("string"),
          lit("0")).as("win_key"),
        col("avg_total_x2"),
        col("avg_total"),
        col("n"))
  }

  /** Streaming form: identical plan plus a watermark for state eviction.
    * The reference has no watermark (Kafka 1.1, 24 h retention); 60 s is
    * this engine's documented semantic delta (SURVEY.md §7.5.2).
    * Consume in outputMode("update") for KTable update semantics (A10). */
  def windowedAvgStream(
      df: DataFrame,
      tsCol: String,
      vCol: String,
      windowDuration: String = "30 seconds",
      watermark: String = "60 seconds"): DataFrame =
    windowedAvg(df.withWatermark(tsCol, watermark), tsCol, vCol, windowDuration)
}
