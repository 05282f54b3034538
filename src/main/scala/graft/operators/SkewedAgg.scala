package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed keys.
  *
  * A plain `groupBy(hotKey)` sends every row of a hot key through one
  * reducer; at 100 TB a handful of hot keys (a viral ad id, a default
  * user agent) serializes the stage. Salting shards each key into
  * `salts` sub-groups on a deterministic per-row hash, aggregates the
  * shards in parallel (phase 1), then merges the tiny per-shard partials
  * (phase 2, `salts × |keys|` rows). Works for any algebraic aggregate —
  * here sum/count, the building blocks of the reference's A4/A6.
  *
  * Note Spark's map-side partial aggregation already mitigates skew for
  * algebraic aggregates when input partitions are key-mixed; explicit
  * salting is the robust form when inputs arrive pre-clustered by the
  * hot key (e.g. a Kafka topic partitioned by that key) or the
  * aggregate is holistic (collect/distinct), and AQE skew-join handles
  * the join-side analog. */
object SkewedAgg {

  /** Salted sum(valueExpr as cents)/count per `keyCol`; result is
    * bit-identical to the unsalted aggregation (integer partials). */
  def saltedSumCount(
      df: DataFrame,
      keyCol: String,
      saltSource: Column,
      valueCents: Column,
      salts: Int = 16): DataFrame =
    df.select(col(keyCol), valueCents.as("__v"),
        pmod(xxhash64(saltSource), lit(salts)).as("__salt"))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col(keyCol))
      .agg(sum(col("__s")).as("value_cents"), sum(col("__n")).as("n"))
      .select(col(keyCol), col("value_cents"), col("n").cast("long").as("n"))
}
