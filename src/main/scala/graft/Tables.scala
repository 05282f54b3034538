package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every operator in the engine is a `DataFrame => DataFrame` transform;
  * these are the batch entry edges. At cluster scale the same transforms
  * run over partitioned parquet/Kafka — nothing here assumes local mode.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (Spark reads it only as a long via the
    * legacy conf), TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark 4 infers
    * TIMESTAMP_NTZ), or a plain UTC timestamp. Normalize all three to a
    * canonical TimestampType event-time column; the session timezone is
    * pinned to UTC (GraftSession), so the NTZ cast is value-identical to
    * the epoch-micros interpretation the nanos path produces. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ branch's cast interprets the stored wall clock in the
    // SESSION timezone; the stored values are UTC instants, so pin the
    // zone the same defensive way as the nanos conf above — without it
    // a non-GraftSession caller (spark-shell, notebook) in another zone
    // would silently shift every event by its UTC offset. GraftSession
    // and SparkSpec already pin UTC; this makes the reader
    // self-contained.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
