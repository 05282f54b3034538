package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every operator in the engine is a `DataFrame => DataFrame` transform;
  * these are the batch entry edges. At cluster scale the same transforms
  * run over partitioned parquet/Kafka — nothing here assumes local mode.
  */
object Tables {

  /** Resolved-relation cache (r17): `spark.read.parquet` pays file
    * listing, a parquet FOOTER read for schema inference and relation
    * resolution on EVERY call — pure driver metadata work repeated for
    * every query over the same immutable inputs (~10-30 ms × hundreds
    * of table reads per bench pass). Reusing the resolved DataFrame
    * caches the PLAN only — every action still scans the parquet from
    * disk (this is the session-scoped analog of Spark's own
    * FileStatusCache, not a data cache). Keyed per session (a plan is
    * bound to its session); LRU-bounded so long-lived multi-session
    * JVMs (the test suite) cannot accumulate dead sessions' plans. */
  private val relationCache =
    new java.util.LinkedHashMap[(SparkSession, String, String), DataFrame](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, String), DataFrame]): Boolean =
        size() > 64
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // nanosAsLong is set BEFORE any relation resolves (r17-ADVICE item
    // 4): events() used to set it first, but a caller reading 'events'
    // through table() before events() would cache a conf-less schema —
    // the legacy conf only changes how TIMESTAMP(NANOS) parquet (one
    // testdata generation of events.ts) is inferred, and is a no-op for
    // every other table. The cache below assumes sfDir contents are
    // immutable for the JVM lifetime (there is no refreshByPath hook).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    relationCache.synchronized {
      val k = (spark, sfDir, name)
      val hit = relationCache.get(k)
      if (hit != null) hit
      else {
        val df = spark.read.parquet(s"$sfDir/$name.parquet")
        relationCache.put(k, df)
        df
      }
    }
  }

  /** events.parquet's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (Spark reads it only as a long via the
    * legacy conf), TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark 4 infers
    * TIMESTAMP_NTZ), or a plain UTC timestamp. Normalize all three to a
    * canonical TimestampType event-time column; the session timezone is
    * pinned to UTC (GraftSession), so the NTZ cast is value-identical to
    * the epoch-micros interpretation the nanos path produces. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // The stored NTZ wall clocks are UTC instants. A bare cast
      // interprets them in the SESSION zone (silently shifting events
      // for any non-UTC caller); composing the cast with
      // from_utc_timestamp over the SAME zone cancels the
      // interpretation exactly — the cast maps wall w to the instant
      // whose zone-rendering is w, from_utc_timestamp maps it back to
      // the instant whose UTC-rendering is w — so the result is
      // w-as-UTC in every session, and no global conf is mutated
      // (EventsTzSpec pins both properties). A plain
      // to_utc_timestamp(ts, 'UTC') would NOT work: its implicit
      // NTZ→TZ cast itself reads the session zone.
      case TimestampNTZType =>
        val z = spark.conf.get("spark.sql.session.timeZone")
        raw.withColumn("ts",
          expr(s"from_utc_timestamp(cast(ts as timestamp), '$z')"))
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
