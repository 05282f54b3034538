package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Kafka edges (reference S1–S4, S7: SURVEY.md §2.1) isolated in one thin
  * module so the operator core stays testable without a broker.
  *
  * The reference consumes (byte[] key, String value) CSV-in-value records
  * (Consumed.with(ByteArray, String), Aggregations.java:81-83) and
  * produces (String, String) (KStream.to, Aggregations.java:149). Spark's
  * Kafka source/sink is binary both ways, so the casts here are the whole
  * serde story.
  *
  * Needs spark-sql-kafka on the classpath at runtime (present on a real
  * cluster; not shipped in this container, so no spec exercises it —
  * the decode/transform logic it feeds is covered via MemoryStream).
  */
object KafkaIo {

  /** S7 inbound serde: the Kafka source's (binary key, binary value,
    * timestamp, …) wire schema → (string key, string value, timestamp).
    * Pure projection — works on ANY DataFrame with that shape, which is
    * what makes the serde testable broker-free (KafkaIoSpec feeds it
    * binary columns and asserts the reference's Consumed.with(ByteArray,
    * String) semantics). */
  def decodeProjection(df: DataFrame): DataFrame =
    df.selectExpr(
      "CAST(key AS STRING) AS key",
      "CAST(value AS STRING) AS value",
      "timestamp")

  /** S7 outbound serde: (key, value) of any castable type → the string
    * pair the reference produces (default String serdes,
    * Aggregations.java:65-68). The Kafka sink casts string → binary. */
  def encodeProjection(df: DataFrame): DataFrame =
    df.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")

  /** S1/S2: subscribe → (key, value as string, record timestamp).
    * The record `timestamp` column is the reference's event-time source
    * (broker/producer-assigned; SURVEY.md §2.7) — the engine instead uses
    * the embedded `*time` value field after decode (documented delta). */
  def readDelimited(spark: SparkSession, bootstrapServers: String,
      topic: String, startingOffsets: String = "latest"): DataFrame =
    decodeProjection(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load())

  /** S3/S4: produce (key, value) string records to a topic. Caller picks
    * outputMode/trigger and calls .start(). */
  def writeDelimited(df: DataFrame, bootstrapServers: String, topic: String,
      checkpointLocation: String): DataStreamWriter[Row] =
    encodeProjection(df)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
}
