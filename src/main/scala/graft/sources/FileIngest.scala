package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-based ingest edges: the broker-less analog of the Kafka source
  * (S1/S2) for batch backfill and file-watch streaming. A directory of
  * delimited text files is read (batch or `readStream`) as a `value`
  * column and decoded with the same FAILFAST codec as the Kafka path,
  * so one topology serves Kafka, files, and MemoryStream inputs.
  *
  * Scale: `maxFilesPerTrigger` bounds per-micro-batch work on a large
  * backlog; parquet/text scans split by `spark.sql.files.maxPartitionBytes`.
  */
object FileIngest {

  /** Batch read of delimited text files → decoded columns. */
  def readDelimitedFiles(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    DelimitedCodec.decoded(
      spark.read.text(path).select(col("value").cast("string").as("value")),
      "value", schema)

  /** Streaming read (file-watch source) of delimited text files. */
  def streamDelimitedFiles(spark: SparkSession, path: String,
      schema: StructType, maxFilesPerTrigger: Int = 100): DataFrame =
    DelimitedCodec.decoded(
      spark.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(path)
        .select(col("value").cast("string").as("value")),
      "value", schema)
}
