package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Positional comma-delimited codec — the reference's only wire format
  * ("CSV-in-value"; reference: Aggregations.java:49-55,89-93,
  * StreamStreamJoin.java:186-232; `value_format='delimited'` at
  * StreamStreamJoin.java:30,33).
  *
  * Decode = `from_csv` in FAILFAST mode: the reference crashes on
  * malformed input (bare `String.split` + `Long.valueOf`), so a parse
  * error here must also fail rather than null-fill.
  *
  * Both directions are native Catalyst expressions — fully codegen'd,
  * no UDFs — so at 100 TB the codec adds no interpretation overhead and
  * column pruning still reaches the underlying scan.
  */
object DelimitedCodec {

  val orderSchema: StructType = StructType(Seq(
    StructField("orderTimeMs", LongType),
    StructField("orderId", IntegerType),
    StructField("itemName", StringType),
    StructField("orderValue", DoubleType)))

  val impressionSchema: StructType = StructType(Seq(
    StructField("impressionTime", LongType),
    StructField("impressionId", StringType),
    StructField("userId", StringType),
    StructField("adId", StringType)))

  val clickSchema: StructType = StructType(Seq(
    StructField("clickTime", LongType),
    StructField("userId", StringType),
    StructField("impressionId", StringType),
    StructField("adId", StringType),
    StructField("clickId", StringType)))

  val impressionAndClickSchema: StructType = StructType(Seq(
    StructField("impressionId", StringType),
    StructField("userId", StringType),
    StructField("adId", StringType),
    StructField("wasClicked", BooleanType)))

  private val failfast = Map("mode" -> "FAILFAST")

  /** Parse a delimited `value` column into typed fields (struct). */
  def decode(value: Column, schema: StructType): Column =
    from_csv(value, schema, failfast)

  /** PERMISSIVE decode for pipeline-hygiene paths: malformed rows
    * null-fill instead of failing the job (the reference crashes on bad
    * input — FAILFAST above is the parity mode; this is the mode a
    * 100 TB ingest actually wants, with bad rows quarantined by
    * filtering on the null pattern). */
  def decodePermissive(value: Column, schema: StructType): Column =
    from_csv(value, schema, Map("mode" -> "PERMISSIVE"))

  /** df with string column `col` → df with that column replaced by the
    * parsed fields, flattened to top level. */
  def decoded(df: DataFrame, col: String, schema: StructType): DataFrame =
    df.withColumn("__parsed", decode(df(col), schema))
      .select((df.columns.filterNot(_ == col).map(df(_)) :+
        org.apache.spark.sql.functions.col("__parsed.*")): _*)

  /** Encode columns back to the positional comma-delimited string.
    * `concat_ws` matches the reference's StringBuilder concatenation
    * (no quoting/escaping — fields must not contain commas, same
    * contract as the reference). */
  def encode(cols: Column*): Column =
    concat_ws(",", cols.map(_.cast("string")): _*)
}
