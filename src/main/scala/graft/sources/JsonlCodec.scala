package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines codec — the de-facto interchange format of training-data
  * pipelines (one JSON document per line). Both directions are the
  * native `to_json`/`from_json` Catalyst expressions — codegen'd, no
  * UDFs, schema-pruned: at 100 TB a projection over two fields prunes
  * the parse to those fields instead of materializing every key.
  *
  * Mirrors DelimitedCodec's mode contract: FAILFAST for parity-style
  * ingestion (corrupt line = fail loudly), PERMISSIVE for pipeline
  * hygiene (malformed rows null-fill and are quarantined by filtering
  * on the null pattern).
  */
object JsonlCodec {

  /** Columns → one JSON line (stable field order = struct order). */
  def encode(fields: Column*): Column = to_json(struct(fields: _*))

  /** Parse a JSON line into typed fields (struct column). */
  def decode(value: Column, schema: StructType,
      failfast: Boolean = true): Column =
    from_json(value, schema,
      Map("mode" -> (if (failfast) "FAILFAST" else "PERMISSIVE")))

  /** df → single-column JSONL frame (`line`). */
  def encoded(df: DataFrame): DataFrame =
    df.select(encode(df.columns.map(df(_)): _*).as("line"))

  /** Single-column JSONL frame → typed frame with `schema`'s fields. */
  def decoded(df: DataFrame, col: String, schema: StructType,
      failfast: Boolean = true): DataFrame =
    df.select(decode(df(col), schema, failfast).as("__parsed"))
      .select(org.apache.spark.sql.functions.col("__parsed.*"))
}
