package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of verifiable queries. Each query is a
  * `(session, sfDir) => DataFrame` over the TESTDATA parquet tables;
  * `oracleSql` holds the DuckDB-equivalent ANSI SQL keyed by the same
  * name (omitted ⇒ the driver records a weaker rows-only check).
  *
  * Contract (driver compare): column NAMES and types must match the
  * oracle exactly — the compare sorts columns by name before hashing.
  * Double-valued aggregates are `round(..., 4)`-ed on BOTH sides so
  * summation-order ULP noise can't flip the hash.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
