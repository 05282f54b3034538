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

  /** Bench-only twins: variants worth timing and plan-pinning but NOT
    * DuckDB-verifiable (e.g. xxhash64-keyed LSH — the engine-native hash
    * has no DuckDB twin). They run in `graft.Bench` and in the specs but
    * are excluded from the Verify gate, which stays 100% oracle-backed;
    * each twin must be value-gated by an oracle-verified sibling running
    * the identical pipeline downstream of the hash. */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map.empty
}

object QueryPack {
  /** Collision-resistant warehouse-name suffix for a per-sfDir
    * memoized store: the sanitized path TAIL (bounded, so a deep CI
    * path can't push the directory name past filesystem limits) plus
    * the full string's hash. A bare `dir.hashCode` suffix can collide
    * across different dirs — the second store's first merge would then
    * orphan-sweep the first store's live segments under the shared
    * name; a collision here requires the same 48-char tail AND the
    * same hash. */
  def storeSuffix(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_").takeRight(48) + "_" +
      java.lang.Integer.toHexString(dir.hashCode)
}
