package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Scale-adaptive fan-out before expensive per-row work (the
  * [[Dedup]] md5-banding idiom, r17: promoted to one shared seam).
  *
  * Heavy scan-side computation — shingling + signature digests, BPE /
  * unigram tokenization, codec encode/decode, regex scoring — runs in
  * the SCAN stage, so its parallelism is the scan's partition count.
  * A small input (one parquet row group, a single file, a narrow
  * upstream coalesce) scans as 1-2 partitions and serializes that work
  * on one core while the rest of the machine idles; a well-partitioned
  * 100 TB input already saturates the cluster, where an unconditional
  * repartition would be a full corpus shuffle that buys nothing.
  *
  * `fanOut` therefore repartitions by the given key ONLY when the
  * input's partition count is below the cluster's default parallelism
  * — derived from the data and the session, never a constant (guide
  * §2: scale-adaptive partitioning). Hash partitioning by a real key
  * (never `rand()`): deterministic under task retry, and the exchange
  * is reusable by a downstream join/groupBy on the same key.
  */
object FanOut {

  /** Memoized narrow-input decisions (r17). Reading the planned
    * partition count (`df.rdd.getNumPartitions`) runs the FULL
    * physical-planning pipeline over the subtree and throws the result
    * away — pure driver work repeated on every invocation of every
    * fan-out seam (hundreds per bench pass). The decision is a
    * function of (session, canonicalized logical plan) UNDER TWO
    * session-lifetime preconditions (r17-ADVICE): scan paths are
    * immutable (file-scan plans canonicalize by rootPaths — a path
    * rewritten mid-session would serve the old file set's decision;
    * store segments get fresh paths, hence fresh plans) and the
    * scan-sizing confs (spark.sql.files.maxPartitionBytes etc.) are
    * fixed per session, as GraftSession does. Both hold for every
    * caller in this repo; a deployment that mutates either mid-session
    * must clear or key the cache accordingly. LRU-bounded so
    * multi-session JVMs (the test suite) cannot accumulate dead
    * sessions' plan keys. */
  private val narrowCache =
    new java.util.LinkedHashMap[(SparkSession, Any), java.lang.Boolean](
      256, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, Any), java.lang.Boolean]): Boolean =
        size() > 256
    }

  private def narrow(ds: Dataset[_]): Boolean = {
    val spark = ds.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val key = (spark, ds.queryExecution.analyzed.canonicalized)
    narrowCache.synchronized {
      val hit = narrowCache.get(key)
      if (hit != null) return hit.booleanValue()
    }
    val v = ds.rdd.getNumPartitions < par
    narrowCache.synchronized { narrowCache.put(key, v) }
    v
  }

  /** `df` repartitioned by `key` iff its planned partition count is
    * below the session's default parallelism.
    *
    * The partition count is pinned EXPLICITLY (`repartition(n, key)`,
    * shuffle origin REPARTITION_BY_NUM): a bare `repartition(key)` is
    * REPARTITION_BY_COL, which AQE's partition coalescing folds right
    * back to one partition when the shuffled bytes are under
    * `minPartitionSize` — precisely the small-input case this seam
    * exists for (measured: the fanned-out stage re-ran single-task). */
  def fanOut(df: DataFrame, key: Column): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (sys.props.contains("graft.nofanout")) df
    else if (narrow(df)) df.repartition(par, key) else df
  }

  /** Typed twin for Dataset seams (the multimodal codec boundary). */
  def fanOutDs[T](ds: Dataset[T], key: Column): Dataset[T] = {
    val par = ds.sparkSession.sparkContext.defaultParallelism
    if (sys.props.contains("graft.nofanout")) ds
    else if (narrow(ds)) ds.repartition(par, key) else ds
  }

  /** The fan-out PREDICATE alone — for call sites that also want to
    * place a materialization point relative to the exchange (e.g.
    * checkpoint an expensive projection AFTER the fan-out so the
    * parallel pass runs once; [[fanOut]] can't express that because
    * the projection sits between the exchange and the checkpoint).
    * Honors the same kill switch and the same memoized decision. */
  def isNarrow(df: DataFrame): Boolean =
    !sys.props.contains("graft.nofanout") && narrow(df)

  /** The narrow-input predicate WITHOUT the kill switch — for
    * MATERIALIZATION decisions (small-input localCheckpoint placement),
    * which are not fan-outs: a `graft.nofanout` A/B must toggle only
    * the exchanges, never whether an expensive shared projection is
    * copied once (r17-ADVICE item 2 — the conflated predicate made
    * nofanout A/Bs measure fan-out and materialization together). */
  def isNarrowMaterialize(df: DataFrame): Boolean = narrow(df)
}
