package graft

import org.apache.spark.sql.SparkSession

/** Canonical session configuration for the engine.
  *
  * One place for the settings every entry point (Bench, Verify, user
  * applications) must agree on: UTC session time (oracle parity), AQE
  * with partition coalescing and skew-join handling, shuffle
  * parallelism sized to the machine instead of the 200 default, and
  * scan partition sizing. On a real cluster the same builder applies —
  * only master/memory come from the deploy environment.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728") // 128 MiB
      // Generated-class cache sized for a real multi-query workload.
      // The 100-entry default thrashes once a session runs more than a
      // handful of distinct queries (this library registers ~60, each
      // with several codegen'd stages): every re-run then re-Janinos
      // evicted classes AND re-JITs them as brand-new classes — bench
      // telemetry measured 22-36 s of C2 time per WARM pass, the
      // long-unattributed warm-pass wander. Static conf: must be set
      // at builder time, ignored on getOrCreate of an existing session.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // CORRECTNESS: Spark 4.1's unionOutputPartitioning (default true)
      // lets UnionExec CLAIM its children's common hash partitioning
      // while the execution still CONCATENATES their partitions — any
      // clustering-required operator above an aligned union (bucketed
      // scan ∪ bucketed scan, bucketed table ∪ same-key same-count
      // Exchange, as in every store-merge shape) then elides its
      // shuffle and silently emits per-child duplicate groups.
      // Measured on 4.1.2: 7 keys over 2 same-bucketed tables →
      // 14 groups; the KTable-merge shape was wrong nondeterministically
      // (AQE coalescing sometimes breaks the false claim). Pinned off
      // here and regression-tested in UnionPartitioningSpec.
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.ui.enabled", "false")

  /** Local session sized from the SPARK_GRAFT_CPUS env (driver contract).
    *
    * Shuffle/spill scratch goes to tmpfs when available: measured on
    * this single-node harness, shuffle files written to the virtual
    * disk trigger periodic page-writeback storms that throttle every
    * writer for 60-90 s (bench totals 92 s → 38 s once scratch moved to
    * RAM). A cluster deployment ignores this branch — spark.local.dir
    * comes from the cluster manager (YARN/K8s local dirs on NVMe). */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b = builder(s"local[$cpus]", cpus.toInt)
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite && sys.props.get("spark.local.dir").isEmpty)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val s = b.getOrCreate()
    // native expressions on the SQL surface (idempotent); cluster
    // deployments get the same via spark.sql.extensions=
    // graft.GraftSparkExtensions at builder time
    graft.functions.GraftFunctions.register(s)
    s
  }
}
