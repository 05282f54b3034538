package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench harness semantics (no Spark session needed): the reported
  * warm number and the staging-path isolation. */
class BenchSpec extends AnyFunSuite {

  test("warmMedian: three valid passes -> true median (stall suppression)") {
    assert(Bench.warmMedian(Seq(1.0, 9.0, 2.0)) == 2.0)
    assert(Bench.warmMedian(Seq(3.0, 3.0, 3.0)) == 3.0)
  }

  test("warmMedian: a failed pass reports the MAX of survivors, never min-of-2") {
    // one failed + one stalled: the stall must NOT be hidden — a
    // failure is itself a red flag and the headline must not improve
    assert(Bench.warmMedian(Seq(-1.0, 9.0, 2.0)) == 9.0)
    assert(Bench.warmMedian(Seq(5.0, -1.0, -1.0)) == 5.0)
  }

  test("warmMedian: all passes failed -> -1") {
    assert(Bench.warmMedian(Seq(-1.0, -1.0, -1.0)) == -1.0)
  }

  test("staging root is per-process unique (concurrent runs can't cross-delete)") {
    val root = Bench.stagingRoot.toString
    assert(root.startsWith("/dev/shm/graft-bench-input-"))
    assert(root.endsWith(ProcessHandle.current().pid().toString),
      s"staging root must carry this JVM's pid: $root")
  }

  test("QueryRun json shape") {
    val j = Bench.QueryRun(1.5, 10, 20, 1, 2, 3, 4, 5).json
    assert(j ==
      """{"sec":1.5,"gc_ms":10,"jit_ms":20,"psi_io_ms":1,"psi_mem_ms":2,"psi_cpu_ms":3,"steal_j":4,"rd_kb":5}""")
  }
}
