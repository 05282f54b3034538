package graft.operators

import graft.SparkSpec

/** The binned interval join must equal the naive inequality join on
  * every bin-boundary shape: intervals inside one bin, spanning a
  * boundary, spanning several bins, inclusive endpoints, and
  * non-matching keys. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned == naive inequality join incl. bin-boundary and inclusive endpoints") {
    val probe = Seq(
      ("u1", 50L, 1L), ("u1", 100L, 2L), ("u1", 199L, 3L), ("u1", 200L, 4L),
      ("u1", 1050L, 5L), ("u2", 100L, 6L))
      .toDF("user_id", "ts_ms", "event_id")
    val build = Seq(
      ("u1", 10L, 100L, 200L),   // spans bins 1-2 at width 100; ends inclusive
      ("u1", 11L, 150L, 1050L),  // spans many bins
      ("u2", 12L, 0L, 99L))      // u2 only, probe 6 at 100 is outside
      .toDF("user_id", "win_id", "start_ms", "end_ms")

    val binned = RangeJoin.binned(probe, build, "user_id", "ts_ms",
        "start_ms", "end_ms", binWidthMs = 100L)
      .select("win_id", "event_id")
      .as[(Long, Long)].collect().toSet
    val naive = probe.as("p").join(build.as("b"),
        $"p.user_id" === $"b.user_id" &&
          $"p.ts_ms" >= $"b.start_ms" && $"p.ts_ms" <= $"b.end_ms")
      .select($"b.win_id", $"p.event_id")
      .as[(Long, Long)].collect().toSet
    assert(binned == naive, s"missing ${naive -- binned}, extra ${binned -- naive}")
    // sanity on the fixture: inclusive ends + multi-bin spans exercised
    assert(naive.contains((10L, 2L)) && naive.contains((10L, 4L)))
    assert(naive.contains((11L, 5L)))
    assert(!naive.exists(_ == (12L, 6L)))
  }

  test("no duplicate pairs: each (probe, interval) match meets in exactly one bin") {
    val probe = Seq(("k", 500L, 1L)).toDF("user_id", "ts_ms", "event_id")
    val build = Seq(("k", 9L, 0L, 10000L)).toDF("user_id", "win_id", "start_ms", "end_ms")
    val out = RangeJoin.binned(probe, build, "user_id", "ts_ms",
      "start_ms", "end_ms", binWidthMs = 100L).collect()
    assert(out.length == 1)
  }
}
