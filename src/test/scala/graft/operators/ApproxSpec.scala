package graft.operators

import graft.SparkSpec

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct stays within its configured relative error") {
    val out = graft.packs.RelationalOps.approxDistinctRaw(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (flag, approx, exact) =>
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr < 0.1, s"$flag: approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("percentiles_approx: sketch lands inside the ±1% rank window of the exact side") {
    val out = graft.packs.RelationalOps.percentilesApprox(spark, sf)
      .as[(String, Double, Double, Boolean, Boolean, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (seg, p50, p95, ok50, ok95, n) =>
      assert(ok50, s"$seg: approx p50 outside exact [p49,p51] (n=$n)")
      assert(ok95, s"$seg: approx p95 outside exact [p94,p96] (n=$n)")
      assert(p50 > 0 && p95 >= p50, s"$seg: exact quantiles inconsistent p50=$p50 p95=$p95")
    }
  }

  test("percentiles_approx agrees with percentiles on the shared exact columns") {
    val exact = graft.packs.RelationalOps.percentiles(spark, sf)
      .select("c_mktsegment", "p50_cents", "p95_cents", "n")
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val twin = graft.packs.RelationalOps.percentilesApprox(spark, sf)
      .select("c_mktsegment", "p50_cents", "p95_cents", "n")
      .as[(String, Double, Double, Long)].collect()
    assert(twin.nonEmpty && twin.length == exact.size)
    twin.foreach { case (seg, p50, p95, n) =>
      assert(exact(seg) == ((p50, p95, n)),
        s"$seg: twin exact side ${(p50, p95, n)} != ${exact(seg)}")
    }
  }
}
