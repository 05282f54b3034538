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
}
