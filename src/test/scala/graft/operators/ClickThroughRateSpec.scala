package graft.operators

import graft.SparkSpec

class ClickThroughRateSpec extends SparkSpec {
  import spark.implicits._

  private def imps(rows: (String, Long, String)*) =
    rows.toDF("impression_id", "impression_time_ms", "ad_id")

  private def clks(rows: (String, Long, String)*) =
    rows.toDF("impression_id", "click_time_ms", "click_id")

  test("join matches within ±60s inclusive, null-extends outside") {
    val i = imps(
      ("i1", 100000L, "a1"), // click at exactly +60s → match (inclusive)
      ("i2", 100000L, "a1"), // click at +61s → no match
      ("i3", 100000L, "a2")) // no click at all
    val c = clks(
      ("i1", 160000L, "c1"),
      ("i2", 161001L, "c2"))
    val out = ClickThroughRate.joinImpressionsClicks(i, c)
      .select("impression_id", "was_clicked")
      .as[(String, Boolean)].collect().toMap
    assert(out == Map("i1" -> true, "i2" -> false, "i3" -> false))
  }

  test("duplicate clicks on one impression emit one joined row each") {
    val i = imps(("i1", 100000L, "a1"))
    val c = clks(("i1", 110000L, "c1"), ("i1", 120000L, "c2"))
    val out = ClickThroughRate.joinImpressionsClicks(i, c)
    assert(out.count() == 2)
  }

  test("faithful A6/A7 quirks: clicked rows excluded from num_impressions; all-clicked ad → Infinity") {
    val i = imps(("i1", 0L, "ad"), ("i2", 0L, "ad"))
    val c = clks(("i1", 1000L, "c1"), ("i2", 2000L, "c2"))
    val out = ClickThroughRate.ctrByAd(i, c).collect().head
    assert(out.getAs[Long]("num_impressions") == 0L)
    assert(out.getAs[Long]("num_clicks") == 2L)
    assert(out.getAs[Double]("ctr").isInfinity) // faithful quirk
    assert(out.getAs[Double]("ctr_corrected") == 1.0)
  }

  test("zero clicks → ctr 0.0 (faithful guard)") {
    val i = imps(("i1", 0L, "ad"))
    val out = ClickThroughRate.ctrByAd(i, clks()).collect().head
    assert(out.getAs[Double]("ctr") == 0.0)
    assert(out.getAs[Double]("ctr_corrected") == 0.0)
  }
}
