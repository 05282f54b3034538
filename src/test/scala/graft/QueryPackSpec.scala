package graft

/** Every registered query must run and produce rows at sf0.001, and every
  * oracle key must point at a registered query. The value-level check is
  * the driver's DuckDB compare (tools/check_oracle.py); this guards
  * plan-breaking regressions in CI. */
class QueryPackSpec extends SparkSpec {

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001 with rows > 0") {
      val df = fn(spark, sf)
      assert(df.count() > 0)
    }
  }
}
