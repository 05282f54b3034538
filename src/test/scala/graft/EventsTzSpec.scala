package graft

import org.apache.spark.sql.functions._

/** Tables.events must yield the SAME instants in every session
  * timezone: the stored wall clocks are UTC, and the normalization
  * pins that interpretation in the expression itself rather than
  * assuming (or mutating) the session zone. */
class EventsTzSpec extends SparkSpec {

  test("event instants are session-timezone independent") {
    val tzKey = "spark.sql.session.timeZone"
    val original = spark.conf.get(tzKey)
    val utcReads = Tables.events(spark, sf)
      .select(unix_micros(col("ts"))).limit(50)
      .collect().map(_.getLong(0)).sorted.toSeq
    try {
      spark.conf.set(tzKey, "America/New_York")
      val shifted = Tables.events(spark, sf)
        .select(unix_micros(col("ts"))).limit(50)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(shifted == utcReads,
        "a non-UTC session must read the identical epoch instants")
      assert(spark.conf.get(tzKey) == "America/New_York",
        "the reader must not mutate the caller's session timezone")
    } finally spark.conf.set(tzKey, original)
  }
}
