package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("as-of join picks latest build row at-or-before probe, per key") {
    val quotes = Seq(
      ("u1", ts(10), 1.0),
      ("u1", ts(20), 2.0),
      ("u1", ts(30), 3.0),
      ("u2", ts(15), 9.0)
    ).toDF("user_id", "ts", "value")
    val trades = Seq(
      ("u1", ts(5), 100L),   // before any quote → null
      ("u1", ts(20), 101L),  // equal ts → inclusive, takes 2.0
      ("u1", ts(25), 102L),  // between → 2.0
      ("u1", ts(99), 103L),  // after all → 3.0
      ("u2", ts(16), 104L),  // other key → 9.0
      ("u3", ts(50), 105L)   // key with no quotes → null
    ).toDF("user_id", "ts", "event_id")

    val out = AsOfJoin.asOf(trades, quotes, "user_id", "ts", "value")
      .select("event_id", "asof_value")
      .as[(Long, Option[Double])].collect().toMap

    assert(out(100L).isEmpty)
    assert(out(101L).contains(2.0))
    assert(out(102L).contains(2.0))
    assert(out(103L).contains(3.0))
    assert(out(104L).contains(9.0))
    assert(out(105L).isEmpty)
  }
}
