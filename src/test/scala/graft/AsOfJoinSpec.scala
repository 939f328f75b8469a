package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of: latest right value at or before each left row") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:30:00")),
      (3L, "u1", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "u2", ts("2024-01-01 12:00:00")),
      (5L, "u1", ts("2024-01-01 10:15:00"))  // exactly at a right ts
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 10.0),
      ("u1", ts("2024-01-01 10:15:00"), 20.0),
      ("u2", ts("2024-01-01 11:00:00"), 99.0)
    ).toDF("k", "rt", "v")

    val out = AsOfJoin.backward(left, right, "k", "t", "rt", "v")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble))
      .toMap
    assert(out(1L).contains(10.0))  // 10:00 -> 09:30 row
    assert(out(2L).contains(20.0))  // 10:30 -> 10:15 row
    assert(out(3L).isEmpty)         // nothing at or before 09:00
    assert(out(4L).contains(99.0))
    assert(out(5L).contains(20.0))  // inclusive match at equal ts
  }

  test("as-of output joins every left row exactly once") {
    val sf = "/root/testdata/sf0.001"
    val out = AsOfJoin.eventAsOf(spark, sf)
    val clicks = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "click")
    assert(out.count() == clicks.count())
    assert(out.select("event_id").distinct().count() == clicks.count())
  }
}
