package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join counts rows in (t-w, t] per key") {
    // window 100s; crafted to cross bucket boundaries both ways
    val left = Seq(
      (1L, "k1", 1000L), // clicks at 905..1000 count
      (2L, "k1", 1099L),
      (3L, "k2", 500L),
      (4L, "k3", 250L)   // no clicks for k3
    ).toDF("event_id", "k", "t")
    val right = Seq(
      ("k1", 900L),  // in (900,1000]? 900 > 1000-100=900 false -> excluded
      ("k1", 901L),  // in for left 1
      ("k1", 1000L), // inclusive for left 1, in for left 2
      ("k1", 1099L), // for left 2 only
      ("k1", 800L),  // too old for both
      ("k2", 499L),  // in for left 3
      ("k2", 501L)   // after left 3 -> excluded
    ).toDF("k", "t")
    val out = RangeJoin
      .countPreceding(left, right, "k", "t", "event_id", 100L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("n_in_window")).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("bucketed result equals the naive inequality join on real data") {
    val sf = "/root/testdata/sf0.001"
    val fast = RangeJoin.errorClickBurst(spark, sf)
    val ev = graft.core.Tables.events(spark, sf)
      .withColumn("epoch", org.apache.spark.sql.functions.unix_timestamp(
        org.apache.spark.sql.functions.col("ts")))
    ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"epoch").createOrReplaceTempView("rj_e")
    ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"epoch".as("ce")).createOrReplaceTempView("rj_c")
    val naive = spark.sql(
      """SELECT e.event_id, count(c.ce) AS n_in_window
        |FROM rj_e e LEFT JOIN rj_c c ON c.cu = e.user_id
        |  AND c.ce <= e.epoch AND c.ce > e.epoch - 300
        |GROUP BY 1 ORDER BY e.event_id""".stripMargin)
    assert(fast.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(fast).count() == 0)
  }
}
