package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate sketches: the 100 TB swap-ins the exact
  * declared queries document (qs5 says "swap for percentile_approx at
  * 100 TB where a t-digest is the right tool"; qd8's countDistinct
  * becomes HLL at scale). They cannot be gate queries — a sketch's
  * value depends on its implementation, so DuckDB's sketches would
  * legitimately disagree — but their ERROR CONTRACTS are exactly
  * checkable against the exact aggregates on the same data, which is
  * how a production pipeline qualifies a sketch before trusting it.
  */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct lands within its configured rsd envelope") {
    val rsd = 0.05
    val rows = graft.core.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), rsd).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      // 4x rsd: HLL++ error is a distribution, not a bound — at 4
      // sigma a false failure is ~1e-4 per group and the seed is
      // fixed, so this is deterministic in practice
      assert(math.abs(approx - exact) / exact <= 4 * rsd,
        s"${r.getAs[String]("event_type")}: approx $approx vs exact $exact")
    }
    // the sketch must also merge across partitions: global distinct
    // over a mid-cardinality key (10k event_ids, 32 partitions)
    val g = graft.core.Tables.events(spark, sf)
      .agg(countDistinct(col("event_id")).as("exact"),
        approx_count_distinct(col("event_id"), rsd).as("approx"))
      .head()
    assert(math.abs(g.getAs[Long]("approx").toDouble - g.getAs[Long]("exact"))
      / g.getAs[Long]("exact") <= 4 * rsd)
  }

  test("approx_percentile brackets between neighboring exact quantiles") {
    // accuracy 10000 on ~2k-row groups: the sketch is near-exact, but
    // the CONTRACT is only rank error <= n/accuracy — assert the
    // approx median sits between the exact p45 and p55, which holds
    // for any compliant implementation at this accuracy
    val rows = graft.core.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.45D)").as("lo"),
        expr("percentile(value, 0.55D)").as("hi"),
        expr("approx_percentile(value, 0.5D, 10000)").as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, ap) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"),
        r.getAs[Double]("approx"))
      assert(ap >= lo && ap <= hi,
        s"${r.getAs[String]("event_type")}: approx median $ap outside [$lo, $hi]")
    }
  }
}
