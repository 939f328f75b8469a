package graft

import graft.operators.Profile
import graft.operators.Profile.ColSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Value semantics of the single-pass column profiler (qp6): null
  * handling in count/ndv, typed-then-rendered min/max, and the
  * one-scan plan shape.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  private val ident = (c: Column) => c

  test("profile counts non-nulls, exact NDV, typed min/max per column") {
    val df = Seq((Option(1L), Option("a")), (Option(1L), None),
      (Option(10L), Option("b")), (None, Option("b")))
      .toDF("num", "str")
    val got = Profile.profile(df, Seq(ColSpec("num", ident), ColSpec("str", ident)))
      .collect().map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_nonnull"), r.getAs[Long]("ndv"),
          r.getAs[String]("min_val"), r.getAs[String]("max_val")))).toMap
    // typed min/max: 10 > 9 would fail if stringified before the agg
    assert(got("num") == ((3L, 2L, "1", "10")))
    assert(got("str") == ((3L, 2L, "a", "b")))
  }

  test("profile is sort-free: hash-only NDV pass + keyless min/max pass") {
    val plan = graft.operators.Profile.ordersProfile(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 2,
      s"two deliberate scans (NDV pass + min/max pass):\n$plan")
    assert(plan.contains("Expand"),
      "exact multi-distinct plans via Expand")
    assert(plan.contains("HashAggregate"),
      "the expanded distinct stage must stay hash-based (long buffers only)")
    // the single Sort is the final orderBy(col_name) — the combined
    // single-scan form sorts the expanded table three times because
    // string min/max buffers force SortAggregate
    assert("Sort ".r.findAllIn(plan).size == 1,
      s"no sort may touch table-sized data:\n$plan")
  }
}
