package graft

import graft.operators.Relational

/** Plan-shape regression tests: the scale properties we audited by
  * hand (pushdown, pruning, broadcast joins, top-k without full
  * sort) asserted against the optimized physical plan, so a future
  * refactor can't silently regress them.
  */
class PlanSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02: filter is pushed into the parquet scan") {
    val p = plan(Relational.q02(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity"))
  }

  test("q02: scan reads only the three projected columns") {
    val p = plan(Relational.q02(spark, sf))
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_extendedprice") && !read.contains("l_shipdate"))
  }

  test("q04: all three dimension joins are broadcast, fact streams") {
    val p = plan(Relational.q04(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q12: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.q12(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q06: aggregation is partial+final (map-side combine present)") {
    val p = plan(Relational.q06(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("qd1: dedup window group-limit prunes before the shuffle") {
    val p = plan(graft.operators.TrainingOps.dedupExact(spark, sf))
    assert(p.contains("WindowGroupLimit"))
  }
}
