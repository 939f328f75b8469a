package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table profiling: per-column (non-null count, exact distinct
  * count, min, max) — the ANALYZE / data-quality primitive every
  * warehouse load runs before trusting a new drop (the reference
  * validates its loads by eyeballing `show()` output, e.g.
  * /root/reference/src/main/transformations/jobs/main.py; this is
  * that check made exact, per column, and cheap).
  *
  * Shape: TWO scans, deliberately. A single combined agg would be
  * one scan, but Spark plans N exact distinct-counts via Expand and
  * the string-typed min/max buffers then force SortAggregate on the
  * expanded stage — three full sorts of N× the table (measured 3.1 s
  * vs 1.1 s at sf0.1; at 100 TB a sort of 6× the data is the
  * difference between a profile and a batch job). Splitting keeps
  * every stage sort-free:
  *   - pass 1 (count + exact NDV): all aggregate buffers are longs,
  *     so the Expand distinct stage stays HashAggregate; what
  *     crosses the exchange is per-(column, value) partial state.
  *   - pass 2 (min/max): no distinct, no grouping keys — partial
  *     min/max per partition, one row per partition merged on the
  *     driver side of a single tiny exchange. String buffers cost
  *     nothing without grouping keys (keyless SortAggregate does not
  *     sort).
  * The two 1-row results reshape via `stack` (1×kN → N×k,
  * driver-trivial) and join on col_name — N rows, broadcast.
  *
  * min/max are computed on the TYPED column and stringified only at
  * the end — stringify-then-min would compare lexicographically and
  * call "10" < "9". Exact NDV is the audit-time contract; for
  * routine 100 TB profiling swap `approx_count_distinct` (drops the
  * Expand entirely — the qd8 precedent, error contract spec'd in
  * SketchSpec).
  */
object Profile {

  /** One profiled column: name plus the string rendering of its
    * min/max (applied AFTER the typed aggregate, so it never affects
    * ordering; must be deterministic cross-engine — money through
    * DECIMAL(18,2), timestamps through the canonical format).
    */
  case class ColSpec(name: String, render: Column => Column)

  def profile(df: DataFrame, cols: Seq[ColSpec]): DataFrame = {
    val ndvAggs = cols.flatMap { cs =>
      val c = col(cs.name)
      Seq(count(c).as(s"${cs.name}__n"),
        count_distinct(c).as(s"${cs.name}__ndv"))
    }
    val mmAggs = cols.flatMap { cs =>
      val c = col(cs.name)
      Seq(cs.render(min(c)).cast("string").as(s"${cs.name}__min"),
        cs.render(max(c)).cast("string").as(s"${cs.name}__max"))
    }
    val counts = df.agg(ndvAggs.head, ndvAggs.tail: _*)
      .select(expr(s"stack(${cols.size}, " +
        cols.map(cs => s"'${cs.name}', ${cs.name}__n, ${cs.name}__ndv")
          .mkString(", ") + ") as (col_name, n_nonnull, ndv)"))
    val minmax = df.agg(mmAggs.head, mmAggs.tail: _*)
      .select(expr(s"stack(${cols.size}, " +
        cols.map(cs => s"'${cs.name}', ${cs.name}__min, ${cs.name}__max")
          .mkString(", ") + ") as (col_name, min_val, max_val)"))
    counts.join(minmax, "col_name")
  }

  /** qp6 declared form: profile the orders table. */
  def ordersProfile(s: SparkSession, dir: String): DataFrame = {
    val ident = (c: Column) => c
    val money = (c: Column) => c.cast("decimal(18,2)")
    val ts = (c: Column) => date_format(c, "yyyy-MM-dd HH:mm:ss")
    profile(Tables.orders(s, dir), Seq(
      ColSpec("o_orderkey", ident),
      ColSpec("o_custkey", ident),
      ColSpec("o_orderstatus", ident),
      ColSpec("o_totalprice", money),
      ColSpec("o_orderdate", ts),
      ColSpec("o_orderpriority", ident)))
      .orderBy("col_name")
  }
}
