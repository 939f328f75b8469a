package graft.operators

import graft.core.{Fns, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operators beyond the reference's surface (SURVEY.md §2
  * explicitly lists these as absent there): outer/semi/anti joins,
  * rollup/cube grouping sets, and intersect/except set ops. Included
  * so a user of this engine has the full relational vocabulary, each
  * oracle-backed.
  *
  * Null-ordering note: Spark sorts NULLS FIRST ascending by default,
  * DuckDB NULLS LAST — every oracle ORDER BY pins NULLS FIRST.
  */
object Extras {

  /** Left outer join: customers with and without orders; unmatched
    * rows keep NULL aggregates.
    */
  def leftJoinOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val agg = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        Fns.moneySum(col("o_totalprice")).cast("double").as("total"))
    c.join(agg, c("c_custkey") === agg("o_custkey"), "left")
      .select(c("c_custkey"), col("n_orders"), col("total"))
      .orderBy("c_custkey")
  }

  /** Left semi join: customers that have at least one order. */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left anti join: customers that never placed a 400k+ order (the
    * plain "no orders at all" variant is empty on this corpus, which
    * would make the oracle check vacuous).
    */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Rollup: order totals by (status, priority) with subtotals and a
    * grand total.
    */
  def rollupStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        Fns.moneySum(col("o_totalprice")).cast("double").as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  /** Cube over the same keys: all grouping-set combinations. */
  def cubeStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  /** Intersect: nations that have both customers and suppliers. */
  def intersectNations(s: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
    val sn = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
    cn.intersect(sn).orderBy("nk")
  }

  /** Except: nations with customers but no high-balance supplier
    * (unfiltered it is empty on this corpus — vacuous oracle).
    */
  def exceptNations(s: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
    val sn = Tables.supplier(s, dir).filter(col("s_acctbal") > 8000)
      .select(col("s_nationkey").as("nk"))
    cn.except(sn).orderBy("nk")
  }
}
