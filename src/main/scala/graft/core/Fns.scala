package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared column helpers that keep results deterministic across
  * engines (the DuckDB oracle hash-compares values).
  *
  * Money rule: never sum raw doubles — parallel double reduction is
  * order-dependent, so Spark and DuckDB could disagree in the last
  * ULP. Instead cast to DECIMAL(18,2) first (exact integer
  * arithmetic, any summation order), sum, and cast the exact result
  * back to double at the boundary. Mirrors SURVEY.md §7.4 ("float vs
  * decimal money", reference main.py:229-231 vs table_scripts.sql:147).
  */
object Fns {
  val Money: DecimalType = DecimalType(18, 2)

  /** Exact money sum: decimal in, decimal out (rounding-free). */
  def moneySum(c: Column): Column = sum(c.cast(Money))

  /** 'YYYY-MM' month key via the reference's substring-over-date
    * idiom (customer_mart_sql_tranform_write.py:11-12); cast made
    * explicit for ANSI mode per SURVEY.md §7.4.
    */
  def monthKey(c: Column): Column =
    substring(c.cast(DateType).cast(StringType), 1, 7)
}
