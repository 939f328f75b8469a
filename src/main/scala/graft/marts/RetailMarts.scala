package graft.marts

import graft.core.Fns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's two data marts over the *enriched* retail fact
  * (DimensionEnricher output).
  *
  * Both marts exist in two provably-equal forms:
  *  - `…Literal` — the reference's windowed-sum + distinct shape
  *    (customer_mart_sql_tranform_write.py:10-19,
  *    sales_mart_sql_transform_write.py:9-16), kept for parity;
  *  - the canonical groupBy form — one partial/final hash aggregate,
  *    one shuffle, the form to run at scale (SURVEY.md §4.1 calls the
  *    literal form a pessimization: extra Window exchange + distinct
  *    aggregate).
  * MartsSpec asserts literal ≡ canonical.
  */
object RetailMarts {

  private val monthCol = Fns.monthKey(col("sales_date")).as("sales_date_month")

  /** Customer mart, canonical: per-customer-per-month totals
    * (F5 schema: customer_id, full_name, address, phone_number,
    * sales_date_month, total_sales).
    */
  def customerMart(enriched: DataFrame): DataFrame =
    enriched
      .withColumn("sales_date_month", Fns.monthKey(col("sales_date")))
      .withColumn("full_name",
        concat(col("first_name"), lit(" "), col("last_name")))
      .groupBy("customer_id", "full_name", "address", "phone_number",
        "sales_date_month")
      .agg(sum(col("total_cost")).cast(Fns.Money).as("total_sales"))

  /** Customer mart, literal reference shape: windowed sum + distinct
    * (customer_mart_sql_tranform_write.py:10-19).
    */
  def customerMartLiteral(enriched: DataFrame): DataFrame = {
    val w = Window.partitionBy("customer_id", "sales_date_month")
    enriched
      .withColumn("sales_date_month", Fns.monthKey(col("sales_date")))
      .withColumn("total_sales", sum(col("total_cost")).over(w).cast(Fns.Money))
      .select(col("customer_id"),
        concat(col("first_name"), lit(" "), col("last_name")).as("full_name"),
        col("address"), col("phone_number"), col("sales_date_month"),
        col("total_sales"))
      .distinct()
  }

  /** Sales mart, canonical: store×person×month totals + rank-1
    * incentive of 1%, rounded to 2dp (F5 schema; rank not row_number
    * so ties all earn incentive — SURVEY.md §7.4).
    */
  def salesMart(enriched: DataFrame): DataFrame = {
    val grouped = enriched
      .withColumn("sales_month", Fns.monthKey(col("sales_date")))
      .withColumn("full_name", concat(col("sales_person_first_name"),
        lit(" "), col("sales_person_last_name")))
      .groupBy("store_id", "sales_person_id", "full_name", "sales_month")
      .agg(sum(col("total_cost")).cast(Fns.Money).as("total_sales"))
    val w = Window.partitionBy("store_id", "sales_month")
      .orderBy(col("total_sales").desc)
    grouped
      .withColumn("rnk", rank().over(w))
      .withColumn("incentive",
        when(col("rnk") === 1, round(col("total_sales") * lit(0.01), 2))
          .otherwise(lit(0.0)).cast(Fns.Money))
      .drop("rnk")
  }

  /** Sales mart, literal reference shape: window-sum + distinct, then
    * the rank window (sales_mart_sql_transform_write.py:8-28).
    */
  def salesMartLiteral(enriched: DataFrame): DataFrame = {
    val wSum = Window.partitionBy("store_id", "sales_person_id", "sales_month")
    val base = enriched
      .withColumn("sales_month", Fns.monthKey(col("sales_date")))
      .withColumn("total_sales",
        sum(col("total_cost")).over(wSum).cast(Fns.Money))
      .select(col("store_id"), col("sales_person_id"),
        concat(col("sales_person_first_name"), lit(" "),
          col("sales_person_last_name")).as("full_name"),
        col("sales_month"), col("total_sales"))
      .distinct()
    val wRank = Window.partitionBy("store_id", "sales_month")
      .orderBy(col("total_sales").desc)
    base
      .withColumn("rnk", rank().over(wRank))
      .withColumn("incentive",
        when(col("rnk") === 1, round(col("total_sales") * lit(0.01), 2))
          .otherwise(lit(0.0)).cast(Fns.Money))
      .drop("rnk")
  }
}
