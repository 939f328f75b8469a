package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: turn a change
  * log (one row per observed state) into validity intervals —
  * `valid_from` = the change timestamp, `valid_to` = the next change
  * for the same key (open intervals closed with a far-future
  * sentinel), `is_current` on the last version. The standard
  * warehouse shape the reference's retail star schema implies but
  * never materializes (its dims are overwrite-only; see
  * /root/reference/src/main/transformations/jobs/main.py dimension
  * loads).
  *
  * One shuffle on the dimension key, then a single window pass
  * computing row_number + lead over the same (partition, order) —
  * Spark plans both functions in ONE Window operator, so there is no
  * second sort. At 100 TB-scale dimension logs this is the minimal
  * plan: exchange + sort + linear scan per key group.
  */
object Scd2 {

  /** Generic history build over any change-log frame. Ties on
    * `orderCol` are broken by `tieCol` so the interval chain is
    * deterministic.
    */
  def history(df: DataFrame, keyCol: String, orderCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol), col(tieCol))
    df.withColumn("version", row_number().over(w))
      .withColumn("_next", lead(col(orderCol), 1).over(w))
      .withColumn("valid_from",
        date_format(col(orderCol), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("valid_to",
        coalesce(date_format(col("_next"), "yyyy-MM-dd HH:mm:ss"),
          lit("9999-12-31 00:00:00")))
      .withColumn("is_current", col("_next").isNull)
      .drop("_next")
  }

  /** qx14 declared form: customer purchase-state history from the
    * orders change log (each order observes a new (status, total)
    * state for its customer).
    */
  def customerHistory(s: SparkSession, dir: String): DataFrame =
    history(Tables.orders(s, dir), "o_custkey", "o_orderdate", "o_orderkey")
      .select(col("o_custkey").as("cust"), col("version"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("total"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy("cust", "version")
}
