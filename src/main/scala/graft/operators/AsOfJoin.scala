package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the value of the latest
  * right row with the same key and `rightTime <= leftTime`. Spark has
  * no native as-of operator; per the extension ladder this composes
  * built-ins (preference (a)): union both sides tagged, one window
  * pass with `last(value, ignoreNulls=true)` ordered so right rows at
  * equal timestamps sort before left rows (inclusive match), then
  * keep the left rows.
  *
  * Scale shape: ONE shuffle (window partition by key), no join at
  * all — the classic sort-merge as-of without a custom SparkPlan.
  * Right rows with duplicate (key, time) must be pre-aggregated by
  * the caller if a deterministic value is required (see
  * [[eventAsOf]]).
  */
object AsOfJoin {

  /** left(keyCol, leftTimeCol, ...), right(keyCol, rightTimeCol,
    * valueCol) -> left columns + `asof_value` (null when no prior
    * right row exists).
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               leftTimeCol: String, rightTimeCol: String,
               valueCol: String): DataFrame = {
    val leftCols = left.columns
    val lTagged = left
      .withColumn("_t", col(leftTimeCol))
      .withColumn("_is_right", lit(0))
      .withColumn("_v", lit(null).cast(right.schema(valueCol).dataType))
    val rTagged = right
      .select(col(keyCol), col(rightTimeCol).as("_t"),
        col(valueCol).as("_v"))
      .withColumn("_is_right", lit(1))
    // align schemas for a by-name union
    val rAligned = lTagged.columns.foldLeft(rTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lTagged.schema(c).dataType))
    }.select(lTagged.columns.map(col).toIndexedSeq: _*)

    // right rows sort before left at equal _t => inclusive (<=) match
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_t").asc, col("_is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rAligned)
      .withColumn("asof_value", last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_is_right") === 0)
      .select(leftCols.map(col).toIndexedSeq :+ col("asof_value"): _*)
  }

  /** Declared query: every 'click' event joined as-of to the user's
    * most recent 'purchase' value at or before it. Right side is
    * pre-aggregated to unique (user, ts) with max(value) so the
    * matched value is well-defined under timestamp ties.
    */
  def eventAsOf(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max(col("value").cast("decimal(18,2)")).as("pval"))
    // no-prior-purchase -> -1.0 (not NULL) so the oracle hash compare
    // never depends on engine NULL/NaN encodings
    backward(clicks, purchases, "user_id", "ts", "ts", "pval")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        coalesce(col("asof_value").cast("double"), lit(-1.0))
          .as("last_purchase"))
      .orderBy("event_id")
  }
}
