package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed range join: `left.t - right.t ∈ [0, windowSec]` per key.
  * A naive inequality join planes as a nested-loop/cartesian per key
  * in Spark; instead, bucket time into `windowSec`-wide chunks — a
  * right row at time r can only match left rows in chunk(r) or
  * chunk(r)+1, so replicating each right row into those two buckets
  * turns the range predicate into ONE hash equi-join on
  * (key, bucket) plus an exact residual filter. The standard
  * interval-join shape at scale (bounded 2x replication, no
  * quadratic blowup).
  */
object RangeJoin {

  /** Count right events in the `windowSec` seconds at or before each
    * left event, per key. Left/right frames need (idCol, keyCol,
    * timeCol as epoch-seconds long).
    */
  def countPreceding(left: DataFrame, right: DataFrame, keyCol: String,
                     timeCol: String, idCol: String,
                     windowSec: Long): DataFrame = {
    val l = left.select(col(idCol).as("_lid"), col(keyCol).as("_k"),
      col(timeCol).as("_lt"))
      .withColumn("_bucket", floor(col("_lt") / windowSec))
    val r = right.select(col(keyCol).as("_k"), col(timeCol).as("_rt"))
      .withColumn("_bucket", explode(array(
        floor(col("_rt") / windowSec),
        floor(col("_rt") / windowSec) + 1)))
    l.join(r, Seq("_k", "_bucket"), "left")
      .withColumn("_hit",
        col("_rt").isNotNull &&
          col("_rt") <= col("_lt") &&
          col("_rt") > col("_lt") - windowSec)
      .groupBy(col("_lid").as(idCol))
      .agg(sum(when(col("_hit"), 1).otherwise(0)).cast("long").as("n_in_window"))
  }

  /** Declared query: for each 'error' event, how many 'click' events
    * the same user produced in the preceding 5 minutes (exclusive of
    * older, inclusive of simultaneous).
    */
  def errorClickBurst(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("epoch", unix_timestamp(col("ts")))
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "epoch")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "epoch")
    countPreceding(errors, clicks, "user_id", "epoch", "event_id", 300L)
      .orderBy("event_id")
  }
}
