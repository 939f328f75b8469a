package graft.streaming

import graft.core.Fns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming versions of the event analytics — the
  * incremental path for the same semantics as
  * [[graft.operators.Events]] (SURVEY.md §2.8: the reference is
  * batch-only with a file lifecycle; `Trigger.AvailableNow` over a
  * file source reproduces exactly that consume-what's-there model,
  * and the same code keeps running when files keep arriving).
  *
  * Watermarking: event-time with a 1-hour allowance; at
  * AvailableNow-drain semantics the watermark only matters for state
  * cleanup, so batch ≡ streaming results (asserted in StreamingSpec
  * with the complete output mode).
  */
object EventStream {

  /** Streaming hourly stats over a parquet events directory; drains
    * everything available, writes to an in-memory table, returns the
    * result. Production callers would swap the sink and trigger.
    */
  def hourlyStatsAvailableNow(spark: SparkSession, eventsDir: String,
                              queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        Fns.moneySum(col("value")).cast("double").as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"), col("n"), col("total_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming exact dedup: `dropDuplicates` keyed on `event_id` with
    * an event-time watermark bounding the dedup state (late
    * duplicates beyond 1 hour age out — at 100 TB/day unbounded
    * dedup state is the thing that kills streaming jobs).
    */
  def dedupAvailableNow(spark: SparkSession, eventsDir: String,
                        queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
