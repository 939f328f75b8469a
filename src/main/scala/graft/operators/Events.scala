package graft.operators

import graft.core.{Fns, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table, in batch form.
  * The same aggregations run as a Structured Streaming job in
  * [[graft.streaming.EventStream]]; StreamingSpec asserts
  * batch ≡ streaming on the same input.
  *
  * Output timestamps are formatted strings (engine-neutral; raw
  * timestamp hashing across engines is a precision trap — the source
  * is nanosecond parquet, Spark truncates to micros).
  */
object Events {

  /** Hourly tumbling-window counts + value totals per event type. */
  def hourlyStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00")
          .as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        Fns.moneySum(col("value")).cast("double").as("total_value"))
      .orderBy("hour", "event_type")

  /** qs6 — per-user trailing moving average over the last 5 events
    * (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW): the bounded-frame
    * window shape (distinct from the partition-wide sums of A1/A2 and
    * rank of A4). Determinism: frame sum through DECIMAL(18,2) (frame
    * order is pinned by (ts, event_id), but decimal addition removes
    * any doubt), count exact, final division done in double by both
    * engines.
    */
  def movingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        (sum(col("value").cast(Fns.Money)).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("avg5"))
      .orderBy("user_id", "ts_s", "event_id")
  }

  /** Gap-based sessionization (30-minute inactivity gap): the batch
    * formulation of a session window — lag + cumulative sum of
    * session-start flags per user. Deterministic tie-break on
    * event_id for equal timestamps.
    */
  def sessionize(s: SparkSession, dir: String,
                 gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull, 1)
          .when(unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))
            > gapMinutes * 60L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        Fns.moneySum(col("value")).cast("double").as("session_value"))
      .withColumn("session_id", col("session_id").cast("int"))
      .orderBy("user_id", "session_id")
  }

  /** JSON property extraction from the `props` column. */
  def propsExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  /** Exact value percentiles per event type (sort-based exact
    * percentile, not the approximate sketch — the oracle needs exact;
    * swap for percentile_approx at 100 TB where a t-digest is the
    * right tool).
    */
  def valuePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5D)").as("med"),
        expr("percentile(value, 0.95D)").as("p95"))
      .orderBy("event_type")

  /** qx11 — qs4's top-spenders result computed through the typed
    * [[graft.functions.TopKAggregator]] instead of a rank window: one
    * partial/final object-hash aggregate keeps only the k best
    * (user, spend) pairs per group at EVERY stage — no per-group sort
    * and no shuffle of losing rows, the right top-k shape when groups
    * are huge (the window form first shuffles every user's row to its
    * event_type partition, then sorts the whole partition). Ranks are
    * reconstructed with a rank() window over the ≤ k surviving rows
    * per type (tiny), so tie semantics match the shared qs4 oracle.
    * Caveat (documented, not hit on the gate corpora): a spend tie
    * crossing the k boundary admits > k rows under rank() but is
    * truncated to k here.
    */
  def topSpendersTyped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val spend = Tables.events(s, dir)
      .groupBy("event_type", "user_id")
      .agg(Fns.moneySum(col("value")).cast("double").as("spend"))
      .as[(String, Long, Double)]
    val top = spend.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKAggregator(5).toColumn.name("topk"))
      .toDF("event_type", "topk")
    val w = Window.partitionBy("event_type")
      .orderBy(col("spend").desc, col("user_id"))
    top.select(col("event_type"), explode(col("topk")).as("kv"))
      .select(col("event_type"), col("kv._1").as("user_id"),
        col("kv._2").as("spend"))
      .withColumn("rnk", rank().over(w).cast("int"))
      .select("event_type", "user_id", "rnk", "spend")
      .orderBy("event_type", "rnk", "user_id")
  }

  /** Top-5 users by spend per event type — groupBy + rank window
    * composition on the events stream table.
    */
  def topSpenders(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.events(s, dir)
      .groupBy("event_type", "user_id")
      .agg(Fns.moneySum(col("value")).as("spend_dec"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("spend_dec").desc, col("user_id"))
    spend.withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 5)
      .select(col("event_type"), col("user_id"), col("rnk"),
        col("spend_dec").cast("double").as("spend"))
      .orderBy("event_type", "rnk", "user_id")
  }
}
