package graft

import graft.operators.Events
import graft.streaming.EventStream
import org.apache.spark.sql.functions.col

class StreamingSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("streaming hourly stats (AvailableNow) equals the batch result") {
    val batch = Events.hourlyStats(spark, sf)
      .collect().map(_.mkString("|")).toSet
    // file stream sources need a directory; stage the events file the
    // way the reference's landing prefix would receive it
    val landing = tempDir("stream_events_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(landing, "events.parquet"))
    val streamed = EventStream.hourlyStatsAvailableNow(
      spark, landing, "stream_hourly_test")
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }

  test("streaming dedup with watermark equals batch distinct") {
    val landing = tempDir("dedup_events_")
    // two copies of the same file -> every event is duplicated
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(landing, "a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(landing, "b.parquet"))
    val streamed = EventStream.dedupAvailableNow(
      spark, landing, "stream_dedup_test")
    val expected = graft.core.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type")
    assert(streamed.count() == expected.count())
    assert(streamed.exceptAll(expected).count() == 0)
  }

  test("streaming stream-static segment spend equals the batch join+groupBy") {
    val landing = tempDir("segment_events_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(landing, "events.parquet"))
    val customers = graft.core.Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment")
    val streamed = EventStream.segmentSpendAvailableNow(
      spark, landing, customers, "stream_segment_test")
      .collect().map(_.mkString("|")).toSet
    val batch = graft.core.Tables.events(spark, sf)
      .join(customers, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        graft.core.Fns.moneySum(col("value")).cast("double").as("total_value"))
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }

  test("stream-stream click attribution: window boundaries are [c_ts, c_ts + 30 min]") {
    import spark.implicits._
    val t0 = java.time.Instant.parse("2024-01-01T10:00:00Z")
    def nanos(plusSec: Long): Long =
      (t0.getEpochSecond + plusSec) * 1000000000L
    // schema mirrors the testdata events table: ts as NANOS long
    val landing = tempDir("attrib_events_")
    Seq(
      (100L, nanos(0), 1L, "click", 0.0, "{}"),
      (200L, nanos(-1), 1L, "purchase", 1.0, "{}"),   // before click: out
      (201L, nanos(0), 1L, "purchase", 1.0, "{}"),    // same second: in
      (202L, nanos(1800), 1L, "purchase", 1.0, "{}"), // exactly +30min: in
      (203L, nanos(1801), 1L, "purchase", 1.0, "{}"), // +30min+1s: out
      (204L, nanos(60), 2L, "purchase", 1.0, "{}"))   // other user: out
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$landing/batch1")
    val got = EventStream.clickAttributionAvailableNow(
      spark, s"$landing/batch1", "stream_attrib_test")
      .collect().map(r => (r.getAs[Long]("click_id"),
        r.getAs[Long]("purchase_id"))).toSet
    assert(got == Set((100L, 201L), (100L, 202L)),
      s"attribution window must be inclusive [c_ts, c_ts+30min]: $got")
  }

  test("stream-stream attribution equals the batch interval join on real data") {
    val landing = tempDir("attrib_real_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(landing, "events.parquet"))
    val streamed = EventStream.clickAttributionAvailableNow(
      spark, landing, "stream_attrib_real")
      .collect().map(_.mkString("|")).toSet
    val ev = graft.core.Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batch = c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + org.apache.spark.sql.functions
          .expr("INTERVAL 30 MINUTES"))
      .select("click_id", "purchase_id", "user_id")
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }

  test("foreachBatch sink is idempotent: reprocessing lands on the same dirs") {
    val landing = tempDir("fb_events_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(landing, "events.parquet"))
    val out = tempDir("fb_out_")
    val first = EventStream.foreachBatchSink(spark, landing, out)
      .collect().map(_.mkString("|")).toSet
    // a full reprocess (fresh checkpoint, same input) must overwrite
    // the same batch=<id> dirs, not append duplicates
    val second = EventStream.foreachBatchSink(spark, landing, out)
      .collect().map(_.mkString("|")).toSet
    assert(first == second)
    val batch = graft.core.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
      .collect().map(_.mkString("|")).toSet
    assert(first == batch)
  }

  test("sessionize: sessions respect the inactivity gap") {
    import spark.implicits._
    val sessions = Events.sessionize(spark, sf).cache()
    // session ids are dense per user starting at 1
    val perUser = sessions.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.min("session_id").as("mn"),
        org.apache.spark.sql.functions.max("session_id").as("mx"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
    perUser.foreach { r =>
      assert(r.getAs[Int]("mn") == 1)
      assert(r.getAs[Int]("mx").toLong == r.getAs[Long]("n"))
    }
    // total events conserved
    val total = sessions.agg(
      org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    // via Tables.events (scoped nanos conf) — the raw read only worked
    // here while EventStream leaked the session-global conf, which it
    // no longer does
    assert(total == graft.core.Tables.events(spark, sf).count())
    // no session spans a gap: start of session k+1 is > end of session k
    val spans = sessions.select("user_id", "session_id", "session_start",
      "session_end").as[(Long, Int, String, String)]
      .collect().groupBy(_._1)
    spans.values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._3)
        case _ =>
      }
    }
  }
}
