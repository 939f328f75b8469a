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
