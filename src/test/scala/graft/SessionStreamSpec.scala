package graft

import graft.operators.Events
import graft.streaming.SessionStream

class SessionStreamSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("stateful streaming sessionize equals the batch window form") {
    val landing = tempDir("sess_events_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(landing, "events.parquet"))

    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    val streamed = SessionStream
      .sessionizeAvailableNow(spark, landing, "sess_stream_test")
      .collect()
      .map { r =>
        (r.getAs[Long]("user_id"), r.getAs[Int]("session_id")) ->
          ((r.getAs[Long]("n_events"),
            fmt.format(java.time.Instant.ofEpochMilli(r.getAs[Long]("start_ms"))),
            fmt.format(java.time.Instant.ofEpochMilli(r.getAs[Long]("end_ms"))),
            r.getAs[Double]("session_value")))
      }.toMap

    val batch = Events.sessionize(spark, sf).collect()
      .map { r =>
        (r.getAs[Long]("user_id"), r.getAs[Int]("session_id")) ->
          ((r.getAs[Long]("n_events"),
            r.getAs[String]("session_start"),
            r.getAs[String]("session_end"),
            r.getAs[Double]("session_value")))
      }.toMap

    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (k, (n, s, e, v)) =>
      val (n2, s2, e2, v2) = streamed(k)
      assert(n2 == n, s"$k n_events")
      assert(s2 == s, s"$k start")
      assert(e2 == e, s"$k end")
      assert(math.abs(v2 - v) < 1e-6, s"$k value")
    }
  }
}
