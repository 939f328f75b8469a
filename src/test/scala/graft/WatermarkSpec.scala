package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Event-time watermark semantics under controlled micro-batches:
  * windows older than (max event time - watermark) must close and
  * drop later stragglers — the behavior that bounds state at 100 TB.
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("late events beyond the watermark are dropped from closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val counts = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "HH:mm").as("w"), col("n"))

    val q = counts.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName("wm_test")
      .start()
    try {
      // batch 1: two events in the 10:00 window, one at 10:25
      input.addData((ts("2024-01-01 10:01:00"), 1L),
        (ts("2024-01-01 10:05:00"), 2L), (ts("2024-01-01 10:25:00"), 3L))
      q.processAllAvailable()
      // batch 2: push max event time to 10:45 -> watermark 10:35
      // closes the 10:00 and 10:20 windows
      input.addData((ts("2024-01-01 10:45:00"), 4L))
      q.processAllAvailable()
      // batch 3: a straggler for the long-closed 10:00 window
      input.addData((ts("2024-01-01 10:03:00"), 5L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 11:30:00"), 6L))
      q.processAllAvailable()

      val out = spark.table("wm_test").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // 10:00 window emitted with exactly the 2 on-time events; the
      // late event 5 never shows up
      assert(out.get("10:00").contains(2L), s"got $out")
      assert(out.get("10:20").contains(1L), s"got $out")
    } finally q.stop()
  }
}
