package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The shared testdata's `events.ts` parquet encoding has flipped
  * between TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across corpus
  * regenerations (round 6 lost 37 queries to a hard-coded nanos
  * shim). `Tables.normalizeTs` must load every encoding it can meet:
  *
  *  - nanos: decodes as LongType under the scoped nanosAsLong conf
  *    (simulated here by writing a raw INT64 `ts` — the decoded
  *    schema, which is all the dispatch sees, is identical);
  *  - micros, isAdjustedToUTC=false: decodes as TIMESTAMP_NTZ;
  *  - micros adjusted / session-zone timestamps: TimestampType.
  *
  * All three must come out as the SAME TimestampType instants.
  */
class EventsEncodingSpec extends SparkSpec {

  // 2024-01-02 03:04:05.123456 UTC, in epoch micros
  private val micros = 1704164645123456L

  private def writeDir(suffix: String): String = tempDir(s"enc$suffix")

  private def load(dir: String) = Tables.events(spark, dir)

  test("nanos-long ts (legacy NANOS decode shape) truncates to micros") {
    val dir = writeDir("nanos")
    // sub-micro remainder (+789 ns) must be truncated, not rounded
    spark.range(1).select(lit(micros * 1000L + 789L).as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = load(dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).head().getLong(0) == micros)
  }

  test("micros NTZ ts casts to session-zone timestamp, same instant") {
    val dir = writeDir("ntz")
    spark.range(1).select(
        timestamp_micros(lit(micros)).cast("timestamp_ntz").as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = load(dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).head().getLong(0) == micros)
  }

  test("timestamp ts passes through unchanged") {
    val dir = writeDir("tz")
    spark.range(1).select(timestamp_micros(lit(micros)).as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = load(dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).head().getLong(0) == micros)
  }

  test("the live testdata corpus loads whatever its current encoding") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.agg(max("ts")).head().getTimestamp(0) != null)
  }
}
