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

  test("raw int64 MICROS ts (future regeneration shape) dispatches by magnitude") {
    // the long branch must not assume nanos: |ts| < 1e17 is epoch
    // micros (nanos post-1973 exceed 1e17), decoded without the /1000
    val dir = writeDir("rawmicros")
    spark.range(1).select(lit(micros).as("ts"), lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = load(dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).head().getLong(0) == micros)
  }

  test("micros NTZ ts loads as session-zone timestamp, same instant") {
    // NOTE: a SPARK-written parquet embeds the catalyst schema in the
    // footer metadata, so the reader recovers TIMESTAMP_NTZ from there
    // and the scoped inferTimestampNTZ=false never applies — this file
    // exercises normalizeTs' NTZ-cast fallback. The pyarrow-written
    // live corpus has no such metadata, so it takes the native-read
    // path (asserted on the live-corpus test below).
    val dir = writeDir("ntz")
    spark.range(1).select(
        timestamp_micros(lit(micros)).cast("timestamp_ntz").as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = load(dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).head().getLong(0) == micros)
  }

  test("normalizeTs still casts an NTZ frame read outside the scope") {
    val dir = writeDir("ntz2")
    spark.range(1).select(
        timestamp_micros(lit(micros)).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType != TimestampType)
    val norm = Tables.normalizeTs(raw)
    assert(norm.schema("ts").dataType == TimestampType)
    assert(norm.select(unix_micros(col("ts"))).head().getLong(0) == micros)
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
    // when the corpus is micros-encoded (pyarrow-written, no catalyst
    // footer metadata), the scoped inferTimestampNTZ=false read makes
    // ts a NATIVE scan column — no per-row cast in any events plan
    val rawType = Tables.withEventReadConfs(spark) {
      spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .schema("ts").dataType
    }
    if (rawType == TimestampType) {
      val plan = ev.queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("cast(ts"),
        s"micros corpus should read ts natively, not cast:\n$plan")
    }
  }
}
