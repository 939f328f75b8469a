package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the shared star schema under
  * `/root/testdata/sf*` (see TESTDATA.md / FIXTURES.md §B).
  *
  * One `spark.read.parquet` per table — scans stay declarative so
  * Catalyst pushes filters and prunes columns down to the parquet
  * reader (verified via `.explain` PushedFilters / ReadSchema).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The shared testdata has been generated with `events.ts` encoded
    * as parquet TIMESTAMP(NANOS) in some rounds and TIMESTAMP(MICROS)
    * in others (it changed under us at round 6 — see TESTDATA.md
    * notes), so the loader sniffs the decoded schema instead of
    * assuming either:
    *
    *  - NANOS: Spark's vectorized reader rejects it outright; under
    *    the `nanosAsLong` legacy conf it decodes as a nanos LONG,
    *    which we truncate to micros with integer division (a double
    *    roundtrip would lose precision on 1.7e18-scale nanos).
    *  - MICROS, isAdjustedToUTC=false: decodes as TIMESTAMP_NTZ;
    *    cast to TIMESTAMP under the pinned UTC session zone (same
    *    instants, wall clock preserved).
    *  - MICROS/MILLIS, adjusted: already TIMESTAMP — passthrough.
    *
    * The nanosAsLong legacy conf has no per-read option form, so it
    * is set only around the read and restored after (VERDICT r3 #3 —
    * a table loader must not mutate session state): the parquet
    * relation snapshots its Hadoop conf at creation, so later actions
    * on the returned frame execute correctly with the session value
    * restored (TablesScopeSpec proves both directions).
    */
  def events(s: SparkSession, d: String): DataFrame =
    withEventReadConfs(s) {
      normalizeTs(table(s, d, "events"))
    }

  /** Normalize an event frame's `ts` column to TimestampType whatever
    * the parquet encoding decoded it as (see [[events]]). Works on
    * batch and streaming frames alike — dispatch is on the analyzed
    * schema, not the data. Every event read in the repo (batch,
    * readStream, landing copies) MUST route through this: round 6
    * lost 37 queries to a hard-coded nanos shim when the shared
    * testdata flipped encodings.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      // A raw INT64 ts is nanos today (nanosAsLong decode), but the
      // corpus has already flipped encodings once, so don't bake that
      // in: dispatch per row on magnitude. Epoch NANOS for any date
      // after 1973 exceed 1e17 while epoch MICROS stay below 1e17
      // until year 5138 — the bands cannot overlap for plausible
      // data, so a future regeneration shipping raw int64 micros
      // decodes correctly instead of silently landing 1000x off.
      // Pure codegen'd expression: works on batch and streaming.
      case LongType =>
        df.withColumn("ts", expr(
          "timestamp_micros(CASE WHEN abs(ts) >= 100000000000000000 " +
            "THEN ts div 1000 ELSE ts END)"))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Run `body` with the event-read session confs set, then restore
    * the previous session values (also on failure):
    *
    *  - `nanosAsLong=true`: a TIMESTAMP(NANOS) file decodes as a
    *    nanos LONG instead of crashing the vectorized reader;
    *  - `inferTimestampNTZ.enabled=false`: a TIMESTAMP(MICROS,
    *    isAdjustedToUTC=false) file decodes DIRECTLY as TimestampType
    *    (raw epoch micros under the pinned UTC session — same
    *    instants as the NTZ+cast path), so `ts` is a native scan
    *    column: predicates on it stay pushable and row-group min/max
    *    stats usable, and the per-row cast disappears from all 37
    *    events-family plans. [[normalizeTs]]'s NTZ branch remains as
    *    the fallback for frames read outside this scope.
    */
  def withEventReadConfs[A](s: SparkSession)(body: => A): A = {
    val settings = Seq(
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false")
    val prev = settings.map { case (k, _) => k -> s.conf.getOption(k) }
    settings.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** Former name of [[withEventReadConfs]]. Deprecated because the
    * replacement ALSO disables inferTimestampNTZ — a caller wrapping
    * a non-events NTZ parquet read would see session-zone TIMESTAMP
    * instead of TIMESTAMP_NTZ, a semantic change hiding behind the
    * old name. This alias keeps the original contract (nanosAsLong
    * only); opt into the full event-read confs explicitly.
    */
  @deprecated("use withEventReadConfs (sets nanosAsLong AND disables " +
    "inferTimestampNTZ); this alias sets only nanosAsLong", "round 8")
  def withNanosConf[A](s: SparkSession)(body: => A): A = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(k)
    s.conf.set(k, "true")
    try body
    finally prev match {
      case Some(v) => s.conf.set(k, v)
      case None    => s.conf.unset(k)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
