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
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects; read it as a nanos long and truncate to micros
    * (integer division — a double roundtrip would lose precision on
    * 1.7e18-scale nanos).
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
      table(s, d, "events")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
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
