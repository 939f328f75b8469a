package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-partition fact and dimension tables on
  * the join key at write time so repeated joins run shuffle-free
  * (both sides' bucketing satisfies the join's distribution
  * requirement — the plan shows SortMergeJoin with NO Exchange).
  *
  * This is the batch-layout answer to "the same join runs every day
  * at 100 TB": pay the shuffle once when laying the data down, never
  * again at read time. BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table; `path` makes it external
    * (bucketing metadata lives in the session catalog either way).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w.saveAsTable(table))(p =>
      w.option("path", p).saveAsTable(table))
  }

  /** Join two same-bucketed tables on `key`; with matching bucket
    * counts Catalyst plans this without any Exchange.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
