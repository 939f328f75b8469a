package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (large) side, replicate the
  * small side across the salt domain, join on (key, salt).
  *
  * When to use instead of AQE's skew-join split: AQE only splits
  * skewed SHUFFLE partitions of sort-merge joins; a pathological hot
  * key inside one task of a hash aggregate or a broadcast-ineligible
  * dimension still needs manual salting. `saltFactor` bounds the
  * replication cost (small side grows x saltFactor).
  */
object Salting {

  /** Inner equi-join `big.key == small.key` with `saltFactor`-way
    * salting. Result equals the unsalted join (proved in
    * SaltingSpec), but the big side's hot keys spread over
    * saltFactor shuffle partitions.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1)
    // deterministic salt: spreads rows without an RNG in the plan
    // (rand() would break retry/idempotency of failed tasks)
    val salted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor))
        .cast("int"))
    val replicated = small
      .withColumn("_salt", explode(expr(
        s"sequence(0, ${saltFactor - 1})")))
    val out = salted.join(replicated,
      salted(key) === replicated(key) && salted("_salt") === replicated("_salt"),
      "inner")
    val bigCols = big.columns.map(salted(_))
    val smallCols = small.columns.filterNot(_ == key).map(replicated(_))
    out.select((bigCols ++ smallCols).toIndexedSeq: _*)
  }

  /** Convenience: per-key frequency sketch to decide whether salting
    * is warranted (driver gets only the top-k counts).
    */
  def topKeyCounts(df: DataFrame, key: String, k: Int = 20): Array[(String, Long)] =
    df.groupBy(col(key).cast("string").as("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("k"))
      .limit(k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
}
