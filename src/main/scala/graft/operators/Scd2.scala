package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: turn a change
  * log (one row per observed state) into validity intervals —
  * `valid_from` = the change timestamp, `valid_to` = the next change
  * for the same key (open intervals closed with a far-future
  * sentinel), `is_current` on the last version. The standard
  * warehouse shape the reference's retail star schema implies but
  * never materializes (its dims are overwrite-only; see
  * /root/reference/src/main/transformations/jobs/main.py dimension
  * loads).
  *
  * One shuffle on the dimension key, then a single window pass
  * computing row_number + lead over the same (partition, order) —
  * Spark plans both functions in ONE Window operator, so there is no
  * second sort. At 100 TB-scale dimension logs this is the minimal
  * plan: exchange + sort + linear scan per key group.
  */
object Scd2 {

  /** Generic history build over any change-log frame. Ties on
    * `orderCol` are broken by `tieCol` so the interval chain is
    * deterministic.
    */
  def history(df: DataFrame, keyCol: String, orderCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol), col(tieCol))
    df.withColumn("version", row_number().over(w))
      .withColumn("_next", lead(col(orderCol), 1).over(w))
      .withColumn("valid_from",
        date_format(col(orderCol), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("valid_to",
        coalesce(date_format(col("_next"), "yyyy-MM-dd HH:mm:ss"),
          lit("9999-12-31 00:00:00")))
      .withColumn("is_current", col("_next").isNull)
      .drop("_next")
  }

  /** qx14 declared form: customer purchase-state history from the
    * orders change log (each order observes a new (status, total)
    * state for its customer).
    */
  def customerHistory(s: SparkSession, dir: String): DataFrame =
    history(Tables.orders(s, dir), "o_custkey", "o_orderdate", "o_orderkey")
      .select(col("o_custkey").as("cust"), col("version"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("total"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy("cust", "version")

  /** MERGE-INTO emulation (SCD type 1): apply a changes batch to a
    * current snapshot — update matched keys, insert unmatched ones,
    * carry the rest — as a full-outer join + coalesce, the standard
    * formulation on an engine without a MERGE operator. Each side is
    * latest-state-per-key (row_number + rn=1, which Spark prunes
    * map-side via WindowGroupLimit). One exchange per side on the
    * key; full-outer cannot broadcast, so at 100 TB both sides
    * shuffle — unavoidable for merge, and the snapshot side's shuffle
    * is removable by bucketing both tables on the key (io.Bucketing).
    */
  def upsert(snapshot: DataFrame, updates: DataFrame, keyCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val s = snapshot.as("s"); val u = updates.as("u")
    val op = when(col(s"s.$keyCol").isNull, lit("insert"))
      .when(col(s"u.$keyCol").isNull, lit("carry"))
      .otherwise(lit("update"))
    s.join(u, col(s"s.$keyCol") === col(s"u.$keyCol"), "full_outer")
      .select(
        coalesce(col(s"u.$keyCol"), col(s"s.$keyCol")).as(keyCol) +:
          payloadCols.map(c =>
            coalesce(col(s"u.$c"), col(s"s.$c")).as(c)) :+
          op.as("op"): _*)
  }

  /** Latest observed (status, total) per customer among orders
    * matching `pred` — the snapshot/changes extractor for qx15.
    */
  private def latestState(orders: DataFrame,
      pred: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders.where(pred)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("o_custkey"),
        col("o_orderstatus").as("status"), col("o_totalprice").as("total"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("as_of"))
  }

  /** qx15 declared form: merge the post-cutoff order activity (the
    * "incremental batch") into the pre-cutoff customer snapshot. The
    * fixed cutoff keeps both sides non-trivial at every SF (at
    * sf0.01: 348 updates, 2 inserts, 1150 carried).
    */
  val mergeCutoff = "2001-06-01"

  def customerUpsert(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val cut = to_timestamp(lit(mergeCutoff))
    upsert(
      latestState(orders, col("o_orderdate") < cut),
      latestState(orders, col("o_orderdate") >= cut),
      "o_custkey", Seq("status", "total", "as_of"))
      .withColumnRenamed("o_custkey", "cust")
      .orderBy("cust")
  }

  /** Change-data-capture snapshot diff: given a `before` and an
    * `after` snapshot keyed by `keyCol`, emit ONLY the changes —
    * `insert` (key only in after), `delete` (key only in before),
    * `update` (key in both, some column of `compareCols` changed) —
    * with the old and new payload side by side. Rows whose compared
    * columns are unchanged are suppressed: this no-change suppression
    * is what distinguishes CDC extraction from [[upsert]]'s merge
    * (which carries unchanged rows through). `compareCols` is the
    * change predicate; `carryCols` ride along old/new without
    * affecting it — the usual CDC contract where audit columns
    * (load timestamps etc.) must not generate spurious updates.
    *
    * Null-safe: comparison is `<=>` negated, so NULL→value and
    * value→NULL both count as changes and NULL→NULL does not.
    *
    * Scale: one full-outer join on the key — both sides shuffle
    * (full-outer cannot broadcast); the suppression filter runs
    * post-join, so nothing extra crosses the exchange. Bucketing
    * both snapshots on the key (io.Bucketing) removes both
    * exchanges for repeated diffs of the same tables.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCol: String,
      compareCols: Seq[String], carryCols: Seq[String] = Nil): DataFrame = {
    val b = before.as("b"); val a = after.as("a")
    val op = when(col(s"b.$keyCol").isNull, lit("insert"))
      .when(col(s"a.$keyCol").isNull, lit("delete"))
      .otherwise(lit("update"))
    val changed = compareCols
      .map(c => !(col(s"b.$c") <=> col(s"a.$c")))
      .reduce(_ || _)
    val payload = compareCols ++ carryCols
    b.join(a, col(s"b.$keyCol") === col(s"a.$keyCol"), "full_outer")
      .filter(col(s"b.$keyCol").isNull || col(s"a.$keyCol").isNull || changed)
      .select(coalesce(col(s"b.$keyCol"), col(s"a.$keyCol")).as(keyCol) +:
        op.as("op") +:
        (payload.map(c => col(s"b.$c").as(s"old_$c")) ++
          payload.map(c => col(s"a.$c").as(s"new_$c"))): _*)
  }

  /** qx25 declared form: CDC between the year-2000 and year-2001
    * customer-activity snapshots (latest observed state per customer
    * within each window; disjoint windows make all three ops real —
    * sf0.01: 480 deletes, 200 inserts, and both update and suppressed
    * no-change rows among the 685 customers active in both years).
    * The change predicate is `status` alone; totals are carried
    * old/new without triggering updates, which exercises the
    * compare/carry split (near-unique doubles would otherwise make
    * suppression vacuous).
    */
  def customerDiff(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val y2000 = col("o_orderdate") >= to_timestamp(lit("2000-01-01")) &&
      col("o_orderdate") < to_timestamp(lit("2001-01-01"))
    val y2001 = col("o_orderdate") >= to_timestamp(lit("2001-01-01"))
    snapshotDiff(
      latestState(orders, y2000).drop("as_of"),
      latestState(orders, y2001).drop("as_of"),
      "o_custkey", compareCols = Seq("status"), carryCols = Seq("total"))
      .withColumnRenamed("o_custkey", "cust")
      .orderBy("cust")
  }
}
