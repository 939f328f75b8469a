package graft.streaming

import graft.core.Tables
import graft.operators.Sketch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** qs40 — STREAMING distinct-token profile via the portable HLL:
  * documents arrive as JSONL files; each micro-batch's tokens flow
  * through the stateless register projection
  * ([[Sketch.tokenRegisters]]) into ONE streaming aggregate —
  * `groupBy(source, register).max(rank)` — whose state is ≤ 256 rows
  * per source FOREVER. This is the production answer to the caveat
  * qs9 documents (streaming exact dedup/distinct keeps every key it
  * has ever seen): the register-max monoid gives a distinct-count
  * whose state is independent of cardinality, at the measured ~6.5%
  * error qd59 quantifies. The drained register state then folds to
  * the estimate in one batch step (Spark disallows chained streaming
  * aggregates; the register table IS the streaming state a
  * production job would expose, the estimator is its read-side
  * view).
  *
  * Batch ≡ stream by the same argument as qs38: max is an order-free
  * monoid, so micro-batch boundaries cannot change the drained
  * register table — which is why the oracle (qd59's token-grain
  * register CTEs, estimate-only columns) carries over verbatim.
  */
object SketchStream {

  private val gateRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Land the corpus as JSONL in qs40's watched folder (several part
    * files → several micro-batches under maxFilesPerTrigger = 1).
    */
  def landJsonl(s: SparkSession, dir: String): String = {
    val landing = graft.io.Scratch.qs40Dir(dir) + "/landing"
    Tables.documents(s, dir)
      .repartition(4)
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))).as("value"))
      .write.mode("overwrite").text(landing)
    landing
  }

  /** Drain the landing folder through the streaming register
    * aggregate; return the DRAINED register table (source, idx, mx).
    */
  def streamRegisters(s: SparkSession, landing: String,
                      queryName: String): DataFrame =
    EventStream.withShufflePartitions(s, 8) {
      val stream = s.readStream
        .schema(graft.ingest.JsonlIngest.DocSchema)
        .option("maxFilesPerTrigger", 1)
        .json(landing)
      val q = Sketch.tokenRegisters(stream)
        .groupBy("source", "idx").agg(max(col("rho")).as("mx"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(queryName)
    }

  /** qs40's gate form: land, drain, estimate.
    *
    * View lifecycle (ADVICE r11): the estimate is source-count-sized,
    * so it is eagerly checkpointed and the memory-sink temp view
    * dropped BEFORE returning — zero sink tables retained on the
    * driver between invocations, and the returned frame stays valid
    * no matter when (or whether) the caller consumes it.
    */
  def hllStreamGate(s: SparkSession, dir: String): DataFrame = {
    val name = s"qs40_hll_${gateRuns.incrementAndGet()}"
    val out = Sketch
      .registerEstimate(streamRegisters(s, landJsonl(s, dir), name))
      .localCheckpoint()
    s.catalog.dropTempView(name)
    out
  }
}
