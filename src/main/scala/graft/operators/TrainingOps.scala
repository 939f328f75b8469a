package graft.operators

import graft.core.Tables
import graft.functions.{DocFingerprint, TextFns}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries for the training-data-pipeline operators
  * (dedup / text analysis / similarity search) over the `documents`
  * and `embeddings` tables. Oracle-backed where DuckDB can express
  * the same computation; the LSH/SimHash blocking paths are
  * rows-only checked by the driver and property-tested in
  * DedupSpec/SimilaritySpec.
  */
object TrainingOps {

  /** Exact dedup: first doc per identical text (SQL-expressible). */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(Tables.documents(s, dir), "text", "doc_id")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** Whitespace + BPE-ish token counts (SQL-expressible). */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        TextFns.tokenCount(col("text")).as("n_tokens"),
        TextFns.bpeTokenCount(col("text")).as("n_bpe"))
      .orderBy("doc_id")

  /** Quality-scoring signals (SQL-expressible, bit-exact doubles). */
  def quality(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
    val sigs = TextFns.qualitySignals(col("text"))
    base.select(col("doc_id") +: sigs.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
  }

  /** Marker-word language ID (SQL-expressible). */
  def langId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TextFns.langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  /** Document fingerprint via the custom Catalyst expression
    * (codegen'd); oracle mirrors the same rolling hash with
    * list_reduce over codepoints (ASCII corpus ⇒ bytes==codepoints).
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    DocFingerprint.register(s)
    Tables.documents(s, dir)
      .select(col("doc_id"), DocFingerprint.of(col("text")).as("fp"))
      .orderBy("doc_id")
  }

  /** Top-100 MinHash-LSH near-dup candidate pairs by exact shingle
    * Jaccard (rows-only: LSH banding is not SQL-expressible).
    */
  def minhashTopPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(Tables.documents(s, dir), "doc_id", "text",
      threshold = 0.0)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(100)

  /** SimHash values for every document (rows-only; property-tested). */
  def simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.withSimhash(Tables.documents(s, dir), "text", "simhash")
      .select("doc_id", "simhash")
      .orderBy("doc_id")

  /** Per-source corpus stats: plain, distinct, and sum aggregates in
    * one pass (distinct aggregates plan as the expand+two-phase
    * aggregate — worth having in the declared surface).
    */
  def sourceStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("source")

  /** Corpus vocabulary: top-50 tokens by document frequency —
    * explode (Generator) + two-level aggregation, the word-count
    * shape with per-doc dedup first.
    */
  def tokenFreq(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("token"))
      .distinct()
      .groupBy("token")
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("token"))
      .limit(50)

  val knnQueryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)

  /** Exact cosine top-10 for five query vectors (oracle-backed:
    * sequential double fold == DuckDB list_reduce, bit-equal).
    */
  def knnBrute(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceKnn(Tables.embeddings(s, dir), knnQueryIds, 10)

  /** LSH-bucketed ANN, same queries (rows-only; recall vs brute
    * asserted in SimilaritySpec).
    */
  def knnLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshKnn(Tables.embeddings(s, dir), knnQueryIds, 10)

  /** Embedding-cosine near-dup pairs (rows-only; LSH blocking is not
    * SQL-expressible — exactness of the emitted sims and recall on
    * planted duplicates asserted in SimilaritySpec). Threshold low
    * enough that the synthetic corpus yields pairs at every SF.
    */
  def embeddingNearDups(s: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDups(Tables.embeddings(s, dir), threshold = 0.3)

  /** IVF ANN, same queries (rows-only; IvfSpec proves full-probe
    * search equals brute force exactly and partial-probe recall).
    */
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val model = Ivf.train(emb, k = 16, iters = 2)
    Ivf.search(emb, model, knnQueryIds, k = 10, nProbe = 4)
  }
}
