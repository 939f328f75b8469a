package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over the document/embedding corpus — the two
  * members that turn the corpus-processing operators into a SEARCH
  * stack: BM25 lexical ranking (qd51) and reciprocal-rank fusion
  * (qe22), which combines any rankers into the hybrid retrieval
  * every RAG pipeline runs (lexical ⊕ vector).
  */
object Search {

  /** The declared qd51 query workload: fixed multi-term queries over
    * the corpus vocabulary (high-df terms so every query matches a
    * meaningful slice at every sf).
    */
  val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("join", "hash"),
    2 -> Seq("customer", "order", "filter"),
    3 -> Seq("vector", "scan"))

  /** Okapi BM25 per-term score as ONE SQL-dialect-shared expression
    * string (valid verbatim in both Spark SQL and DuckDB — literally
    * the same text, so the IEEE op order cannot diverge):
    * idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with k1 = 1.2,
    * b = 0.75, Lucene's non-negative idf = ln(1 + (N−df+0.5)/(df+0.5)),
    * quantized to integer MICRO-units (the qd23 floor construction)
    * so the per-doc sum over query terms is exact long arithmetic.
    * Expects columns `$tf`, `$df`, `dl`, `n`, `tdl` in scope
    * (avgdl = tdl/n evaluated inline — one double division, same
    * order both engines).
    */
  def bm25TermSql(tf: String, df: String): String =
    s"CASE WHEN $tf = 0 THEN CAST(0 AS BIGINT) ELSE CAST(FLOOR(" +
      s"LN(1.0 + (CAST(n AS DOUBLE) - CAST($df AS DOUBLE) + 0.5) " +
      s"/ (CAST($df AS DOUBLE) + 0.5)) " +
      s"* (CAST($tf AS DOUBLE) * 2.2) " +
      s"/ (CAST($tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * " +
      s"(CAST(dl AS DOUBLE) / (CAST(tdl AS DOUBLE) / CAST(n AS DOUBLE))))) " +
      s"* 1000000.0 + 0.5) AS BIGINT) END"

  /** qd51 — BM25 ranked lexical retrieval: top-k documents per query
    * under Okapi BM25 — the keyword half of hybrid search, and the
    * lexical baseline every embedding index is benchmarked against.
    *
    * Scale shape: ONE tokenize pass feeds everything — per-doc
    * lengths and all query-term frequencies come out of a single
    * conditional aggregate (no per-term scan, no token self-join);
    * the corpus-level stats (N, Σdl, per-term df) are a 1-row
    * aggregate over the DOC grain broadcast into the scoring
    * projection (the qd22/qd23 scalar class); scoring is a map-only
    * projection + one top-k window. Docs with zero tokens carry no
    * terms and drop out of both engines identically, so N counts
    * tokenized docs.
    *
    * Parity: each per-term score is [[bm25TermSql]] — the SAME
    * expression text evaluated by both engines over exact integer
    * inputs, floored to micro-units; per-doc totals are exact long
    * sums; ranks tie on doc_id.
    */
  def bm25(docs: DataFrame,
           queries: Seq[(Int, Seq[String])] = Bm25Queries,
           k: Int = 10): DataFrame = {
    val terms = queries.flatMap(_._2).distinct
    val ti = terms.zipWithIndex.toMap
    val toks = docs.select(col("doc_id"),
      explode(Dedup.tokens(col("text"))).as("token"))
    val tfAggs = terms.map(t =>
      sum(when(col("token") === t, 1L).otherwise(0L)).as(s"tf_${ti(t)}"))
    val perDoc = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfAggs: _*)
    val dfAggs = terms.map(t =>
      sum(when(col(s"tf_${ti(t)}") > 0L, 1L).otherwise(0L)).as(s"df_${ti(t)}"))
    val statAggs =
      count(lit(1)).as("n") +: sum("dl").as("tdl") +: dfAggs
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    // per-query micro scores materialized as their OWN columns before
    // the Generate (the round-8 codegen-size rule: in-explode inlining
    // multiplies every scorer by the array width)
    val scoredCols = queries.map { case (qid, ts) =>
      expr(ts.map(t => bm25TermSql(s"tf_${ti(t)}", s"df_${ti(t)}"))
        .mkString("(", " + ", ")")).as(s"micro_$qid")
    }
    val matchedCols = queries.map { case (qid, ts) =>
      expr(ts.map(t => s"tf_${ti(t)}").mkString("(", " + ", ") > 0"))
        .as(s"m_$qid")
    }
    val scored = perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id") +: (scoredCols ++ matchedCols): _*)
    val w = Window.partitionBy("query_id")
      .orderBy(col("micro").desc, col("doc_id"))
    scored
      .select(col("doc_id"), explode(array(queries.map { case (qid, _) =>
        struct(lit(qid).as("query_id"), col(s"micro_$qid").as("micro"),
          col(s"m_$qid").as("m"))
      }: _*)).as("s"))
      .where(col("s.m"))
      .select(col("s.query_id").as("query_id"), col("doc_id"),
        col("s.micro").as("micro"))
      .withColumn("rnk", rank().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rnk"),
        (col("micro").cast("double") / lit(1000000.0)).as("score"))
      .orderBy("query_id", "rnk", "doc_id")
  }

  /** qd51 declared form over the sf dir's documents. */
  def bm25Search(s: SparkSession, dir: String): DataFrame =
    bm25(graft.core.Tables.documents(s, dir))

  /** qd52 — pseudo-relevance-feedback query EXPANSION (the RM3
    * move): assume the BM25 top-`n` documents are relevant, mine them
    * for the terms that characterize them, and emit the top-`m`
    * expansion terms per query — the classic lexical recall booster
    * (the expanded query retrieves documents sharing the FEEDBACK
    * vocabulary even when they miss every original term). Term weight
    * is the EXACT integer occurrence total over the feedback docs
    * (Σ_{d∈top-n} tf(t,d) — the deterministic core of RM3's
    * P(t|R) without its length-normalization double), original query
    * terms excluded, ties on the term itself.
    *
    * Scale shape: composes the qd51 ranking (report-sized top-n per
    * query) with ONE (doc, term) count aggregate of the token stream;
    * the join against the feedback set is doc-keyed with a
    * report-sized build side, the exclusion an anti-join against a
    * literal frame. Everything downstream of the token scan is
    * feedback-grain. Documented trade: this pays a SECOND tokenize
    * pass beyond qd51's (the two consumers aggregate at different
    * grains, so no exchange is shared); the one-pass alternative —
    * derive qd51's per-doc lengths/tfs FROM the (doc, term) table —
    * shares the subtree but forces qd51 standalone through the
    * vocabulary-grain exchange it doesn't need. Two cheap map-side
    * passes win until the ranking itself is a stored artifact.
    *
    * Parity: weights are exact BIGINT sums — no float anywhere past
    * qd51's already-pinned ranking.
    */
  def prfExpansion(docs: DataFrame,
                   queries: Seq[(Int, Seq[String])] = Bm25Queries,
                   n: Int = 10, m: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val top = bm25(docs, queries, n).select("query_id", "doc_id")
    val tf = docs.select(col("doc_id"),
        explode(Dedup.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val exclude = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("query_id", "token")
    val w = Window.partitionBy("query_id")
      .orderBy(col("w").desc, col("term"))
    top.join(tf, "doc_id")
      .join(broadcast(exclude), Seq("query_id", "token"), "left_anti")
      .groupBy(col("query_id"), col("token").as("term"))
      .agg(sum("tf").as("w"))
      .withColumn("rnk", rank().over(w).cast("int"))
      .filter(col("rnk") <= m)
      .select("query_id", "term", "w", "rnk")
      .orderBy("query_id", "rnk", "term")
  }

  /** qd52 declared form over the sf dir's documents. */
  def prfExpand(s: SparkSession, dir: String): DataFrame =
    prfExpansion(graft.core.Tables.documents(s, dir))

  /** qe22 — reciprocal-rank fusion (RRF, Cormack et al., SIGIR '09):
    * fuse two rankers' top-n lists by
    *   rrf(d) = Σ_i 1/(60 + rank_i(d)),
    * the standard hybrid-search combiner — rank-only, so it needs no
    * score calibration between heterogeneous rankers (a Hamming
    * distance and an ADC dot share no scale; their RANKS fuse
    * cleanly). Declared over the two compressed indexes BOTH engines
    * recompute bit-for-bit (qe20's pair): the 1024-bit Hamming top-50
    * and the SQ8 integer-scored top-50.
    *
    * Parity: contributions are exact integer micro-units —
    * 10⁹ DIV (60 + rank) (truncating division, nonnegative ⇒ DIV ≡
    * // — the qs33/qe17 argument); the fused score is a sum of ≤2
    * exact longs; ranks tie on vec_id.
    *
    * Scale shape: both input rankings are already top-n per query
    * (report-sized); the fusion is one full-outer equi-join on
    * (query_id, vec_id) + a window — nothing corpus-scale happens
    * here, and any blocked index (IVF/LSH/PQ) slots in by emitting
    * the same (query_id, vec_id, rnk) shape.
    */
  def rrfFusion(ham: DataFrame, sq: DataFrame, k: Int): DataFrame = {
    val a = ham.select(col("query_id"), col("vec_id"),
      col("rnk").as("h_rnk"))
    val b = sq.select(col("query_id"), col("vec_id"),
      col("rnk").as("s_rnk"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("vec_id"))
    a.join(b, Seq("query_id", "vec_id"), "full_outer")
      .withColumn("rrf",
        expr("COALESCE(CAST(1000000000 AS BIGINT)" +
          " DIV (60 + CAST(h_rnk AS BIGINT)), CAST(0 AS BIGINT))" +
          " + COALESCE(CAST(1000000000 AS BIGINT)" +
          " DIV (60 + CAST(s_rnk AS BIGINT)), CAST(0 AS BIGINT))"))
      .withColumn("rnk", rank().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "rnk", "rrf")
      .orderBy("query_id", "rnk", "vec_id")
  }

  /** qe22 declared form: Hamming-top-50 ⊕ SQ8-int-top-50 → top-10,
    * both first-pass indexes read from their stored artifacts
    * (hamming_sigs + sq_packed — the search path never rebuilds an
    * index).
    */
  def hybridSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.embeddings(s, dir)
    val ham = Similarity.hammingKnnFrom(
      TrainingOps.hammingSigs(s, dir), TrainingOps.knnQueryIds, 50)
    val sq = Sq.approxIntShortlist(emb, TrainingOps.sqModel(s, dir),
      TrainingOps.knnQueryIds, 50,
      packedTable = Some(TrainingOps.sqPacked(s, dir)))
    rrfFusion(ham, sq, k = 10)
  }
}
