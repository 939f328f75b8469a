package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceKnn]] — exact cosine top-k, the correctness
  *    baseline. Query rows are broadcast; the scan side streams, so
  *    the cost is one pass over the corpus per batch of queries (the
  *    right brute-force shape at any scale, but O(corpus) per query).
  *  - [[lshKnn]] — random-hyperplane LSH: 16 sign bits per vector,
  *    banded 4×4; only vectors sharing a band bucket with the query
  *    are scored. The scale path: candidate generation is a
  *    hash-partitioned equi-join on (band, bucket), no cross join.
  *
  * Determinism: all float math is widened to double and folded
  * sequentially (array HOFs evaluate left-to-right), which the DuckDB
  * oracle mirrors with list_reduce — bitwise-equal similarities.
  */
object Similarity {

  /** Sequential-fold double dot product of two array columns. */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Exact cosine top-k for the given query ids (self excluded).
    * Output: query_id, vec_id, rnk, sim — deterministically ordered.
    */
  def bruteForceKnn(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"),
      normD(col("embedding")).as("nrm"))
    val q = base.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    base.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim",
        dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "rnk", "sim")
      .orderBy("query_id", "rnk", "vec_id")
  }

  /** Deterministic random hyperplanes: NumPlanes × dim gaussians. */
  val NumPlanes = 16
  val PlaneBands = 4
  private val planeBits: Int = NumPlanes / PlaneBands

  private def planes(dim: Int): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(12345)
    Seq.fill(NumPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit signature (array<int> of 0/1) against the fixed planes. */
  private def signature(emb: Column, dim: Int): Column =
    transform(typedLit(planes(dim)), p =>
      when(dotD(p, emb) >= 0, lit(1)).otherwise(lit(0)))

  /** Band values: PlaneBands ints, each packing planeBits sign bits. */
  private def bandVals(sig: Column): Column =
    transform(sequence(lit(0), lit(PlaneBands - 1)), b =>
      aggregate(slice(sig, b * planeBits + 1, lit(planeBits)),
        lit(0), (acc, x) => acc * 2 + x))

  /** ANN top-k: score only vectors sharing >= 1 LSH band with the
    * query, then exact cosine + rank. Same output shape as
    * [[bruteForceKnn]]; recall measured in SimilaritySpec.
    */
  def lshKnn(emb: DataFrame, queryIds: Seq[Long], k: Int,
             dim: Int = 64): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"),
      normD(col("embedding")).as("nrm"),
      bandVals(signature(col("embedding"), dim)).as("bands"))
    val exploded = base.select(col("vec_id"), col("embedding"), col("nrm"),
      posexplode(col("bands")).as(Seq("band_idx", "band_val")))
    val qSide = exploded.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("band_idx"), col("band_val"))
    val cands = exploded.join(broadcast(qSide), Seq("band_idx", "band_val"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "q_emb", "q_nrm", "vec_id", "embedding", "nrm")
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    cands
      .withColumn("sim",
        dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "rnk", "sim")
      .orderBy("query_id", "rnk", "vec_id")
  }
}
