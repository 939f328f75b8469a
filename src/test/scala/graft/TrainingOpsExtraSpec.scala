package graft

import graft.operators.TrainingOps
import org.apache.spark.sql.functions._

/** Value-level checks for the round-5 additions (the DuckDB oracle
  * carries exactness at sf0.01/sf0.1; these pin the semantics
  * driver-side on sf0.001).
  */
class TrainingOpsExtraSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def gramsOf(text: String): Set[String] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
    else Set(toks.mkString(" "))
  }

  test("minhash estimate: identical docs estimate 1.0, estimates track exact jaccard") {
    import spark.implicits._
    graft.functions.DocFingerprint.register(spark)
    val near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, near), (2L, near),                       // identical: J = 1
      (3L, near + " lambda"),                       // near-dup of 2
      (4L, "one two three four five six seven"))    // unrelated to 3
      .toDF("doc_id", "text")
    val est = TrainingOps.minhashEstimateOn(docs)
      .collect().map(r => r.getAs[Long]("doc_a") ->
        (r.getAs[Int]("n_match"), r.getAs[Double]("est_jaccard"))).toMap
    assert(est(1L) == ((16, 1.0)), "identical docs share every minimum")
    // a per-component estimate is a Bernoulli(J) mean: with J ~ 0.73
    // for the planted near-dup and J = 0 for the unrelated pair, the
    // orderings below hold for any sane permutation set (and the
    // values are deterministic given portablePerms — the oracle
    // pins them exactly; this pins the MONOTONICITY)
    assert(est(2L)._2 > est(3L)._2,
      s"near-dup must estimate above unrelated: $est")
    assert(est(3L)._2 < 0.5 && est(2L)._2 > 0.4)
  }

  test("length filter keeps each source's own [p05, p95] band") {
    import spark.implicits._
    // source A: 1..100 chars -> p05 = 5.95, p95 = 95.05 (linear
    // interpolation at pos q*(n-1)) -> kept lengths 6..95
    // source B: 1001..1100 -> kept 1006..1095 (same band, own scale —
    // a 100-char doc is normal in A and would be an outlier in B)
    val docs =
      (1L to 100L).map(i => (i, "A", i)) ++
        (1001L to 1100L).map(i => (i, "B", i))
    val kept = TrainingOps.lengthFilterOn(
        docs.toDF("doc_id", "source", "n_chars"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("n_chars"))
    val a = kept.filter(_._1 == "A").map(_._2).sorted
    val b = kept.filter(_._1 == "B").map(_._2).sorted
    assert(a.head == 6L && a.last == 95L && a.length == 90)
    assert(b.head == 1006L && b.last == 1095L && b.length == 90)
  }

  test("decontaminate flags exactly the docs sharing a 3-gram with src0") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text")))
    val benchGrams = docs.filter(_._2 == "src0").flatMap(d => gramsOf(d._3)).toSet
    val expected = docs.filter(_._2 != "src0")
      .filter(d => gramsOf(d._3).exists(benchGrams)).map(_._1).sorted.toSeq
    val got = TrainingOps.decontaminate(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.size < docs.count(_._2 != "src0"),
      "corpus should be partially, not fully, contaminated")
  }

  test("source-lang pivot matches groupBy counts and fills absent cells with 0") {
    val got = TrainingOps.sourceLangPivot(spark, sf)
    assert(got.columns.toSeq == Seq("source", "de", "en", "es", "fr", "zh"))
    val wide = got.collect().flatMap { r =>
      Seq("de", "en", "es", "fr", "zh").map(l =>
        (r.getAs[String]("source"), l) -> r.getAs[Long](l))
    }.toMap
    val long = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source", "lang").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) ->
        r.getAs[Long]("n")).toMap
    wide.foreach { case (k, v) => assert(v == long.getOrElse(k, 0L), s"$k") }
    assert(long.values.sum == wide.values.sum, "pivot must conserve counts")
  }
}
