package graft

import graft.operators.{Similarity, Sq}
import org.apache.spark.sql.functions._

class SqSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  lazy val model = Sq.train(emb)

  override def afterAll(): Unit =
    try emb.unpersist(blocking = false) finally super.afterAll()

  test("model: exact per-dim bounds, 64 dims") {
    assert(model.dim == 64)
    (0 until model.dim).foreach { d =>
      assert(model.lo(d) <= model.hi(d))
      assert(model.width(d) >= 0.0)
    }
  }

  test("packed codes unpack to the reference quantizer; error <= half a cell") {
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    val packed = Sq.encodePacked(emb, model).collect()
    assert(packed.head.schema.fieldNames.count(_.startsWith("w")) == 8,
      "64 dims pack into 8 BIGINT words — 64 bytes, 4x under 256B of floats")
    packed.foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      (0 until 64).foreach { d =>
        val word = r.getAs[Long](s"w${d / 8}")
        val c = ((word >> (8 * (d % 8))) & 0xffL).toInt
        // reference quantizer: clamped floor on the uniform grid
        val expC =
          if (model.width(d) == 0.0) 0
          else math.min(255, math.max(0,
            math.floor((v(d) - model.lo(d)) /
              (model.hi(d) - model.lo(d)) * 256.0).toInt))
        assert(c == expC, s"dim $d of vec ${r.getLong(0)}")
        // midpoint dequantization lands within half a cell of the value
        if (model.width(d) > 0.0)
          assert(math.abs(model.deq(d, c) - v(d)) <= model.width(d) / 2 + 1e-12)
      }
    }
  }

  test("full-corpus shortlist == brute force (the qe16 parity config)") {
    val qids = Seq(0L, 1L, 2L)
    val sq = Sq.search(emb, model, qids, k = 10, shortlist = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val brute = Similarity.bruteForceKnn(emb, qids, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(sq.toSeq == brute.toSeq)
  }

  test("honest shortlist: measured recall@10 on the real corpus") {
    val qids = (0L until 20L).toSeq
    val brute = Similarity.bruteForceKnn(emb, qids, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = Sq.search(emb, model, qids, k = 10, shortlist = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (sq & brute).size.toDouble / brute.size
    // uniform-random embeddings are the worst case for every ANN
    // member; the 8-bit grid keeps all 64 dims, so even a 50-of-499
    // shortlist (10% of the corpus) retains most of the true top-10.
    // Measured 0.895 at sf0.001; floor pins the measurement.
    assert(recall >= 0.80, s"recall@10 was $recall")
  }

  test("sqPacked artifact == fresh encodePacked; search parity through it") {
    val dir = "/root/testdata/sf0.001"
    val dirModel = graft.operators.TrainingOps.sqModel(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (0 until 8).map(w => r.getAs[Long](s"w$w"))).toMap
    val art = rows(graft.operators.TrainingOps.sqPacked(spark, dir))
    val fresh = rows(Sq.encodePacked(
      graft.core.Tables.embeddings(spark, dir), dirModel))
    assert(art == fresh)
    // the qe16 path (artifact scan) == direct encode path, end to end
    val embDir = graft.core.Tables.embeddings(spark, dir)
    val viaArt = Sq.search(embDir, dirModel, Seq(0L, 1L), k = 5,
      shortlist = 50,
      packedTable = Some(graft.operators.TrainingOps.sqPacked(spark, dir)))
      .collect().map(_.toSeq).toSeq
    val direct = Sq.search(embDir, dirModel, Seq(0L, 1L), k = 5,
      shortlist = 50).collect().map(_.toSeq).toSeq
    assert(viaArt == direct)
  }

  test("empty query set fails fast (ADVICE r8: no reduce-on-empty)") {
    intercept[IllegalArgumentException] {
      Sq.search(emb, model, Seq(999999L), k = 5, shortlist = 50)
    }
    intercept[IllegalArgumentException] {
      Sq.approxIntShortlist(emb, model, Seq.empty, n = 5)
    }
  }

  test("search is deterministic under repartition") {
    val qids = Seq(0L, 1L)
    val a = Sq.search(emb, model, qids, k = 10, shortlist = 50).collect()
    val b = Sq.search(emb.repartition(7), model, qids, k = 10, shortlist = 50)
      .collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
