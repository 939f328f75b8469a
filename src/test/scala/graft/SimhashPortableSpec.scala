package graft

import graft.functions.DocFingerprint
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The declared qd7 uses the portable 31-bit SimHash (rolling-poly
  * token hash, DuckDB-mirrorable); production near-dup blocking uses
  * the 64-bit xxhash64 variant. This spec carries the equivalence
  * burden: the portable value matches a pure-Scala reference, and
  * both variants rank document similarity the same way.
  */
class SimhashPortableSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private def tokensOf(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  /** Pure-Scala reference of Dedup.simhashPortableFrame. */
  private def referenceSimhash(text: String): Long = {
    val hs = tokensOf(text).map(DocFingerprint.reference)
    val counts = new Array[Int](31)
    hs.foreach { h =>
      (0 until 31).foreach { i =>
        if (((h >> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
      }
    }
    (0 until 31).map(i => if (counts(i) > 0) 1L << i else 0L).sum
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  // the raw documents cache was being substituted into PlanSpec's
  // qd19 plan (full-column InMemoryRelation defeats the pruning pin)
  override def afterAll(): Unit =
    try docs.unpersist(blocking = false) finally super.afterAll()

  test("portable simhash matches the pure-Scala reference on the corpus") {
    val got = Dedup.simhashPortableFrame(docs, "doc_id", "text", "simhash")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
      .toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    assert(texts.nonEmpty)
    texts.foreach { case (id, t) =>
      assert(got(id) == referenceSimhash(t), s"doc $id")
    }
  }

  test("zero-token doc hashes to 0 in both variants") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, ""), (2L, "!!! ... ???"), (3L, "real words here"))
      .toDF("doc_id", "text")
    val p = Dedup.simhashPortableFrame(df, "doc_id", "text", "sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val x = Dedup.simhashFrame(df, "doc_id", "text", "sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p(1L) == 0L && p(2L) == 0L && p(3L) != 0L)
    assert(x(1L) == 0L && x(2L) == 0L && x(3L) != 0L)
  }

  test("both variants rank similarity identically on planted docs") {
    val spark2 = spark
    import spark2.implicits._
    val base = "the quick brown fox jumps over the lazy dog " +
      "while seventeen analysts review quarterly retail numbers"
    val near = base.replace("seventeen", "eighteen")
    val far = "completely unrelated text about submarine volcanoes " +
      "erupting beneath arctic ice shelves during polar night"
    val df = Seq((0L, base), (1L, base), (2L, near), (3L, far))
      .toDF("doc_id", "text")
    def hams(frame: org.apache.spark.sql.DataFrame): (Int, Int, Int) = {
      val m = frame.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (hamming(m(0L), m(1L)), hamming(m(0L), m(2L)), hamming(m(0L), m(3L)))
    }
    val (pIdent, pNear, pFar) =
      hams(Dedup.simhashPortableFrame(df, "doc_id", "text", "sh"))
    val (xIdent, xNear, xFar) =
      hams(Dedup.simhashFrame(df, "doc_id", "text", "sh"))
    // identical docs collide exactly; near-duplicates sit strictly
    // closer than unrelated text — under BOTH hash families
    assert(pIdent == 0 && xIdent == 0)
    assert(pNear < pFar, s"portable: near $pNear !< far $pFar")
    assert(xNear < xFar, s"xxhash64: near $xNear !< far $xFar")
  }
}
