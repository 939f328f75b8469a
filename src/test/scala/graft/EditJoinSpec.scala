package graft

import graft.operators.EditJoin
import org.apache.spark.sql.functions._

/** qd67 edit-distance similarity join: the banded-verify contract,
  * completeness of every blocking tier against adversarial fixtures,
  * and brute-force parity on the real corpus (the DuckDB oracle
  * carries gate exactness; these carry the cases the corpus does not
  * plant).
  */
class EditJoinSpec extends SparkSpec {

  import spark.implicits._

  /** Pin the built-in threshold form's contract the verify leg relies
    * on: exact distance when <= threshold, -1 (not a clamp) beyond it.
    */
  test("levenshtein threshold form returns -1 beyond the band") {
    val r = Seq(("kitten", "sitting")).toDF("a", "b")
      .select(
        levenshtein(col("a"), col("b")).as("full"),
        levenshtein(col("a"), col("b"), 3).as("at"),
        levenshtein(col("a"), col("b"), 2).as("below"))
      .head()
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 3, "distance inside the band is exact")
    assert(r.getInt(2) == -1, "beyond the band must be -1, not a clamp")
  }

  private def brute(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    val df = rows.toDF("id", "t")
    df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.t"), col("b.t")).as("ed"))
      .filter(col("ed") <= d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def blocked(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    EditJoin.editNearDups(rows.toDF("id", "t"), "id", "t", d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("edit_dist"))).toSet

  private def segBlocked(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    EditJoin.editNearDupsSegIndexed(rows.toDF("id", "t"), "id", "t", d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("edit_dist"))).toSet

  test("hist_l1: reference parity, null and length semantics") {
    graft.functions.HistL1.register(spark)
    val rows = spark.sql(
      """SELECT
        |  hist_l1(array(3, 0, 7, 2), array(1, 4, 7, 0)) AS basic,
        |  hist_l1(CAST(array() AS ARRAY<INT>),
        |          CAST(array() AS ARRAY<INT>)) AS empty,
        |  hist_l1(array(1, 2), array(1, 2, 3)) AS mismatched,
        |  hist_l1(array(1, CAST(NULL AS INT)), array(1, 2)) AS nullelem,
        |  hist_l1(CAST(NULL AS ARRAY<INT>), array(1)) AS nullarr
        |""".stripMargin).head()
    assert(rows.getAs[Int]("basic") ==
      graft.functions.HistL1.reference(Seq(3, 0, 7, 2), Seq(1, 4, 7, 0)))
    assert(rows.getAs[Int]("basic") == 8)
    assert(rows.getAs[Int]("empty") == 0)
    assert(rows.isNullAt(rows.fieldIndex("mismatched")))
    assert(rows.isNullAt(rows.fieldIndex("nullelem")))
    assert(rows.isNullAt(rows.fieldIndex("nullarr")))
  }

  test("completeness on adversarial fixtures == brute force") {
    val rows = Seq(
      // bucket-boundary pair: lengths 15 and 16 land in buckets 0/1 —
      // the neighbourhood explode must still pair them
      (1L, "aaaaaaaaaaaaaaa"),
      (2L, "aaaaaaaaaaaaaaaa"),
      // edits at BOTH ends (prefix-style blocking would miss these)
      (3L, "XXabcdefghijklmnopqrstuvwxyzYY"),
      (4L, "ZZabcdefghijklmnopqrstuvwxyzWW"),
      // case-only difference: lowercase histogram L1 = 0, ed = 2 —
      // the prune must NOT eat it and the verify is case-sensitive
      (5L, "The Quick Brown Fox Jumps Over It"),
      (6L, "the quick brown fox jumps over it"),
      // punctuation-only difference: projects OUT of the histogram
      (7L, "hello, world! how are you today??"),
      (8L, "hello world how are you today"),
      // far pair sharing the alphabet: histogram close, distance huge
      (9L, "abcdefghij" * 5),
      (10L, "jihgfedcba" * 5),
      // short strings below one bucket width
      (11L, "ab"), (12L, "ba"), (13L, "abcd"),
      // empty string
      (14L, ""),
      // identical twins (distance 0)
      (15L, "twin payload twin payload"),
      (16L, "twin payload twin payload"))
    for (d <- Seq(2, 4, 12)) {
      val b = brute(rows, d)
      val g = blocked(rows, d)
      assert(g == b, s"d=$d: blocked=$g brute=$b")
      assert(b.nonEmpty, s"d=$d fixture must be value-bearing")
    }
  }

  test("segment-indexed path: completeness on long-doc fixtures == brute force") {
    val base = (0 until 20).map(i => s"sentence $i of the long base document. ").mkString
    val alpha = "abcdefghijklmnopqrstuvwxyz" * 12 // 312 chars, zero overlap with base
    val rows = Seq(
      // identical long twins (pure segment path)
      (1L, base), (2L, base),
      // d chars inserted at the VERY FRONT: every chunk's copy shifts
      // by exactly d — the |Δpos| <= d window boundary case
      (3L, "############" + base),
      // edits sprayed every SegWidth chars corrupt many chunks but
      // only maxDist of them — one chunk must survive
      (4L, base.zipWithIndex.map { case (c, i) =>
        if (i % 40 == 0 && i / 40 < 12) '#' else c }.mkString),
      // one long / one short partner straddling the minLong split:
      // len(5)=208 takes the segment path, len(6)=200 the band path —
      // the disjoint split must still count the pair exactly once
      (5L, "z" * 208), (6L, "z" * 200),
      // short-side pair (band path inside the hybrid)
      (7L, "tiny doc one"), (8L, "tiny doc two"),
      // a far-away doc that shares no grams
      (9L, alpha))
    val d = EditJoin.MaxDist
    val b = brute(rows, d)
    val g = segBlocked(rows, d)
    assert(g == b, s"seg=$g brute=$b")
    // the fixture must actually exercise both paths and the shift bound
    assert(b.contains((1L, 2L, 0)) && b.contains((5L, 6L, 8)))
    assert(b.exists(p => p._1 == 1L && p._2 == 3L),
      "front-insert pair must survive the position window")
    assert(b.exists(p => p._1 == 7L && p._2 == 8L), "band-path pair")
  }

  test("segment-indexed path == band path on adversarial fixtures") {
    val rows = Seq(
      (1L, "a" * 250), (2L, "a" * 250 + "bb"),
      (3L, "b" * 100), (4L, "b" * 100 + "c"),
      (5L, ("xy" * 150).drop(1)), (6L, "xy" * 150))
    for (d <- Seq(4, 12)) {
      assert(segBlocked(rows, d) == blocked(rows, d))
    }
  }

  test("brute-force parity on the sf0.001 corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text").as("t"))
    val d = EditJoin.MaxDist
    val bruteSet = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.t"), col("b.t"), d).as("ed"))
      .filter(col("ed") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = EditJoin.editNearDups(docs, "id", "t", d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("edit_dist"))).toSet
    assert(got == bruteSet)
    assert(got.nonEmpty, "the corpus plants near-dup pairs — must find them")
    assert(got.forall(_._3 <= d))
  }

  test("the declared query is ordered and value-bearing") {
    val out = EditJoin.editNearDupsQuery(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val pairs = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.sameElements(pairs.sorted), "output sorted by (doc_a, doc_b)")
    assert(out.forall(r => r.getLong(0) < r.getLong(1)),
      "each unordered pair exactly once, lower id first")
  }
}
