package graft

import graft.operators.{Search, Similarity, Sq, TrainingOps}
import org.apache.spark.sql.functions._

/** qd51 (BM25) and qe22 (RRF hybrid fusion) — behavioral specs on
  * top of the oracle gate: a driver-side reference implementation of
  * each formula, plus the properties that make the operators WORTH
  * running (idf discrimination; fusion preferring cross-ranker
  * agreement).
  */
class SearchSpec extends SparkSpec {

  import spark.implicits._

  /** Driver-side Okapi BM25 with the same micro-unit quantization. */
  private def refBm25(docs: Seq[(Long, String)],
                      queries: Seq[(Int, Seq[String])], k: Int)
      : Seq[(Int, Long, Int, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> "[^a-z0-9]+".r.replaceAllIn(t.toLowerCase, " ")
        .split(" ").filter(_.nonEmpty).toSeq
    }.filter(_._2.nonEmpty)
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
    def df(t: String) = toks.count(_._2.contains(t)).toDouble
    queries.flatMap { case (qid, ts) =>
      toks.flatMap { case (id, dt) =>
        val tfs = ts.map(t => dt.count(_ == t).toLong)
        if (tfs.sum == 0L) None
        else {
          val micro = ts.zip(tfs).map { case (t, tf) =>
            if (tf == 0L) 0L
            else {
              val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
              val s = idf * (tf.toDouble * 2.2) /
                (tf.toDouble + 1.2 * (0.25 + 0.75 * (dt.size.toDouble / avgdl)))
              math.floor(s * 1000000.0 + 0.5).toLong
            }
          }.sum
          Some((qid, id, micro))
        }
      }.sortBy { case (_, id, m) => (-m, id) }
        .take(k).zipWithIndex
        .map { case ((q, id, m), i) => (q, id, i + 1, m / 1e6) }
    }
  }

  test("qd51: BM25 matches the driver-side reference on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = refBm25(docs, Search.Bm25Queries, 10)
    val got = Search.bm25Search(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSeq
    assert(got == want)
  }

  test("qd51: rarer terms discriminate — idf orders equal-tf docs") {
    // 10 filler docs so dfs differ: 'rare' in 1 doc, 'common' in 9.
    // Both probe docs have identical length and tf=1 for their term,
    // so ONLY idf separates their scores.
    val docs = (
      Seq(1L -> "rare alpha beta", 2L -> "common alpha beta") ++
        (3L to 10L).map(i => i -> "common filler text here")
      ).toDF("doc_id", "text")
    val out = Search.bm25(docs, Seq(1 -> Seq("rare", "common")), k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(1L) > out(2L),
      s"rare-term doc must outscore common-term doc: $out")
  }

  test("qd52: expansion terms come from feedback docs, originals excluded, exact weights") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // driver-side reference: top-10 per query from refBm25, then the
    // exact occurrence totals of non-query terms over those docs
    val top = refBm25(docs, Search.Bm25Queries, 10)
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val tokensOf = docs.map { case (id, t) =>
      id -> "[^a-z0-9]+".r.replaceAllIn(t.toLowerCase, " ")
        .split(" ").filter(_.nonEmpty).toSeq
    }.toMap
    val want = Search.Bm25Queries.flatMap { case (qid, qts) =>
      val counts = top(qid).toSeq.flatMap(tokensOf)
        .filterNot(qts.contains)
        .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
      counts.toSeq.sortBy { case (t, w) => (-w, t) }.take(5)
        .zipWithIndex.map { case ((t, w), i) => (qid, t, w, i + 1) }
    }
    val got = Search.prfExpand(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(got == want)
    // no expansion term is an original query term
    got.foreach { case (qid, t, _, _) =>
      assert(!Search.Bm25Queries.toMap.apply(qid).contains(t),
        s"original term '$t' leaked into query $qid's expansion")
    }
  }

  test("qd51/qd52 degenerate corpora: empty and token-free inputs yield empty results, no exceptions") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Search.bm25(empty, Search.Bm25Queries, 10).collect().isEmpty)
    assert(Search.prfExpansion(empty).collect().isEmpty)
    // docs that tokenize to nothing (punctuation/whitespace only):
    // the stats row has n = 0 — every row must drop, none may NaN
    val blank = Seq(1L -> "!!! ???", 2L -> "   ").toDF("doc_id", "text")
    assert(Search.bm25(blank, Search.Bm25Queries, 10).collect().isEmpty)
    // corpus with tokens but zero query-term matches
    val miss = Seq(1L -> "completely unrelated words").toDF("doc_id", "text")
    assert(Search.bm25(miss, Search.Bm25Queries, 10).collect().isEmpty)
  }

  test("qe22: RRF reference parity and cross-ranker agreement wins") {
    // ranker A top-3: d1,d2,d3; ranker B top-3: d2,d3,d4.
    // d2 (ranks 2+1) must outrank d1 (rank 1, one list only):
    // agreement across rankers beats a single first place at k=60.
    val a = Seq((7L, 1L, 1), (7L, 2L, 2), (7L, 3L, 3))
      .toDF("query_id", "vec_id", "rnk")
    val b = Seq((7L, 2L, 1), (7L, 3L, 2), (7L, 4L, 3))
      .toDF("query_id", "vec_id", "rnk")
    val got = Search.rrfFusion(a, b, k = 10).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
    def c(r: Long) = 1000000000L / (60L + r)
    val want = Seq(2L -> (c(2) + c(1)), 3L -> (c(3) + c(2)),
      1L -> c(1), 4L -> c(3))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, i + 1, s) }
    assert(got.toSeq == want)
    assert(got.head._1 == 2L, "cross-ranker agreement must win")
  }

  test("qe22: declared hybrid keeps the exact top hit when both rankers agree") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.embeddings(spark, dir)
    val fused = Search.hybridSearch(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // shape: 10 per query, ranks 1..10, no duplicates
    val byQ = fused.groupBy(_._1)
    assert(byQ.keySet == TrainingOps.knnQueryIds.toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1 to 10))
      assert(rows.map(_._2).distinct.length == 10)
    }
    // fusion recall vs exact truth must not be worse than the weaker
    // member alone (measured r10: hamming1024 0.8-1.0, sq8 1.0 at 50)
    val truth = Similarity.bruteForceKnn(emb, TrainingOps.knnQueryIds, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fusedSet = fused.map(t => (t._1, t._2)).toSet
    val ham = Similarity.hammingKnn(emb, TrainingOps.knnQueryIds, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rF = (fusedSet & truth).size.toDouble / truth.size
    val rH = (ham & truth).size.toDouble / truth.size
    assert(rF >= rH,
      f"fusion recall $rF%.2f fell below the hamming member's $rH%.2f")
  }
}
