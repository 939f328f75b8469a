package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  /** Driver-side reference: the same integer PageRank recurrence. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          scale: Long = 1000000000L): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = outdeg.keys.toSeq.sorted
    val n = nodes.size.toLong
    val r0 = scale / n
    val tele = 15L * r0 / 100L
    var pr = nodes.map(_ -> r0).toMap
    (1 to iters).foreach { _ =>
      val inc = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / outdeg(src) }.sum
      }
      pr = nodes.map(v => v -> (tele + 85L * inc.getOrElse(v, 0L) / 100L)).toMap
    }
    pr
  }

  test("hand graph: hub accumulates, teleport-only node floors") {
    // 1 and 2 point at each other AND both point at 3; 3 points at 1.
    // 3 is the hub (two in-edges); 2 has one in-edge (from 1); the
    // teleport floor shows on any node nobody points at — add 4 -> 1
    // with nothing pointing back at 4.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L), (4L, 1L))
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refPageRank(edges, 3)
    assert(got == want)
    // structural expectations, independent of the reference impl
    assert(got(3L) > got(2L), "two in-edges outrank one")
    val scale = 1000000000L
    val tele = 15L * (scale / 4) / 100L
    assert(got(4L) == tele, "no in-edges => teleport mass only")
  }

  test("mass is conserved up to truncation loss (never created)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (2L, 1L), (3L, 2L))
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 3)
      .collect().map(_.getLong(1))
    val scale = 1000000000L
    assert(got.sum <= scale, "integer truncation only sheds mass")
    assert(got.sum > scale * 9 / 10, "and sheds only a sliver of it")
  }

  test("contract validation: dangling dst-only node fails fast") {
    // node 4 is dst-only — silently dropped without validation
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 4L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      GraphOps.pageRank(edges, iters = 1, validateContract = true).collect()
    }
    assert(ex.getMessage.contains("dangling"))
    // a contract-satisfying graph passes with validation on, and
    // equals the unvalidated result
    val ok = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val a = GraphOps.pageRank(ok, 2, validateContract = true)
      .collect().map(_.toSeq).toSeq
    val b = GraphOps.pageRank(ok, 2).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("knnEdges artifact == fresh full-probe graph build (VERDICT r8 #2)") {
    val dir = "/root/testdata/sf0.001"
    val art = GraphOps.knnEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = graft.core.Tables.embeddings(spark, dir)
    val model = graft.operators.TrainingOps.ivfModel(spark, dir)
    val fresh = graft.operators.Similarity
      .knnGraphBlocked(emb, model, k = 3, nProbe = model.k)
      .select("vec_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(art == fresh)
    // second read serves the stored artifact (same rows, no rebuild)
    assert(GraphOps.knnEdges(spark, dir).count() == art.size.toLong)
  }

  test("bit-identical under repartition (exact integer arithmetic)") {
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i + 1) % 40), (i, (i + 7) % 40), (i, (i * 3 + 1) % 40)))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    val a = GraphOps.pageRank(df, iters = 3).collect().map(_.toSeq).toSeq
    val b = GraphOps.pageRank(df.repartition(5), iters = 3)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a == refPageRank(edges, 3).toSeq.sortBy(_._1)
      .map(p => Seq(p._1, p._2)))
  }
}
