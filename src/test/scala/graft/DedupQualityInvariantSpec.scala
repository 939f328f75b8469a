package graft

import graft.core.Tables
import graft.operators.TrainingOps
import org.apache.spark.sql.functions._

/** sf0.1-scale verification for qd48 (VERDICT r8 #5). The DuckDB
  * oracle's EXHAUSTIVE truth side is n²/2 list intersections —
  * infeasible past sf0.01 (the components-family precedent) — so the
  * driver gate proves qd48 only at gate scale; this suite closes the
  * scale gap with an invariant CERTIFICATE instead of a recomputation:
  *
  *  1. report sanity — found ⊆ true per threshold (banding can only
  *     admit scored pairs), recall ∈ [0, 1];
  *  2. threshold monotonicity — true_pairs and found_pairs are
  *     non-increasing in the threshold (a ≥ t pair is a ≥ t' pair for
  *     t' < t, and the same filter nests on the admitted side);
  *  3. corpus-measured recall floors — at sf0.1 the banding misses
  *     exactly one true pair (recall ≈ 0.996 at every threshold,
  *     within the 4×4 geometry's theoretical miss rate); floors pin
  *     the measurement (re-verify after any testdata regeneration —
  *     FIXTURES.md);
  *  4. planted-pair recovery — append exact copies of existing
  *     documents: each copy pairs with its source at jaccard 1 (same
  *     gram set ⇒ same minhash signature ⇒ same band keys ⇒ admitted
  *     with certainty), so every threshold's true_pairs AND
  *     found_pairs must rise by at least the planted count, with
  *     recall still 1.0 on the planted mass.
  */
class DedupQualityInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"
  private val thresholds = Seq(0.5, 0.7, 0.9)

  private def report(docs: org.apache.spark.sql.DataFrame)
      : Map[Double, (Long, Long, Double)] =
    TrainingOps.dedupQualityOn(docs, thresholds).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("qd48 invariants certify the blocking report card at sf0.1") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val base = report(docs)
      assert(base.keySet == thresholds.toSet)

      // 1. admitted ⊆ scored; recall well-formed
      thresholds.foreach { t =>
        val (tr, f, rec) = base(t)
        assert(f <= tr, s"t=$t: found $f exceeds true $tr")
        assert(rec >= 0.0 && rec <= 1.0, s"t=$t: recall $rec out of range")
      }

      // 2. pair counts non-increasing in threshold
      val ordered = thresholds.sorted.map(base)
      assert(ordered.map(_._1).sliding(2).forall(s => s.head >= s.last),
        s"true_pairs not monotone: $ordered")
      assert(ordered.map(_._2).sliding(2).forall(s => s.head >= s.last),
        s"found_pairs not monotone: $ordered")

      // 3. corpus-measured floors (FIXTURES.md: re-verify after any
      // testdata regeneration). sf0.1 measured: (true, found) =
      // (256, 255) at t=0.5/0.7 and (249, 248) at t=0.9 — exactly ONE
      // pair escapes the 4x4 banding, consistent with its theoretical
      // miss rate (1-(1-(1-j^4)^4) ≈ 1.4% per pair at j=0.9, ~3.5
      // expected misses in 249) — the honest banding curve at work.
      info(s"sf0.1 qd48 report: ${thresholds.sorted.map(t => t -> base(t))}")
      thresholds.foreach { t =>
        assert(base(t)._3 >= 0.99,
          s"t=$t: measured sf0.1 recall was ${base(t)._3}, floor 0.99")
      }
      assert(base(0.5)._1 >= 250,
        s"truth mass vanished: ${base(0.5)._1} pairs at t=0.5 (measured 256)")

      // 4. planted exact-dup recovery
      val nPlant = 20
      val maxId = docs.agg(max("doc_id")).head.getLong(0)
      val planted = docs.filter(length(col("text")) >= 100)
        .orderBy("doc_id").limit(nPlant)
        .select((col("doc_id") + lit(maxId + 1L)).as("doc_id"), col("text"))
      val aug = report(docs.union(planted))
      thresholds.foreach { t =>
        val (tr0, f0, _) = base(t)
        val (tr1, f1, rec1) = aug(t)
        assert(tr1 >= tr0 + nPlant,
          s"t=$t: planted pairs missing from truth ($tr0 -> $tr1)")
        assert(f1 >= f0 + nPlant,
          s"t=$t: planted pairs not admitted by banding ($f0 -> $f1)")
        assert(rec1 >= 0.99, s"t=$t: recall fell to $rec1 after planting")
      }
    } finally {
      // dedupQualityOn's internal gram materialization is an eager
      // localCheckpoint — its blocks free on GC via the ContextCleaner
      // (VERDICT r10 #7), so only this suite's OWN persist needs reaping
      docs.unpersist(blocking = false)
    }
  }
}
