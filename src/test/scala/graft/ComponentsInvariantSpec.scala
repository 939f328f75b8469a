package graft

import graft.core.Tables
import graft.operators.{Dedup, TrainingOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sf0.1-scale verification for the connected-components family
  * (qd13/qd16/qd36/qd44). The DuckDB recursive-CTE oracle is
  * infeasible past ~sf0.01 (>10 min at 5000 docs — VERDICT r7), so
  * the driver gate proves these only at sf0.01; this suite closes the
  * scale gap with an invariant CERTIFICATE instead of a recomputation:
  *
  *  1. labels are a valid partition — exactly one label per node,
  *     node set identical to the input;
  *  2. every label is its component's min — cluster <= id everywhere
  *     and, per cluster, min(member id) == cluster (so labels are
  *     canonical, not merely consistent);
  *  3. every near-dup pair's endpoints share a label (no UNDER-merge);
  *  4. every node labeled away from itself has at least one incident
  *     edge (no merge without edge support);
  *  5. the min-label (qd13) and large-star/small-star (qd16)
  *     algorithms — independent implementations with different round
  *     structure — produce IDENTICAL labelings (an over-merge would
  *     need the same spurious edge path in both).
  *
  * qd36 (cluster-keyed split) and qd44 (keep-longest representative)
  * are certified on top of the same labels: no cluster straddles the
  * train/test boundary; every cluster's representative is its
  * (n_chars desc, doc_id asc)-first member, independently re-derived
  * via an aggregate rather than the operator's own window.
  */
class ComponentsInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"

  test("qd13/qd16/qd36/qd44 invariants certify the components at sf0.1") {
    val docs = Tables.documents(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup
      .minhashNearDups(docs, "doc_id", "text", threshold = 0.9)
      .select("doc_a", "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val labels = Dedup.dupClusters(docs, pairs, "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = docs.count()

      // 1. valid partition over exactly the input nodes
      assert(labels.count() == nDocs, "one label row per document")
      assert(labels.select("id").distinct().count() == nDocs,
        "no document labeled twice")
      assert(labels.join(docs.select(col("doc_id").as("id")), Seq("id"),
        "left_anti").count() == 0, "label for a non-existent node")

      // 2. canonical min labels
      assert(labels.filter(col("cluster") > col("id")).count() == 0,
        "a label above its node id can never be a component min")
      assert(labels.groupBy("cluster").agg(min("id").as("mn"))
        .filter(col("mn") =!= col("cluster")).count() == 0,
        "every cluster label must be the min member id")

      // 3. co-labeled endpoints (no under-merge)
      val la = labels.select(col("id").as("doc_a"), col("cluster").as("ca"))
      val lb = labels.select(col("id").as("doc_b"), col("cluster").as("cb"))
      assert(pairs.join(la, "doc_a").join(lb, "doc_b")
        .filter(col("ca") =!= col("cb")).count() == 0,
        "a near-dup pair straddles two clusters")

      // 4. no merge without edge support
      val touched = pairs.select(col("doc_a").as("id"))
        .union(pairs.select(col("doc_b").as("id"))).distinct()
      assert(labels.filter(col("cluster") =!= col("id"))
        .join(touched, Seq("id"), "left_anti").count() == 0,
        "a node moved off its own label without any incident edge")

      // 5. algorithm cross-agreement (min-label vs star rounds)
      val star = Dedup.dupClustersStar(docs, pairs, "doc_id")
      assert(star.join(labels.withColumnRenamed("cluster", "c2"), "id")
        .filter(col("cluster") =!= col("c2")).count() == 0,
        "qd13 and qd16 labelings diverged")

      // qd36: split is a pure function of cluster — no straddling
      val split = TrainingOps.leakageSplitOn(docs)
      assert(split.select("cluster", "split").distinct()
        .groupBy("cluster").count().filter(col("count") > 1)
        .count() == 0, "a duplicate cluster straddles train/test")
      val nTrain = split.filter(col("split") === "train").count()
      assert(nTrain > 0 && nTrain < nDocs,
        "both splits must be populated at sf0.1")

      // qd44: representative = (n_chars desc, doc_id asc)-first
      // member, re-derived via max_by over a struct instead of the
      // operator's window
      val reps = TrainingOps.representativesOn(
        labels.withColumnRenamed("id", "doc_id"),
        docs.select(col("doc_id"), col("n_chars")))
      val expect = labels.withColumnRenamed("id", "doc_id")
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster")
        .agg(expr("max_by(doc_id, struct(n_chars, -doc_id))").as("want"))
      assert(reps.select("cluster", "rep_id").distinct()
        .join(expect, "cluster")
        .filter(col("rep_id") =!= col("want")).count() == 0,
        "a cluster's representative is not its keep-longest member")
      info(s"certified $nDocs docs, ${pairs.count()} near-dup pairs, " +
        s"${labels.select("cluster").distinct().count()} clusters at sf0.1")
    } finally {
      docs.unpersist(blocking = false)
      pairs.unpersist(blocking = false)
    }
  }

  test("qd54: incremental refresh ≡ full rebuild at sf0.1") {
    // the contraction-equivalence claim certified at bench scale —
    // the driver gate can only check it at sf0.01 (qd54 shares qd13's
    // recursive-CTE oracle, the >180 s DuckDB class at sf0.1)
    val got = TrainingOps.refreshedDupLabels(spark, dir)
    val full = TrainingOps.dupClusters(spark, dir)
    assert(got.count() == full.count(), "row counts diverge")
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty,
      "refresh labels diverge from the full rebuild at sf0.1")
    // no reap needed: the operators' internal materializations are
    // eager localCheckpoints, freed on GC by the ContextCleaner
  }
}
