package graft

import org.apache.spark.sql.functions._

/** The BandedLevenshteinRewrite optimizer rule: every rewritten
  * comparison shape must be semantically identical to the unbounded
  * form (including three-valued logic on NULL inputs and the k = 0 /
  * boundary cases), and the rewrite must actually fire in the plans
  * the SQL surface produces.
  */
class BandedLevRuleSpec extends SparkSpec {

  import spark.implicits._

  /** Pure-Scala full-DP reference. */
  private def refLev(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    val dp = Array.tabulate(m + 1)(i => i)
    for (j <- 1 to n) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to m) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(m)
  }

  private val pairs: Seq[(String, String)] = Seq(
    ("kitten", "sitting"),      // 3
    ("", ""),                   // 0
    ("", "abc"),                // 3
    ("same", "same"),           // 0
    ("a", "b"),                 // 1
    ("abcdefgh", "hgfedcba"),   // far
    ("xy" * 50, ("xy" * 50).drop(1)), // 1 on long strings
    (null, "x"), ("x", null), (null, null))

  test("every rewritten comparison shape == reference three-valued logic") {
    val df = pairs.toDF("a", "b")
    for (k <- Seq(0, 1, 3, 12)) {
      val got = df.select(
        expr(s"levenshtein(a, b) <= $k").as("le"),
        expr(s"levenshtein(a, b) <  $k").as("lt"),
        expr(s"levenshtein(a, b) >  $k").as("gt"),
        expr(s"levenshtein(a, b) >= $k").as("ge"),
        expr(s"levenshtein(a, b) =  $k").as("eq"),
        expr(s"$k >= levenshtein(a, b)").as("rle"),
        expr(s"$k <  levenshtein(a, b)").as("rgt"))
        .collect()
      pairs.zip(got).foreach { case ((a, b), r) =>
        val d: Option[Int] =
          if (a == null || b == null) None else Some(refLev(a, b))
        def expect(f: Int => Boolean): Option[Boolean] = d.map(f)
        def cell(i: Int): Option[Boolean] =
          if (r.isNullAt(i)) None else Some(r.getBoolean(i))
        assert(cell(0) == expect(_ <= k), s"($a,$b) <= $k")
        assert(cell(1) == expect(_ < k), s"($a,$b) < $k")
        assert(cell(2) == expect(_ > k), s"($a,$b) > $k")
        assert(cell(3) == expect(_ >= k), s"($a,$b) >= $k")
        assert(cell(4) == expect(_ == k), s"($a,$b) = $k")
        assert(cell(5) == expect(_ <= k), s"($a,$b) rev<= $k")
        assert(cell(6) == expect(_ > k), s"($a,$b) rev> $k")
      }
    }
  }

  /** A parquet-backed frame: a filter over a LocalRelation would be
    * evaluated away by ConvertToLocalRelation before the plan could
    * be inspected.
    */
  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("the rule fires: unbounded predicate plans as the banded form") {
    val p = docs.filter(expr("levenshtein(text, lang) <= 3"))
      .queryExecution.optimizedPlan.toString
    assert(p.contains("Some(3)"),
      "predicate must be rewritten to the threshold form: " + p)
    assert(!"levenshtein\\([^)]*, None\\)".r.findFirstIn(p).isDefined,
      "no unbounded levenshtein may remain in the predicate: " + p)
    // boundary: k in a strict compare shifts to k-1
    val p2 = docs.filter(expr("levenshtein(text, lang) < 3"))
      .queryExecution.optimizedPlan.toString
    assert(p2.contains("Some(2)"), p2)
  }

  test("the rewrite injects the length prune ahead of the banded DP") {
    // a SQL author writing the bare threshold predicate gets tier 1's
    // |Δlen| guard for free (round 14): the conjunct must sit BEFORE
    // the banded levenshtein in the rendered condition — codegen
    // evaluates conjuncts in printed order, so the guard
    // short-circuits non-candidates without running the DP
    val p = docs.filter(expr("levenshtein(text, lang) <= 3"))
      .queryExecution.optimizedPlan.toString
    val guard = p.indexOf("abs(")
    val lev = p.indexOf("levenshtein(")
    assert(guard >= 0 && p.contains("length("),
      "the |Δlen| <= k conjunct must be injected: " + p)
    assert(guard < lev,
      "the length guard must short-circuit ahead of the DP: " + p)
    // the distance-large direction guards as a DISJUNCT (|Δlen| > k
    // alone proves d > k)
    val pGt = docs.filter(expr("levenshtein(text, lang) > 3"))
      .queryExecution.optimizedPlan.toString
    assert(pGt.contains("abs(") && pGt.contains("Some(3)"), pGt)
    assert(pGt.indexOf("abs(") < pGt.indexOf("levenshtein("), pGt)
  }

  test("the rewritten form is a fixed point (no re-match, batch converges)") {
    for (pred <- Seq("levenshtein(text, lang) <= 3",
        "levenshtein(text, lang) > 3", "levenshtein(text, lang) = 3")) {
      val opt = docs.filter(expr(pred)).queryExecution.optimizedPlan
      val again = graft.plans.BandedLevenshteinRewrite(opt)
      assert(again.fastEquals(opt),
        s"rewritten '$pred' must not re-match: $opt")
    }
  }

  test("non-rewritable shapes are left alone") {
    // negative thresholds and non-literal comparands must not be
    // touched (the rule only claims k >= 0 / k >= 1)
    val pNeg = docs.filter(expr("levenshtein(text, lang) <= -1"))
      .queryExecution.optimizedPlan.toString
    assert(!pNeg.contains("Some("), pNeg)
    val pCol = docs.filter(expr("levenshtein(text, lang) <= n_chars"))
      .queryExecution.optimizedPlan.toString
    assert(!pCol.contains("Some("), pCol)
    // and the results stay correct
    assert(docs.filter(expr("levenshtein(text, lang) <= -1")).count() == 0)
    assert(docs.filter(expr("levenshtein(text, lang) <= n_chars")).count()
      == docs.count(),
      "distance to the short lang code is always under n_chars")
  }

  test("qx29 SQL surface == qd67 operator output at sf0.001") {
    val sqlOut = graft.operators.Extras
      .editSqlSurface(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    val opOut = graft.operators.EditJoin
      .editNearDupsQuery(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(sqlOut == opOut)
    assert(sqlOut.nonEmpty)
  }
}
