package graft

import graft.operators.{Dedup, Selection, Sketch}
import org.apache.spark.sql.functions._

/** Round-11 additions: the Naive Bayes classifier (qd58) on a corpus
  * whose classes ARE token-separable (the sf corpora's lang labels
  * aren't, so their confusion matrices collapse toward the prior
  * argmax — the oracle pins that number; THESE pin that the model
  * actually learns when there is something to learn), and the
  * portable HLL's register math against a direct Scala reference.
  */
class Round11OpsSpec extends SparkSpec {

  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "lang")

  test("qd58: separable classes train to a diagonal confusion matrix") {
    val rows = (0 until 30).map { i =>
      val (lang, text) = i % 3 match {
        case 0 => ("aa", s"alpha beta gamma common$i shared")
        case 1 => ("bb", s"delta epsilon zeta common$i shared")
        case _ => ("cc", s"eta theta iota common$i shared")
      }
      (i.toLong, text, lang)
    }
    val df = docsDf(rows)
    val m = Selection.trainNb(df, vocabCap = 8192)
    assert(m.langs.sameElements(Array("aa", "bb", "cc")))
    assert(m.n == 30 && m.nl.forall(_ == 10))
    val got = Selection.nbConfusion(df, m).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("aa", "aa") -> 10L, ("bb", "bb") -> 10L,
      ("cc", "cc") -> 10L),
      s"marker tokens must dominate the class-conditional weights: $got")
  }

  test("qd58: token-free docs fall back to the prior argmax, " +
    "ties break lang-ascending") {
    // 'bb' holds the larger prior (3 docs vs 1); the token-free doc
    // carries no evidence and must be predicted bb.
    val df = docsDf(Seq(
      (1L, "alpha alpha alpha", "bb"),
      (2L, "beta beta beta", "bb"),
      (3L, "beta beta gamma", "bb"),
      (4L, "", "aa")))
    val m = Selection.trainNb(df, vocabCap = 8192)
    val got = Selection.nbConfusion(df, m).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("aa", "bb")) == 1L,
      s"the empty doc must take the larger prior: $got")
    // equal priors + identical scores: the tie must break to the
    // lexicographically first class on BOTH docs
    val tied = docsDf(Seq((1L, "x", "aa"), (2L, "x", "bb")))
    val mt = Selection.trainNb(tied, vocabCap = 8192)
    val gt = Selection.nbConfusion(tied, mt).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gt == Map(("aa", "aa") -> 1L, ("bb", "aa") -> 1L),
      s"score ties must break lang-ascending: $gt")
  }

  test("qd58: vocabulary cap binds and drops out-of-vocab evidence") {
    // cap=1 keeps only the most frequent token ("shared"); the class
    // markers fall out of vocabulary, so every doc scores prior-only
    // and predicts the prior argmax (ties lang-ascending: "aa").
    val df = docsDf(Seq(
      (1L, "alpha shared shared", "aa"),
      (2L, "beta shared shared", "bb")))
    val m = Selection.trainNb(df, vocabCap = 1)
    assert(m.vn == 1L && m.vocab.head._1 == "shared")
    val got = Selection.nbConfusion(df, m).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("aa", "aa") -> 1L, ("bb", "aa") -> 1L), s"$got")
  }

  /** Scala reference of the register derivation in
    * [[Sketch.hllProfile]] / the qd59 oracle.
    */
  private def refRegister(item: String): (Long, Int) = {
    val fp = graft.functions.DocFingerprint.reference(item)
    val h1 = (fp * 2654435761L) % 2147483648L
    val ha = h1 ^ (h1 >> 15)
    val h3 = (ha * 2246822519L) % 2147483648L
    val h2 = h3 ^ (h3 >> 13)
    val idx = h2 >> 23
    val r = h2 & ((1L << 23) - 1)
    val rho = if (r == 0) 24 else 24 - java.lang.Long.toBinaryString(r).length
    (idx, rho)
  }

  test("qd59: register math matches the Scala reference; estimate " +
    "exact in the linear-counting range") {
    val docs = (0 until 40)
      .map(i => (i.toLong, s"tok$i alpha beta gamma", "s0"))
      .toDF("doc_id", "text", "source")
    val out = Sketch.hllProfile(docs).collect()
    val tok = out.find(_.getString(1) == "token").get
    // 40 distinct tokN + 3 shared = 43 distinct tokens; 256-register
    // LC on 43 items is exact unless two items collide into one
    // register AND the raw estimate leaves the small range (it can't
    // at n=43) — compute the reference register set directly.
    val items = (0 until 40).map(i => s"tok$i") ++ Seq("alpha", "beta", "gamma")
    val refRegs = items.map(refRegister).toSet
    val refZeros = 256 - refRegs.map(_._1).size
    assert(tok.getLong(3) == 43, "exact_distinct")
    assert(tok.getLong(5) == refZeros.toLong,
      "zero-register count must match the reference registers")
    val refEst = math.floor(256.0 * math.log(256.0 / refZeros) + 0.5).toLong
    assert(tok.getLong(4) == refEst,
      s"linear-counting estimate must equal the reference: $tok")
    // shingle grain present with its own row
    assert(out.count(_.getString(1) == "shingle") == 1)
  }

  test("qd59: sketch state is register-bounded, not cardinality-bounded") {
    // Even with every item distinct, the register grain holds at most
    // 256 rows per (source, grain): the 100 TB contract.
    val docs = (0 until 500)
      .map(i => (i.toLong, (0 until 8).map(j => s"w${i}_$j").mkString(" "), s"s${i % 2}"))
      .toDF("doc_id", "text", "source")
    val out = Sketch.hllProfile(docs).collect()
    val byKey = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    byKey.foreach { case ((_, _), r) =>
      val exact = r.getLong(3)
      val est = r.getLong(4)
      // 2000 distinct items per source/grain: the estimate must land
      // within the documented ±20% (3σ at m=256) of the exact count
      assert(est > exact * 8 / 10 && est < exact * 12 / 10,
        s"estimate $est too far from exact $exact")
    }
  }

  test("qd60: exact overlap columns are hand-exact; register union " +
    "is a monoid — pair estimates tie out bit-exactly against qd59's " +
    "per-source estimates") {
    // s0 shingles {a b c, b c d, c d e, d e f}; s1 {c d e, d e f,
    // e f g, f g h} → overlap 2, union 6; s2 carries s0 ∪ s1's items
    // exactly, so union registers of every pair here are s2's OWN
    // 256-vector. With e_i = qd59's shingle-grain estimate of source
    // i, inclusion–exclusion forces, to the bit:
    //   est_overlap(s0,s1) = e0 + e1 − e2   (U = est(s2))
    //   est_overlap(s0,s2) = e0             (s0 ⊆ s2 ⇒ union = s2)
    //   est_overlap(s1,s2) = e1
    val docs = Seq(
      (1L, "a b c d e f", "s0"),
      (2L, "c d e f g h", "s1"),
      (3L, "a b c d e f", "s2"),
      (4L, "c d e f g h", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Sketch.hllOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val r01 = out(("s0", "s1"))
    assert(r01.getLong(2) == 4 && r01.getLong(3) == 4 &&
      r01.getLong(4) == 2, s"exact columns: $r01")
    assert(r01.getLong(6) == 333333L, "jacc_micro = floor(2/6·10⁶+.5)")
    val e = Sketch.hllProfile(docs)
      .collect().filter(_.getString(1) == "shingle")
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out(("s0", "s2")).getLong(5) == e("s0"))
    assert(out(("s1", "s2")).getLong(5) == e("s1"))
    assert(r01.getLong(5) == e("s0") + e("s1") - e("s2"))
  }

  test("qd60: estimates land within the documented band at real " +
    "cardinality; zero-overlap pairs are reported, not dropped") {
    // two sources with ~1000 distinct items each, zero overlap —
    // the pair row must exist with exact_overlap 0 and an est_overlap
    // that is small relative to the union (sketch noise, honest sign)
    val docs = (0 until 250).map { i =>
      (i.toLong, (0 until 6).map(j => s"a${i}x$j").mkString(" "), "sa")
    } ++ (0 until 250).map { i =>
      ((i + 1000).toLong, (0 until 6).map(j => s"b${i}y$j").mkString(" "), "sb")
    }
    val out = Sketch.hllOverlap(docs.toDF("doc_id", "text", "source"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(4) == 0L, "exact overlap is zero by construction")
    val exactUnion = r.getLong(2) + r.getLong(3)
    assert(math.abs(r.getLong(5)) < exactUnion / 5,
      s"noise bound: est_overlap ${r.getLong(5)} vs union $exactUnion")
    assert(math.abs(r.getLong(7)) < 200000L,
      "jaccard estimate of disjoint sources stays near zero")
  }

  test("qd61: hand-exact bucket answers; estimate is the answering " +
    "bucket's lower edge, never above exact, within 12.5%") {
    // 100 → e=6, sub=(800>>6)−8=4, lo=((12)<<6)>>3=96;
    // 200 → e=7, sub=4, lo=192; 400 → e=8, sub=4, lo=384.
    // n=4: k50=2 (exact 200), k90=4 (exact 400), k99=4.
    val docs = Seq((1L, 100L), (2L, 200L), (3L, 300L), (4L, 400L))
      .map { case (id, n) => (id, n, "sA") }
      .toDF("doc_id", "n_chars", "source")
    val got = Sketch.quantileSketch(docs).collect()
      .map(r => (r.getInt(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got(50) == ((4L, 200L, 192L, -40000L)), s"$got")
    assert(got(90) == ((4L, 400L, 384L, -40000L)), s"$got")
    assert(got(99) == ((4L, 400L, 384L, -40000L)), s"$got")
    // guaranteed-error property at scale: the answering bucket
    // CONTAINS the rank-k value, so lower edge ≤ exact and the
    // relative shortfall is bounded by the bucket width / lower edge
    // = 1/8 — for any value distribution
    val big = (1 to 1000)
      .map(i => (i.toLong, (i * 37 % 997 + 1).toLong, s"s${i % 3}"))
      .toDF("doc_id", "n_chars", "source")
    Sketch.quantileSketch(big).collect().foreach { r =>
      val (exact, est, err) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(est <= exact && err <= 0L && err >= -125000L,
        s"bound violated: exact $exact est $est err $err")
    }
  }

  test("gramsRelational carry threads doc-constant columns without " +
    "changing the gram set") {
    val df = Seq((1L, "a b c d", "sA"), (2L, "x y", "sB"))
      .toDF("doc_id", "text", "source")
    val plain = Dedup.gramsRelational(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val carried = Dedup
      .gramsRelational(df, "doc_id", "text", carry = Seq("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(carried.map(t => (t._1, t._3)).toSet == plain)
    assert(carried.forall(t =>
      t._2 == (if (t._1 == 1L) "sA" else "sB")))
  }
}
