package graft

import graft.operators.{Scd2, TextPrep, TrainingOps}
import org.apache.spark.sql.functions._

/** Value-level checks for the corpus-prep and SCD2 operators (the
  * DuckDB oracle carries exactness at sf0.01/sf0.1; these pin the
  * semantics driver-side on sf0.001).
  */
class TextPrepSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("chunking reconstructs every document from stride-aligned slices") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val chunks = TextPrep.chunkQuery(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[String]("chunk_text"), r.getAs[Int]("chunk_chars")))

    chunks.foreach { case (id, idx, text, chars) =>
      assert(text.length == chars)
      assert(chars >= 1 && chars <= 200)
      // each chunk is literally the doc's [idx*150, idx*150+200) slice
      val doc = docs(id)
      assert(text == doc.substring(idx * 150,
        math.min(idx * 150 + 200, doc.length)), s"doc $id chunk $idx")
    }
    // stitching strides (drop the 50-char overlap) reconstructs the doc
    docs.filter(_._2.nonEmpty).foreach { case (id, doc) =>
      val mine = chunks.filter(_._1 == id).sortBy(_._2)
      assert(mine.map(_._2).toSeq == mine.indices.toSeq, "contiguous idx")
      val stitched = mine.map(_._3.take(150)).mkString
      assert(stitched == doc, s"doc $id reconstruction")
    }
  }

  test("redaction masks every match and counts them; no-match rows pass through") {
    import spark.implicits._
    val df = Seq(
      (1L, "call customer at key stream point"),
      (2L, "the keystream is one word"),   // \b must NOT split keystream
      (3L, "customer customer customer"),
      (4L, ""))
      .toDF("doc_id", "text")
    val out = TextPrep.redact(df, "text",
        "\\b(customer|key|stream)\\b", "<PII>")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("redacted_text"), r.getAs[Int]("n_redacted"))).toMap
    assert(out(1L) == (("call <PII> at <PII> <PII> point", 3)))
    assert(out(2L) == (("the keystream is one word", 0)),
      "word boundary must not match inside a longer token")
    assert(out(3L) == (("<PII> <PII> <PII>", 3)))
    assert(out(4L) == (("", 0)))
  }

  test("stopword strip matches the scala reference filter") {
    val stop = TextPrep.stopwords.toSet
    val got = TextPrep.stripQuery(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("kept_text"),
        r.getAs[Int]("n_removed")))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(got.length == docs.size)
    got.foreach { case (id, kept, removed) =>
      val toks = docs(id).split(" ", -1)
      val keptRef = toks.filterNot(t => stop(t.toLowerCase))
      assert(kept == keptRef.mkString(" "), s"doc $id")
      assert(removed == toks.length - keptRef.length, s"doc $id count")
    }
    assert(got.map(_._3).sum > 0, "corpus should contain stopwords")
  }

  test("regex strip ≡ HOF strip on adversarial token boundaries") {
    import spark.implicits._
    // every shape the two-pass regex could get wrong: consecutive
    // stopwords, stop at start/end, all-stop, empty tokens from
    // doubled/leading/trailing spaces, stopword as substring of a
    // longer token, mixed case, empty string
    val rows = Seq(
      "the quick fox", "quick the fox", "quick fox the",
      "the the quick", "quick the the", "the the", "the", "",
      "THE In iS It a", "breathe other android",  // substrings must survive
      "x  the y", "the  x", "x the  y", " the x", "x the ", "  ",
      "a a a a", "is it the a of to and in", "wordthe theword")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rx = TextPrep.stripStopwords(rows, "text")
      .select("doc_id", "kept_text", "n_removed").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    val hof = TextPrep.stripStopwordsHof(rows, "text")
      .select("doc_id", "kept_text", "n_removed").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(rx == hof)
    // and on the real corpus, bit-for-bit
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = TextPrep.stripStopwords(docs, "text")
      .select("doc_id", "kept_text", "n_removed")
    val b = TextPrep.stripStopwordsHof(docs, "text")
      .select("doc_id", "kept_text", "n_removed")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("scd2 history forms gapless per-key interval chains") {
    val rows = Scd2.customerHistory(spark, sf).collect()
      .map(r => (r.getAs[Long]("cust"), r.getAs[Int]("version"),
        r.getAs[String]("valid_from"), r.getAs[String]("valid_to"),
        r.getAs[Boolean]("is_current")))
    val orders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.length == orders, "one version row per change-log row")
    rows.groupBy(_._1).foreach { case (cust, vs) =>
      val chain = vs.sortBy(_._2)
      assert(chain.map(_._2).toSeq == (1 to chain.length), s"cust $cust versions")
      // each valid_to is the next version's valid_from; the chain is gapless
      chain.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._4 == b._3, s"cust $cust gap at v${a._2}")
        assert(!a._5, "only the last version is current")
      }
      assert(chain.last._5 && chain.last._4 == "9999-12-31 00:00:00")
      assert(chain.forall(v => v._3 <= v._4), "intervals never invert")
    }
  }

  test("packing matches the sequential greedy reference and conserves the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_chars")))
    // sequential reference: per source in doc order, bin = floor(startOffset/2000)
    val ref = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var off = 0L
      rows.sortBy(_._2).toSeq.map { case (_, id, n) =>
        val bin = (off / 2000L).toInt; off += n; (src, bin, id, n)
      }
    }
    val refAgg = ref.groupBy(t => (t._1, t._2)).map { case ((src, bin), rs) =>
      (src, bin) -> ((rs.size.toLong, rs.map(_._4).sum,
        rs.map(_._3).min, rs.map(_._3).max))
    }
    val got = graft.operators.TextPrep.packQuery(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("bin")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("bin_chars"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))).toMap
    assert(got == refAgg)
    assert(got.values.map(_._2).sum == docs.map(_._3).sum, "chars conserved")
    assert(got.values.map(_._1).sum == docs.length, "docs conserved")
  }

  test("qd32: emitted sequences glue each bin's docs in id order and agree with qd19's bins") {
    import spark.implicits._
    // sizes 3,3,3,2,4 with budget 6: offsets 0,3,6,9,11 -> bins 0,0,1,1,1
    val docs = Seq(
      (1L, "g1", "aaa", 3L), (2L, "g1", "bbb", 3L), (3L, "g1", "ccc", 3L),
      (4L, "g1", "dd", 2L), (5L, "g1", "eeee", 4L),
      (6L, "g2", "zz", 2L))
      .toDF("doc_id", "source", "text", "n_chars")
    val got = graft.operators.TextPrep.packSequences(
        docs, "source", "doc_id", "text", "n_chars", budget = 6, sep = "|")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Int]("bin")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Int]("seq_chars"),
          r.getAs[String]("seq_text")))).toMap
    assert(got(("g1", 0)) == ((2L, 7, "aaa|bbb")))
    assert(got(("g1", 1)) == ((3L, 11, "ccc|dd|eeee")),
      "doc 3 starts at offset 6 == budget -> bin 1; id order inside the bin")
    assert(got(("g2", 0)) == ((1L, 2, "zz")), "groups pack independently")
    // the emission's (group, bin, n_docs) grain must equal qd19's
    val stats = graft.operators.TextPrep.packBins(
        docs, "source", "doc_id", "n_chars", budget = 6)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Int]("bin")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(stats == got.view.mapValues(_._1).toMap,
      "packSequences and packBins must assign identical bins")
  }

  test("upsert labels update/insert/carry and the changes batch wins") {
    import spark.implicits._
    val snap = Seq((1L, "old", 10.0), (2L, "old", 20.0)).toDF("k", "v", "x")
    val upd = Seq((2L, "new", 22.0), (3L, "new", 30.0)).toDF("k", "v", "x")
    val got = graft.operators.Scd2.upsert(snap, upd, "k", Seq("v", "x"))
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[String]("v"), r.getAs[Double]("x"), r.getAs[String]("op"))))
      .toMap
    assert(got == Map(
      1L -> (("old", 10.0, "carry")),
      2L -> (("new", 22.0, "update")),
      3L -> (("new", 30.0, "insert"))))
    // declared form: every customer appears exactly once, and updates
    // are exactly the customers with post-cutoff orders
    val rows = graft.operators.Scd2.customerUpsert(spark, sf).collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    assert(rows.map(_.getAs[Long]("cust")).distinct.length == rows.length)
    val changed = orders
      .filter(col("o_orderdate") >= to_timestamp(
        lit(graft.operators.Scd2.mergeCutoff)))
      .select("o_custkey").distinct.count()
    assert(rows.count(_.getAs[String]("op") != "carry") == changed)
  }

  test("snapshotDiff: op tags, no-change suppression, null-safe compare, carry cols") {
    import spark.implicits._
    val before = Seq((1L, Option("a"), 1.0), (2L, Option("b"), 2.0),
      (3L, Option("c"), 3.0), (4L, Option.empty[String], 4.0))
      .toDF("k", "v", "x")
    val after = Seq((2L, Option("b"), 22.0), (3L, Option("C"), 3.0),
      (4L, Option.empty[String], 44.0), (5L, Option("e"), 5.0))
      .toDF("k", "v", "x")
    val got = graft.operators.Scd2
      .snapshotDiff(before, after, "k", Seq("v"), Seq("x"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("op")).toMap
    // 2 (v unchanged; carry-col x changed but must NOT trigger) and
    // 4 (NULL <=> NULL) are suppressed
    assert(got == Map(1L -> "delete", 3L -> "update", 5L -> "insert"))
    val upd = graft.operators.Scd2
      .snapshotDiff(before, after, "k", Seq("v"), Seq("x"))
      .filter(col("k") === 3L).collect()(0)
    assert(upd.getAs[String]("old_v") == "c" && upd.getAs[String]("new_v") == "C")
    assert(upd.getAs[Double]("old_x") == 3.0 && upd.getAs[Double]("new_x") == 3.0)
  }

  test("norm audit sees the unit-normalized 64-dim corpus") {
    val rows = TrainingOps.normAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(total == spark.read.parquet(s"$sf/embeddings.parquet").count())
    rows.foreach { r =>
      assert(r.getAs[Int]("min_dim") == 64 && r.getAs[Int]("max_dim") == 64)
      assert(math.abs(r.getAs[Double]("min_norm") - 1.0) < 1e-5)
      assert(math.abs(r.getAs[Double]("max_norm") - 1.0) < 1e-5)
      assert(r.getAs[Double]("min_norm") <= r.getAs[Double]("max_norm"))
    }
  }
}
