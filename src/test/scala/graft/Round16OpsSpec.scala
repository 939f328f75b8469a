package graft

import org.apache.spark.sql.functions._

/** Round-16 additions (VERDICT r15 #2/#3/#4/#7): the calibrated
  * composed admission drain (qs47), qe27's honest partial-probe
  * recall floors, the round-3 unigram vocab's application pass
  * (qd74), and the edit index's publish-back loop (qd75).
  *
  * FIXTURES rule: every floor here is measured on the live sf0.001
  * corpus — re-verify after any testdata regeneration.
  */
class Round16OpsSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  // ---- qe27: honest-nProbe recall (VERDICT r15 #3) -----------------

  test("qe27: partial-probe hard-negative recall@10 vs full-probe truth") {
    import graft.operators.TrainingOps
    def pairs(np: Int): Set[(Long, Long)] =
      TrainingOps.knnHardNegativesAt(spark, dir, np)
        .select("query_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Int.MaxValue)
    assert(truth.nonEmpty)
    val recalls = Seq(4, 8, 16).map { np =>
      val r = pairs(np).intersect(truth).size.toDouble / truth.size
      info(f"qe27 recall@10 at nProbe=$np: $r%.3f")
      np -> r
    }.toMap
    // probe sets are nested (nearest-n cells are a prefix of
    // nearest-n+1), so candidates only grow with nProbe
    assert(recalls(4) <= recalls(8) + 1e-9 &&
      recalls(8) <= recalls(16) + 1e-9,
      s"recall not monotone in nProbe: $recalls")
    // floors set ~0.1 under the live-corpus measurement (round 16:
    // 0.460 / 0.660 / 0.900) — hard negatives recall lower than
    // qe25's same-pool search at equal nProbe, exactly the expected
    // complement-pool spread across cells
    assert(recalls(4) >= 0.35, f"nProbe=4 recall ${recalls(4)}%.3f")
    assert(recalls(8) >= 0.55, f"nProbe=8 recall ${recalls(8)}%.3f")
    assert(recalls(16) >= 0.75, f"nProbe=16 recall ${recalls(16)}%.3f")
  }

  // ---- qd74: round-3 vocab application (VERDICT r15 #4) ------------

  test("qd74: round-3 vocab keeps every corpus single char segmentable") {
    import graft.operators.UnigramLm
    val v3 = UnigramLm.kept3Vocab(spark, dir)
    // the segmentability invariant the pruned DP stands on: every
    // distinct corpus word must segment under the final vocab
    val words = UnigramLm.wordFreq(
        graft.core.Tables.documents(spark, dir))
      .select("word").collect().map(_.getString(0))
    words.foreach { w =>
      val seg = UnigramLm.segmentKept(w, v3)
      assert(seg.mkString("") == w, s"'$w' mis-segmented")
    }
    // and the final vocab is the TRAINED artifact: kept multi-char
    // pieces carry round-3 re-estimated scores
    val em3 = UnigramLm.emRound3(spark, dir).collect()
    val kept = em3.filter(_.getAs[Boolean]("kept"))
    kept.foreach { r =>
      assert(v3(r.getAs[String]("piece")) == r.getAs[Long]("new_unat"))
    }
  }

  test("qd74: per-language accounting is consistent with the encode grain") {
    import graft.operators.UnigramLm
    val byLang = UnigramLm.encode3ByLang(spark, dir).collect()
    assert(byLang.nonEmpty)
    byLang.foreach { r =>
      val words = r.getAs[Long]("n_words")
      val pieces = r.getAs[Long]("n_pieces")
      val fert = r.getAs[Double]("fertility")
      // a word is at least one piece; fertility >= 1 wherever words
      // exist (wordless groups pin 1.0)
      assert(pieces >= words)
      assert(fert >= 1.0 - 1e-12)
    }
    // group totals equal the doc-grain encode under the same vocab
    val docs = graft.core.Tables.documents(spark, dir)
    val docGrain = UnigramLm.encode(docs, UnigramLm.kept3Vocab(spark, dir))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(sum("n_pieces").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    byLang.foreach { r =>
      assert(r.getAs[Long]("n_pieces") == docGrain(r.getString(0)))
    }
  }

  // ---- qd75: edit-index publish-back (VERDICT r15 #7) --------------

  test("qd75: publish ∘ publish ≡ rebuild on the union, through parquet") {
    // the qd57 two-generation identity for the edit index: batch b1's
    // ADMITTED docs fold into the standing window/signature artifacts,
    // the result crosses the parquet durability seam, batch b2 folds
    // into that — and the grown index must equal the one-shot rebuild
    // on corpus ∪ admitted(b1) ∪ admitted(b2), row for row (both
    // tables are per-doc derivations, so union equality is the whole
    // claim — no quotient argument needed).
    import graft.operators.EditJoin
    val docs = graft.core.Tables.documents(spark, dir)
    val isB1 = col("source") === "src18"
    val isB2 = col("source") === "src19"
    val corpus0 = docs.where(!isB1 && !isB2)
    val w0 = EditJoin.corpusWindowIndex(corpus0, "doc_id", "text")
    val s0 = EditJoin.corpusSignatures(corpus0, "doc_id", "text")

    def admitted(corpus: org.apache.spark.sql.DataFrame,
                 w: org.apache.spark.sql.DataFrame,
                 sg: org.apache.spark.sql.DataFrame,
                 batch: org.apache.spark.sql.DataFrame) =
      batch.join(
        EditJoin.editAdmission(corpus, w, sg, batch, "doc_id", "text")
          .filter(!col("is_dup")).select("doc_id"), "doc_id")

    val adm1 = admitted(corpus0, w0, s0, docs.where(isB1))
    val (w1, s1) = EditJoin.publishAdmitted(w0, s0, adm1, "doc_id", "text")
    val d = tempDir("editpub")
    w1.write.parquet(s"$d/w1"); s1.write.parquet(s"$d/s1")
    val w1r = spark.read.parquet(s"$d/w1")
    val s1r = spark.read.parquet(s"$d/s1")
    val corpus1 = corpus0.unionByName(adm1.select(corpus0.columns.map(col): _*))
    val adm2 = admitted(corpus1, w1r, s1r, docs.where(isB2))
    val (w2, s2) = EditJoin.publishAdmitted(w1r, s1r, adm2, "doc_id", "text")

    val grown = corpus1.unionByName(adm2.select(corpus0.columns.map(col): _*))
    def wRows(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("_idb", "_pb", "_ghb").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    def sRows(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getAs[scala.collection.Seq[Int]]("_hist").toSeq)).toSeq
    assert(wRows(w2) == wRows(
      EditJoin.corpusWindowIndex(grown, "doc_id", "text")))
    assert(sRows(s2) == sRows(
      EditJoin.corpusSignatures(grown, "doc_id", "text")))
    // and a generation genuinely grew (src18 plants only a few dups)
    assert(sRows(s1).size > sRows(s0).size)
  }

  // ---- vector-index publish-back (the qd75 move, vector tier) ------

  test("vec publish ∘ publish ≡ rebuild under the fixed quantizer, through parquet") {
    import graft.operators.{Ivf, Sq, VecAdmission}
    val docs = graft.core.Tables.documents(spark, dir)
    val emb = graft.core.Tables.embeddings(spark, dir)
    def embOf(pred: org.apache.spark.sql.Column) =
      emb.join(docs.where(pred).select(col("doc_id").as("vec_id")),
        "vec_id").select("vec_id", "embedding")
    val corpus0 = embOf(col("source") =!= "src18" &&
      col("source") =!= "src19")
    val b1 = embOf(col("source") === "src18")
    val b2 = embOf(col("source") === "src19")
    // gen-0 model, FIXED across generations (FAISS add-without-
    // retrain; a re-train is a re-index event under a new stamp)
    val model0 = Ivf.train(corpus0, k = 8, iters = 2)
    val sq0 = Sq.train(corpus0)
    // from-scratch derivation via an empty-index publish (keeps the
    // spec on the public surface: publish over empty ≡ fresh build)
    def derive(v: org.apache.spark.sql.DataFrame) = {
      val emptyCells = v.limit(0).select(col("vec_id"),
        lit(0).as("cluster"), lit(0.0).as("nrm"))
      val emptyCodes = Sq.encodePacked(v.limit(0), sq0)
      VecAdmission.publishAdmitted(emptyCells, emptyCodes, v, model0, sq0)
    }
    val (cells0, codes0) = derive(corpus0)
    val (w1, c1) = VecAdmission.publishAdmitted(cells0, codes0, b1,
      model0, sq0)
    val d = tempDir("vecpub")
    w1.write.parquet(s"$d/cells"); c1.write.parquet(s"$d/codes")
    val (w2, c2) = VecAdmission.publishAdmitted(
      spark.read.parquet(s"$d/cells"), spark.read.parquet(s"$d/codes"),
      b2, model0, sq0)
    val (wr, cr) = derive(corpus0.unionByName(b1).unionByName(b2))
    def cRows(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(cRows(w2) == cRows(wr))
    assert(cRows(c2) == cRows(cr))
    assert(cRows(w2).nonEmpty)
  }

  test("published vec artifacts = standing + admitted arrivals exactly") {
    import graft.operators.VecAdmission
    import graft.streaming.Admission
    val standing = VecAdmission.storedCells(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val admitted = VecAdmission.admittedArrivals(spark, dir,
        Admission.VecNeighborThreshold)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val published = VecAdmission.publishedCells(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(admitted.nonEmpty)
    assert(published == standing ++ admitted)
    val pubCodes = VecAdmission.publishedCodes(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pubCodes == published)
    // a rejected semantic near-dup exists OR every arrival was clean —
    // either way the verdict split is the exact parity-config one
    val arrivals = VecAdmission.arrivalEmb(spark, dir).count()
    assert(admitted.size <= arrivals)
  }

  // ---- qs47: the calibrated composed drain (VERDICT r15 #2) --------

  test("qs47: calibrated drain agrees with the parity drain (floors)") {
    import graft.streaming.Admission
    // sf0.01, not sf0.001: the corpus IVF there has ~26 cells, so
    // nProbe=16 is a GENUINE partial probe (at sf0.001 the model has
    // ~12 cells and 16 would silently be full probe — the floor must
    // be measured where the approximation actually bites)
    val dir = "/root/testdata/sf0.01"
    val parity = Admission.composedAdmissionGate(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          r.getBoolean(5))).toMap
    // qe25's calibrated config, pinned at the value VERDICT r15 #2
    // names (nProbe=16, shortlist=40 — the sf0.1 calibration point);
    // the shipped qs47 runs whatever calibrateOperatingPoint returns
    // for the live index generation
    val calib = Admission.composedAdmissionAt(spark, dir,
        nProbe = 16, shortlist = 40, outName = "calib_spec16")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          r.getBoolean(5))).toMap
    assert(calib.keySet == parity.keySet)
    // the lexical legs are exact at ANY vector config: bit-identical
    calib.foreach { case (id, (mh, ed, _, _, _)) =>
      assert(mh == parity(id)._1 && ed == parity(id)._2, s"doc $id")
    }
    // the approximate top-1 searches a SUBSET of the corpus, so it
    // can never report a better-than-true neighbor
    calib.foreach { case (id, (_, _, _, sim, _)) =>
      (sim, parity(id)._4) match {
        case (Some(c), Some(t)) => assert(c <= t + 1e-12, s"doc $id")
        case (c, t) => assert(c.isEmpty == t.isEmpty, s"doc $id")
      }
    }
    val n = parity.size.toDouble
    val agree = calib.count { case (id, v) => v._5 == parity(id)._5 } / n
    val top1 = calib.count { case (id, v) =>
      (v._4, parity(id)._4) match {
        case (Some(c), Some(t)) => c == t
        case (a, b) => a.isEmpty && b.isEmpty
      }
    } / n
    info(f"qs47 composed-verdict agreement: $agree%.3f, top-1 recall: $top1%.3f")
    // round-16 measurement at sf0.01: agreement 1.000 (every flip
    // needs a missed top-1 LANDING ACROSS the 0.4 threshold — rare by
    // construction), top-1 recall 0.960
    assert(agree >= 0.90, f"agreement $agree%.3f")
    assert(top1 >= 0.85, f"top-1 recall $top1%.3f")
  }
}
