package graft

import org.apache.spark.sql.functions._

/** Round-11 closures. The headline item is the fingerprint
  * byte-vs-codepoint trap (VERDICT r10 "what's wrong" #1): every
  * DuckDB oracle of the portable fingerprint folds per-character
  * `unicode(c)` CODEPOINTS, while DocFingerprint folded UTF-8 BYTES
  * — identical on the all-ASCII gate corpus, divergent on the first
  * multilingual document. Round 11 moved DocFingerprint to a
  * codepoint fold; these tests pin the parity on text the corpus
  * cannot supply (2-, 3- and 4-byte UTF-8 sequences).
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("doc_fingerprint folds CODEPOINTS: non-ASCII parity with unicode(c)") {
    graft.functions.DocFingerprint.register(spark)
    // 2-byte (Latin-1 supplement), 3-byte (CJK), 4-byte (astral /
    // surrogate pair in UTF-16) sequences plus mixed text — each
    // class exercises a distinct branch of the inline UTF-8 decode
    val texts = Seq(
      "héllo wörld",                 // 2-byte seqs
      "你好，世界",                   // 3-byte seqs
      "math: 𝒜 plus 😀",  // 4-byte seqs (astral)
      "mixed: aé中😊z9",
      "",                            // empty stays 0
      "plain ascii 42")
    val got = texts.toDF("text")
      .select(graft.functions.DocFingerprint.of(col("text")).as("fp"))
      .collect().map(_.getLong(0))
    // the oracle semantic, computed independently: fold h*31 + cp
    // over Unicode codepoints exactly as DuckDB's
    // list_transform(string_split(text,''), c -> unicode(c)) does
    val want = texts.map { t =>
      var h = 0L
      t.codePoints().toArray.foreach { cp =>
        h = (h * 31L + cp) % graft.functions.DocFingerprint.Modulus
      }
      h
    }
    assert(got.toSeq == want)
    assert(want(0) != want(5), "non-ASCII text must not hash like ASCII")
    // and the byte fold it replaced must NOT match on non-ASCII —
    // proving the test would have caught the original trap
    val byteFold = {
      var h = 0L
      for (b <- texts.head.getBytes("UTF-8"))
        h = (h * 31L + (b & 0xff)) % graft.functions.DocFingerprint.Modulus
      h
    }
    assert(byteFold != want.head,
      "a byte fold must diverge from the codepoint fold on non-ASCII")
  }

  test("ArtifactStore reap ages from SUPERSESSION, not build time") {
    // ADVICE r10: the old guard filtered on the stale dir's own mtime
    // (its BUILD time), so a tree built >15 min ago was unlinked the
    // instant a new stamp published — exactly when a lazy reader may
    // still scan it. The marker protocol defers deletion one aged pass.
    import org.apache.spark.sql.SaveMode
    val dir = tempDir("reapsrc")
    val name = "reap_probe_" + System.nanoTime()
    spark.range(5).toDF("x").write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    def build(v: Int) = graft.io.ArtifactStore.parquetArtifact(
      spark, dir, "documents", name, version = v) {
      spark.range(v).toDF("v")
    }
    build(1)
    val root = graft.io.ArtifactStore.scratchRoot.listFiles()
      .filter(_.getName.startsWith(name)).head
    def dataDirs = root.listFiles().filter(_.getName.startsWith("data-"))
    val first = dataDirs.head
    // age the v1 tree far past the cutoff: under build-time ageing it
    // would be reaped by the very next publish
    first.setLastModified(System.currentTimeMillis - 60L * 60 * 1000)
    build(2)
    assert(first.isDirectory,
      "just-superseded tree must survive the publish that superseded it")
    val marker = new java.io.File(root, "stale-" + first.getName)
    assert(marker.exists, "supersession must be marked")
    // now age the MARKER past the cutoff; the next publish pass reaps
    marker.setLastModified(System.currentTimeMillis - 16L * 60 * 1000)
    build(3)
    assert(!first.exists, "aged-marker tree is reaped on a later pass")
    assert(!marker.exists, "reap removes its marker")
    assert(dataDirs.length >= 1)
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec); f.delete()
    }
    deleteRec(root)
  }

  test("qd56 carry-threaded resample ≡ the join-shaped score+fp form") {
    import graft.operators.Selection
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val model = Selection.trainDsir(docs, col("source") === "src0")
    val got = Selection.dsirResample(docs, model, k = 16).collect()
    // independent join-shaped reference: score via dsirScore, fp via a
    // separate scan, zero-fill, same key
    graft.functions.DocFingerprint.register(spark)
    val want = docs.select(col("doc_id"), col("source"),
        graft.functions.DocFingerprint.of(col("text")).as("fp"))
      .join(Selection.dsirScore(docs, model)
          .select("doc_id", "score_micro"), Seq("doc_id"), "left")
      .withColumn("score_micro", coalesce(col("score_micro"), lit(0L)))
      .withColumn("sel_key", expr(Selection.keyMicroSql))
      .select(col("doc_id"), col("source"), col("sel_key"),
        (col("score_micro").cast("double") / lit(1000000.0)).as("score"))
      .orderBy(col("sel_key").desc, col("doc_id"))
      .limit(16).collect()
    assert(got.toSeq == want.toSeq)
    // and the carried shape keeps ONE Generate / ONE scan of documents
    val plan = Selection.dsirResample(docs, model, k = 16)
      .queryExecution.executedPlan.toString
    assert(plan.split("Generate").length - 1 == 1,
      "resample must tokenize in a single Generate")
  }

  test("qd57: publish ∘ publish ≡ rebuild on the union, through parquet") {
    // the production arrival loop, two generations deep: batch b1
    // folds into the standing index, the result is WRITTEN and READ
    // BACK (the durability seam batch N+1 actually crosses), then b2
    // folds into that — labels must equal the one-shot rebuild on
    // corpus ∪ b1 ∪ b2, cluster ids included (min-label quotient
    // argument in Dedup.refreshClusterLabels's scaladoc).
    import graft.operators.Dedup
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val isB1 = col("source") === "src18"
    val isB2 = col("source") === "src19"
    val corpus0 = docs.where(!isB1 && !isB2)
    def cluster(d: org.apache.spark.sql.DataFrame) =
      Dedup.dupClustersStar(d,
        Dedup.minhashNearDups(d, "doc_id", "text", threshold = 0.9),
        "doc_id").select(col("id").as("doc_id"), col("cluster"))
    val standing0 = Dedup.StandingIndex(cluster(corpus0),
      Dedup.bandIndex(corpus0, "doc_id", "text"))
    val gen1 = Dedup.publishRefresh(standing0, docs.where(!isB2),
      isCorpus = !isB1, threshold = 0.9)
    val d = tempDir("pubidx")
    gen1.labels.write.parquet(s"$d/labels")
    gen1.bands.write.parquet(s"$d/bands")
    val gen1r = Dedup.StandingIndex(spark.read.parquet(s"$d/labels"),
      spark.read.parquet(s"$d/bands"))
    val gen2 = Dedup.publishRefresh(gen1r, docs,
      isCorpus = !isB2, threshold = 0.9)
    val got = gen2.labels.orderBy("doc_id").collect().toSeq
    val want = cluster(docs).orderBy("doc_id").collect().toSeq
    assert(got == want)
    // the appended band index is the rebuild's band index, row for row
    val gotBands = gen2.bands
      .groupBy("doc_id").count().orderBy("doc_id").collect().toSeq
    val wantBands = Dedup.bandIndex(docs, "doc_id", "text")
      .groupBy("doc_id").count().orderBy("doc_id").collect().toSeq
    assert(gotBands == wantBands)
  }

  test("Eigen.symmetric: known spectrum, orthogonality, residual") {
    // eigenvalues of [[2,1,0],[1,2,1],[0,1,2]] are 2, 2±√2
    val a = Array(Array(2.0, 1.0, 0.0), Array(1.0, 2.0, 1.0),
      Array(0.0, 1.0, 2.0))
    val (vals, rows) = graft.core.Eigen.symmetric(a)
    val want = Seq(2.0 + math.sqrt(2), 2.0, 2.0 - math.sqrt(2))
    vals.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    // rows orthonormal
    for (i <- 0 until 3; j <- 0 until 3) {
      val d = rows(i).zip(rows(j)).map { case (x, y) => x * y }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-12)
    }
    // A v = λ v
    for (i <- 0 until 3; r <- 0 until 3) {
      val av = a(r).zip(rows(i)).map { case (x, y) => x * y }.sum
      assert(math.abs(av - vals(i) * rows(i)(r)) < 1e-10)
    }
  }

  test("pcaRotation: orthogonal, sorted spectrum, trace-preserving") {
    import graft.operators.TrainingOps
    val dir = "/root/testdata/sf0.001"
    val (vals, rot) = TrainingOps.pcaRotation(spark, dir)
    val n = rot.length
    assert(n == 64)
    for (i <- 0 until n; j <- i until n) {
      val d = rot(i).zip(rot(j)).map { case (x, y) => x * y }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"rotation rows $i,$j not orthonormal: $d")
    }
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b - 1e-12 },
      "eigenvalues must come sorted descending")
    // Σλ = trace(cov): recompute the covariance trace independently
    // from raw micro-quantized moments
    val emb = graft.core.Tables.embeddings(spark, dir)
    val mom = emb.select(posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("d"), floor(col("x").cast("double") * 1e6)
        .cast("long").as("q"))
      .groupBy("d")
      .agg(count(lit(1)).as("n"), sum("q").as("s1"),
        sum(col("q") * col("q")).as("s2"))
      .collect()
    val trace = mom.map { r =>
      val n1 = r.getLong(1).toDouble
      val m1 = r.getLong(2).toDouble / 1e6 / n1
      r.getLong(3).toDouble / 1e12 / n1 - m1 * m1
    }.sum
    assert(math.abs(vals.sum - trace) < 1e-6 * math.max(1.0, trace))
  }

  test("rotateEmbeddings preserves norms; rotated SQ8 recall measured") {
    import graft.operators.{Sq, TrainingOps, Similarity}
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.embeddings(spark, dir)
    val (_, rot) = TrainingOps.pcaRotation(spark, dir)
    val rotated = TrainingOps.rotateEmbeddings(emb, rot)
    graft.functions.VecDot.register(spark)
    val norms = emb
      .join(rotated.withColumnRenamed("embedding", "rotated"), Seq("vec_id"))
      .select(
        graft.functions.VecDot.of(col("embedding"), col("embedding"))
          .as("n0"),
        graft.functions.VecDot.of(col("rotated"), col("rotated")).as("n1"))
      .collect()
    norms.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <
        1e-3 * (1.0 + r.getDouble(0)), "rotation must preserve norms")
    }
    // the OPQ payoff question, MEASURED (the r10 verdict's ask): SQ8
    // recall@10 at shortlist 25 on raw vs PCA-rotated embeddings.
    // Rotation preserves exact cosine, so the truth is the raw one.
    val qids = TrainingOps.knnQueryIds
    val truth = Similarity.bruteForceKnn(emb, qids, 10)
      .select("query_id", "vec_id")
    def recallOf(e: org.apache.spark.sql.DataFrame): Double = {
      val short = Sq.approxIntShortlist(e, Sq.train(e), qids, 25)
      truth.join(short.select("query_id", "vec_id"),
        Seq("query_id", "vec_id"), "left_semi").count().toDouble /
        truth.count().toDouble
    }
    val raw = recallOf(emb)
    val rotR = recallOf(rotated.cache())
    info(f"sq8 recall@10/25 raw=$raw%.3f rotated=$rotR%.3f")
    rotated.unpersist(blocking = false)
    // synthetic near-isotropic embeddings leave little for PCA to
    // reclaim — the pinned claim is "doesn't break the quantizer",
    // the measured delta is the report (BASELINE.md qe24 note)
    assert(rotR >= raw - 0.15)
    assert(raw > 0.5)
  }

  test("pq/cell artifacts ≡ fresh encode (parity)") {
    import graft.operators.{PqInt, TrainingOps}
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.embeddings(spark, dir)
    val fresh = PqInt.codeFrame(emb, PqInt.dimMapIdentity(spark))
      .orderBy("vec_id", "m").collect().toSeq
    val art = TrainingOps.pqCodesInt(spark, dir)
      .orderBy("vec_id", "m").collect().toSeq
    assert(fresh == art)
    val freshCells = PqInt.cellFrame(emb).orderBy("vec_id").collect().toSeq
    val artCells = TrainingOps.ivfCellsInt(spark, dir)
      .orderBy("vec_id").collect().toSeq
    assert(freshCells == artCells)
  }

  test("doc_fingerprint: codegen and interpreted paths agree off-ASCII") {
    graft.functions.DocFingerprint.register(spark)
    val texts = Seq("é", "中文 docs", "😀😀", "añño")
    val df = texts.toDF("text")
    val gen = df.select(graft.functions.DocFingerprint.of(col("text")))
      .collect().map(_.getLong(0)).toSeq
    // filter through a non-codegen barrier is unreliable; instead hit
    // the interpreted path directly via the expression's eval
    val interp = texts.map { t =>
      graft.functions.DocFingerprint(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[Long]
    }
    val ref = texts.map(graft.functions.DocFingerprint.reference)
    assert(gen == ref)
    assert(interp == ref)
  }
}
