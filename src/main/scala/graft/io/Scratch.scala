package graft.io

/** Scratch-tree management for the driver mains (Bench/Verify).
  *
  * q14's partitioned-write roundtrip used to create a fresh random
  * temp dir per invocation and reap old trees from INSIDE the declared
  * query (VERDICT r3 #4 — a query must be side-effect free beyond its
  * own scratch write). The query now overwrites one fixed path; this
  * helper cleans up legacy random-suffix trees once at main startup.
  */
object Scratch {

  /** Stamp-cached one-time landing under `root`: run `write` into
    * `root/landing` only when no marker matches the CURRENT source
    * stamp of `dir/documents.parquet`, so repeated gate invocations
    * (three bench runs × every qs* landing gate) skip re-exporting
    * the corpus as JSONL each time. The landing is the upstream
    * PRODUCER's work — a drop folder exists before any consumer runs
    * — so amortizing it keeps each gate measuring drain + state + its
    * read-side, the work the query declares. Stale markers are
    * removed on rewrite (a regenerated corpus re-lands exactly once).
    * Writers must be deterministic functions of the source table.
    *
    * `version` is REQUIRED and folds into the marker hash (ADVICE r12,
    * mirroring [[ArtifactStore.parquetArtifact]]): the landing content
    * also depends on CODE — the landed column set, the repartition
    * file count, qs38's planted corrupt rows, qs39's !isCorpus filter
    * — and markers live in /tmp and OUTLIVE the JVM, so each call
    * site must bump its version whenever its writer logic changes or
    * a stale landing from a previous session is served silently.
    */
  def landedOnce(dir: String, root: String, version: Int)
                (write: String => Unit): String =
    stampedOnce(dir, root, "landing", "documents", version)(write)

  /** The [[landedOnce]] contract generalized to any scratch subdir
    * derived from any single source table (round 14, ADVICE r13:
    * qx28's ORC tree keyed on bare path existence, so any session
    * that skipped reapTmp served a stale tree after a testdata
    * regeneration). One marker per (source stamp, version) under
    * `root`; rewrite drops stale markers so a regenerated source
    * re-materializes exactly once.
    */
  def stampedOnce(dir: String, root: String, subdir: String, table: String,
                  version: Int)(write: String => Unit): String = {
    val target = new java.io.File(root, subdir).getAbsolutePath
    val stamp = s"v$version;$subdir;" + ArtifactStore.tableStamp(dir, table)
    val hash = java.lang.Long.toHexString(
      (scala.util.hashing.MurmurHash3.stringHash(stamp).toLong << 32)
        | (scala.util.hashing.MurmurHash3
            .stringHash(stamp.reverse).toLong & 0xffffffffL))
    val marker = new java.io.File(root, s"landed-$subdir-$hash")
    if (!marker.exists || !new java.io.File(target).isDirectory) {
      write(target)
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(s"landed-$subdir-") &&
          f.getName != marker.getName)
        .foreach(_.delete(): Unit)
      marker.createNewFile(): Unit
    }
    target
  }

  /** Fixed q14 scratch root: overwritten in place on every run, so
    * repeated bench/verify invocations never accumulate directory
    * trees (~2100 hive dirs each at sf0.1).
    */
  def q14Dir: String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_q14_scratch").getAbsolutePath

  /** qp1's partitioned-mart layout, one fixed path per sf dir (its
    * content is a function of the source data, so the path must key
    * on it — a Bench-at-sf0.1 run after a Verify-at-sf0.01 run must
    * not read the smaller mart).
    */
  def qp1Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qp1_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qx13's bucketed-table root, keyed like [[qp1Dir]]. */
  def qx13Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qx13_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qx20's schema-era roots (two parquet trees with DIFFERENT
    * schemas, read back via mergeSchema), keyed like [[qp1Dir]].
    */
  def qx20Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qx20_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qs16's foreachBatch sink root (one subdir per micro-batch id),
    * keyed like [[qp1Dir]].
    */
  def qs16Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qs16_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qp5's z-ordered lineitem layout, keyed like [[qp1Dir]]. */
  def qp5Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qp5_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qx24's federation scratch (csv leg), keyed like [[qp1Dir]]. */
  def qx24Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qx24_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qp4's compaction roots (fragmented + compacted trees), keyed
    * like [[qp1Dir]].
    */
  def qp4Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qp4_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qp8's refreshable-mart root (v1 snapshot then dynamic partition
    * overwrite), keyed like [[qp1Dir]].
    */
  def qp8Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qp8_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qd49's JSONL export/ingest roots (good + planted-corrupt
    * files), keyed like [[qp1Dir]].
    */
  def qd49Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qd49_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qs38's streaming-JSONL landing root (good export + planted
    * corrupt file in ONE directory — the file-stream source lists a
    * single landing path), keyed like [[qp1Dir]].
    */
  def qs38Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qs38_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qs39's admission-gate roots (JSONL batch landing + per-batch
    * verdict sink), keyed like [[qp1Dir]].
    */
  def qs39Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qs39_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** The sketch family's SHARED streaming landing root (round 13):
    * qs40–qs43 all drain the same corpus arrival, so they share one
    * landed JSONL tree (the per-gate qs40–qs43 roots this replaces
    * held four identical copies). Keyed like [[qp1Dir]].
    */
  def sketchDir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_sketch_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qx28's ORC roundtrip root, keyed like [[qp1Dir]]. */
  def qx28Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qx28_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** qd50's sharded-export root, keyed like [[qp1Dir]]. */
  def qd50Dir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_qd50_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** Streaming landing dir (symlink to the single-file events table),
    * keyed like [[qp1Dir]]; shared by the streaming gate queries
    * (qs7/qs8/qs9).
    */
  def eventsLandingDir(sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stream_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** The file-stream source lists a DIRECTORY; testdata ships events
    * as one parquet file — expose it through a symlinked landing dir.
    * Pass-through when the table is already a directory.
    */
  def ensureEventsLanding(sfDir: String): String = {
    val src = java.nio.file.Paths.get(sfDir, "events.parquet")
    if (java.nio.file.Files.isDirectory(src)) src.toString
    else {
      val landing = java.nio.file.Paths.get(eventsLandingDir(sfDir))
      java.nio.file.Files.createDirectories(landing)
      val link = landing.resolve("events.parquet")
      // a dangling or re-pointed link must be recreated: Files.exists
      // FOLLOWS symlinks, so a stale link from a removed/regenerated
      // testdata tree reads as absent and createSymbolicLink would
      // throw FileAlreadyExists forever after
      if (java.nio.file.Files.isSymbolicLink(link) &&
          (!java.nio.file.Files.exists(link) ||
            java.nio.file.Files.readSymbolicLink(link) != src))
        java.nio.file.Files.delete(link)
      if (!java.nio.file.Files.exists(link,
          java.nio.file.LinkOption.NOFOLLOW_LINKS))
        java.nio.file.Files.createSymbolicLink(link, src)
      landing.toString
    }
  }

  /** Delete all graft scratch trees under java.io.tmpdir (legacy
    * random-suffix dirs from earlier rounds plus the fixed paths).
    */
  def reapTmp(): Unit = {
    val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    // graft_qs7_ covers legacy round-6 landing trees (now graft_stream_);
    // graft_qs40_..43_ cover the per-gate sketch landings replaced by
    // the shared graft_sketch_ tree in round 13
    val prefixes = Seq("graft_q14_", "graft_qp1_", "graft_qx13_",
      "graft_qx20_", "graft_qs16_", "graft_qs7_", "graft_stream_",
      "graft_qx24_", "graft_qp4_", "graft_qp5_", "graft_qx28_",
      "graft_qs40_", "graft_qs41_", "graft_qs42_", "graft_qs43_")
    if (java.nio.file.Files.isDirectory(tmpRoot)) {
      val it = java.nio.file.Files.list(tmpRoot)
      try it.forEach { p =>
        if (prefixes.exists(p.getFileName.toString.startsWith))
          org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
      } finally it.close()
    }
  }
}
