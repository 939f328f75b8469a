package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stamp-keyed PARQUET artifact cache — the storage-backed member of
  * the amortization family (VERDICT r8 #2-4). The driver-side model
  * caches (`TrainingOps.ivfModel` et al.) hold kilobyte-sized arrays
  * in the JVM; artifacts that are CORPUS-grain — the kNN edge list
  * (k·N rows), the SQ8 packed-code table (N rows) — are what
  * production materializes ONCE to storage and then reads per query,
  * exactly like any other table. This helper is that shape on the
  * local scratch disk: build → write parquet → read back, keyed by
  * the same (dir, source-table file stamp) contract as the model
  * caches, so a regenerated corpus invalidates the artifact instead
  * of silently serving stale derived data.
  *
  * At 100 TB the artifact lives on the object store next to the
  * source tables and the build is a scheduled job; the read side —
  * `spark.read.parquet` of a partitioned derived table — is identical.
  * Unlike a cached/localCheckpoint'd DataFrame, a parquet artifact
  * survives `Bench`'s inter-query block-manager reset and costs zero
  * executor storage memory.
  */
object ArtifactStore {

  /** File-stat stamp for a table under the sf dir (names + sizes +
    * mtimes) — a pure filesystem stat, no Spark job (an earlier
    * count()-based key paid a scan per call), and it catches the
    * same-count rewrite a count key is blind to.
    */
  def tableStamp(dir: String, table: String): String = {
    val root = new java.io.File(s"$dir/$table.parquet")
    def stat(f: java.io.File) = s"${f.getName}:${f.length}:${f.lastModified}"
    if (root.isDirectory)
      root.listFiles().sortBy(_.getName).map(stat).mkString(",")
    else stat(root)
  }

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Read the artifact `name` derived from `dir/table.parquet`,
    * building it via `build` iff absent or the stamp changed.
    *
    * The stamp is (source file stats + `version`): artifacts OUTLIVE
    * the JVM, so unlike the in-JVM model caches a change to the BUILD
    * LOGIC would silently serve a stale tree from a previous session
    * — callers must bump `version` whenever the build's code or
    * parameters change. The stamp is computed INSIDE the per-artifact
    * lock (a pre-lock stamp could be written over a newer build's
    * data after losing a regeneration race) and written AFTER the
    * parquet commit, so a crashed build re-runs rather than serving a
    * torn tree. The artifact root embeds a hash of the RAW dir string
    * — sanitizing alone can collapse distinct dirs onto one root and
    * thrash rebuilds.
    */
  def parquetArtifact(s: SparkSession, dir: String, table: String,
                      name: String, version: Int = 1)
                     (build: => DataFrame): DataFrame = {
    val dirHash = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL)
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_art_" + name + "_" + dirHash + "_" +
        dir.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(32))
    val dataDir = new java.io.File(root, "data").getAbsolutePath
    val stampPath = new java.io.File(root, "_stamp").toPath
    val lock = locks.computeIfAbsent(root.getAbsolutePath, _ => new Object)
    lock.synchronized {
      val stamp = s"v$version;" + tableStamp(dir, table)
      val fresh = java.nio.file.Files.isRegularFile(stampPath) &&
        new String(java.nio.file.Files.readAllBytes(stampPath),
          "UTF-8") == stamp
      if (!fresh) {
        build.write.mode("overwrite").parquet(dataDir)
        java.nio.file.Files.createDirectories(stampPath.getParent)
        java.nio.file.Files.write(stampPath, stamp.getBytes("UTF-8"))
      }
    }
    s.read.parquet(dataDir)
  }
}
