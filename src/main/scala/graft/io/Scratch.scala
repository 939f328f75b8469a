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

  /** Fixed q14 scratch root: overwritten in place on every run, so
    * repeated bench/verify invocations never accumulate directory
    * trees (~2100 hive dirs each at sf0.1).
    */
  def q14Dir: String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_q14_scratch").getAbsolutePath

  /** Delete all `graft_q14_*` trees under java.io.tmpdir (legacy
    * random-suffix dirs from earlier rounds plus the fixed path).
    */
  def reapTmp(): Unit = {
    val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    if (java.nio.file.Files.isDirectory(tmpRoot)) {
      val it = java.nio.file.Files.list(tmpRoot)
      try it.forEach { p =>
        if (p.getFileName.toString.startsWith("graft_q14_"))
          org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
      } finally it.close()
    }
  }
}
