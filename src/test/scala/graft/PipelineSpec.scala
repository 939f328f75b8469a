package graft

import graft.app.PipelineRunner
import graft.app.PipelineRunner.{Dimensions, PipelineConfig}
import graft.ledger.InMemoryRunLedger
import java.nio.file.{Files, Paths}

class PipelineSpec extends SparkSpec {

  test("S9: copyFromLocal/copyToLocal round-trip a file, source kept") {
    val root = tempDir("objstore_")
    val src = new java.io.File(s"$root/payload.txt")
    Files.writeString(src.toPath, "graft-roundtrip-123")
    val store = new graft.fs.ObjectStore(spark.sparkContext.hadoopConfiguration)
    val up = store.copyFromLocal(src.getAbsolutePath, s"$root/remote")
    assert(store.exists(up))
    assert(src.exists(), "upload must copy, not move")
    val down = store.copyToLocal(up, s"$root/local")
    assert(Files.readString(Paths.get(s"$root/local/payload.txt"))
      == "graft-roundtrip-123")
    assert(store.exists(up), "download must copy, not move")
    assert(down.endsWith("payload.txt"))
  }

  test("ensureEventsLanding repairs dangling and re-pointed symlinks") {
    import java.nio.file.{Files, Paths, LinkOption}
    val fake = tempDir("landing_src_")
    val srcA = Paths.get(fake, "a"); Files.createDirectory(srcA)
    val fileA = srcA.resolve("events.parquet")
    Files.writeString(fileA, "a")
    // first ensure: creates the link
    val landing = graft.io.Scratch.ensureEventsLanding(srcA.toString)
    val link = Paths.get(landing, "events.parquet")
    assert(Files.isSymbolicLink(link) && Files.exists(link))
    // dangling: delete the target — a naive Files.exists check would
    // see "absent" and then die on createSymbolicLink forever
    Files.delete(fileA)
    Files.writeString(fileA, "a2")
    assert(graft.io.Scratch.ensureEventsLanding(srcA.toString) == landing)
    assert(Files.exists(link), "dangling link must be recreated")
    // a link left pointing at an OLD path must be re-pointed, not kept
    val srcB = Paths.get(fake, "b"); Files.createDirectory(srcB)
    Files.writeString(srcB.resolve("events.parquet"), "b")
    Files.delete(link)
    Files.createSymbolicLink(link, srcB.resolve("events.parquet"))
    graft.io.Scratch.ensureEventsLanding(srcA.toString)
    assert(Files.readSymbolicLink(link) == fileA,
      "re-pointed link must come back to this sf dir's events file")
    assert(Files.exists(link, LinkOption.NOFOLLOW_LINKS))
  }

  test("end-to-end run: quarantine, marts, archive, ledger lifecycle") {
    val root = tempDir("pipeline_")
    val cfg = PipelineConfig(s"$root/in", s"$root/err", s"$root/done",
      s"$root/out")
    Files.createDirectories(Paths.get(cfg.inputDir))
    Fixtures.writeF1(cfg.inputDir)
    Fixtures.writeF2(cfg.inputDir)
    Fixtures.writeF3(cfg.inputDir)
    val (c, s, st) = Fixtures.dims(spark)
    val ledger = new InMemoryRunLedger

    val report = PipelineRunner.run(spark, cfg, Dimensions(c, s, st), ledger)

    assert(report.staleActiveFiles.isEmpty)
    assert(report.goodFiles.size == 2)
    assert(report.quarantined.map(_._2) == Seq(Set("store_id")))
    assert(report.audit.rowsIn == 1500 && report.audit.rowsOut == 1500)
    assert(report.customerMartRows > 0 && report.salesMartRows > 0)

    // quarantined file moved to err/, good files archived to done/
    assert(Files.list(Paths.get(cfg.errorDir)).count() == 1)
    assert(Files.list(Paths.get(cfg.processedDir)).count() == 2)
    assert(Files.list(Paths.get(cfg.inputDir)).count() == 0)

    // ledger: both good files flipped A -> I
    assert(ledger.all.toSet ==
      Set(("f1_sales.csv", "I"), ("f2_extra.csv", "I")))

    // partitioned mart readable and hive-partitioned by month/store
    val part = spark.read
      .parquet(s"${cfg.outputDir}/sales_team_data_mart_partitioned")
    assert(part.count() == report.salesMartRows)
    val dirs = Files.list(
      Paths.get(s"${cfg.outputDir}/sales_team_data_mart_partitioned"))
      .toArray.map(_.toString).filter(_.contains("sales_month="))
    assert(dirs.nonEmpty)
  }

  test("end-to-end run with JDBC-sourced dimensions (Derby)") {
    val root = tempDir("pipeline_jdbc_")
    val cfg = PipelineConfig(s"$root/in", s"$root/err", s"$root/done",
      s"$root/out")
    Files.createDirectories(Paths.get(cfg.inputDir))
    Fixtures.writeF1(cfg.inputDir)
    val url = "jdbc:derby:memory:graftdims;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val (c, s, st) = Fixtures.dims(spark)
    graft.io.Writers.writeJdbcAppend(c, url, "customer", props)
    graft.io.Writers.writeJdbcAppend(s, url, "store", props)
    graft.io.Writers.writeJdbcAppend(st, url, "sales_team", props)

    val dims = PipelineRunner.Dimensions.fromJdbc(spark, url, props)
    val report = PipelineRunner.run(spark, cfg, dims, new InMemoryRunLedger)

    assert(report.goodFiles.size == 1)
    assert(report.audit.rowsIn == 500 && report.audit.rowsOut == 500)
    assert(report.customerMartRows > 0 && report.salesMartRows > 0)
  }

  test("a crashed run leaves 'A' rows that the next run detects") {
    val root = tempDir("pipeline_stale_")
    val cfg = PipelineConfig(s"$root/in", s"$root/err", s"$root/done",
      s"$root/out")
    Files.createDirectories(Paths.get(cfg.inputDir))
    Fixtures.writeF1(cfg.inputDir)
    val (c, s, st) = Fixtures.dims(spark)
    val ledger = new InMemoryRunLedger
    ledger.markActive("f1_sales.csv", "previous/location") // simulated crash

    val report = PipelineRunner.run(spark, cfg, Dimensions(c, s, st), ledger)
    assert(report.staleActiveFiles == Seq("f1_sales.csv"))
  }

  test("empty input dir yields an empty report, no side effects") {
    val root = tempDir("pipeline_empty_")
    val cfg = PipelineConfig(s"$root/in", s"$root/err", s"$root/done",
      s"$root/out")
    Files.createDirectories(Paths.get(cfg.inputDir))
    val (c, s, st) = Fixtures.dims(spark)
    val report = PipelineRunner.run(spark, cfg, Dimensions(c, s, st),
      new InMemoryRunLedger)
    assert(report.goodFiles.isEmpty && report.quarantined.isEmpty)
    assert(report.customerMartRows == 0)
  }

  test("qp4: compaction collapses the fragmented layout to one file per partition dir") {
    val sf = "/root/testdata/sf0.001"
    graft.operators.Marts.compactionRoundtrip(spark, sf).count()
    val root = new java.io.File(graft.io.Scratch.qp4Dir(sf))
    def parquetFiles(tree: String): Map[String, Int] = {
      val dirs = new java.io.File(root, tree).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
      dirs.map(d => d.getName ->
        d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val frag = parquetFiles("fragmented")
    val compact = parquetFiles("compacted")
    assert(frag.keySet == compact.keySet, "same partition dirs")
    assert(frag.values.forall(_ > 1),
      s"phase 1 must fragment (files per dir: $frag)")
    assert(frag.values.sum > 10 * compact.values.sum,
      "compaction must collapse an order of magnitude of files")
    assert(compact.values.forall(_ == 1),
      s"one writer per dir -> one file per dir, got $compact")
  }
}
