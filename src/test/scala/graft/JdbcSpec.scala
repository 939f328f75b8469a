package graft

import graft.ledger.JdbcRunLedger
import java.util.Properties

/** Real JDBC coverage (SURVEY.md §2.1 S3/S7/S8) against embedded
  * Derby — the same code paths that talk to MySQL in production.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("S7/S3: mart rows append to JDBC and scan back identically") {
    val mart = graft.operators.Relational
      .q09(spark, "/root/testdata/sf0.001").limit(200).cache()
    graft.io.Writers.writeJdbcAppend(mart, url, "sales_mart_t", props)
    val back = spark.read.jdbc(url, "sales_mart_t", props)
    assert(back.count() == mart.count())
    assert(back.select(mart.columns.map(org.apache.spark.sql.functions.col)
      .toIndexedSeq: _*).exceptAll(mart).count() == 0)
    // append again: rows double (reference semantics — append is not
    // idempotent, SURVEY.md §7.4)
    graft.io.Writers.writeJdbcAppend(mart, url, "sales_mart_t", props)
    assert(spark.read.jdbc(url, "sales_mart_t", props).count()
      == 2 * mart.count())
  }

  test("S3: partitioned JDBC scan splits into >1 partition, same rows") {
    val c = graft.core.Tables
      .customer(spark, "/root/testdata/sf0.001").limit(300).cache()
    graft.io.Writers.writeJdbcAppend(c, url, "customer_part_t", props)
    val whole = spark.read.jdbc(url, "customer_part_t", props)
    val split = graft.app.PipelineRunner.Dimensions.jdbcPartitioned(
      spark, url, props, "customer_part_t",
      partitionColumn = "c_custkey", lowerBound = 0L, upperBound = 300L,
      numPartitions = 4)
    assert(split.rdd.getNumPartitions == 4,
      s"expected 4 JDBC partitions, got ${split.rdd.getNumPartitions}")
    assert(whole.rdd.getNumPartitions == 1)
    assert(split.count() == whole.count())
    assert(split.exceptAll(whole).count() == 0)
    assert(whole.exceptAll(split).count() == 0)
    // bounds clip split points, not rows: narrow bounds still read all
    val narrow = graft.app.PipelineRunner.Dimensions.jdbcPartitioned(
      spark, url, props, "customer_part_t",
      partitionColumn = "c_custkey", lowerBound = 100L, upperBound = 200L,
      numPartitions = 3)
    assert(narrow.count() == whole.count())
  }

  test("S8: JdbcRunLedger state machine over a real database") {
    val conn = java.sql.DriverManager.getConnection(url, props)
    conn.createStatement().execute(
      """CREATE TABLE product_staging_table (
        |  id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
        |  file_name VARCHAR(255), file_location VARCHAR(255),
        |  created_date TIMESTAMP, updated_date TIMESTAMP,
        |  status VARCHAR(1))""".stripMargin)
    conn.close()
    val ledger = new JdbcRunLedger(url, props)
    assert(ledger.activeFiles(Seq("a.csv")).isEmpty)
    ledger.markActive("a.csv", "in/a.csv")
    ledger.markActive("b.csv", "in/b.csv")
    assert(ledger.activeFiles(Seq("a.csv", "b.csv", "c.csv")).toSet
      == Set("a.csv", "b.csv"))
    ledger.markInactive(Seq("a.csv"))
    assert(ledger.activeFiles(Seq("a.csv", "b.csv")).toSet == Set("b.csv"))
    ledger.markInactive(Seq("b.csv"))
    assert(ledger.activeFiles(Seq("a.csv", "b.csv")).isEmpty)
  }

  test("qx24: each federation leg round-trips the parquet rows and types exactly") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val fed = graft.operators.Federation.federatedNation(spark, sf)
    val rows = fed.collect()
    assert(rows.length == 75, "25 nations x 3 legs")
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.keySet == Set("parquet", "csv", "jdbc"))
    // the union compiled at all => schemas aligned by name; now prove
    // VALUES: every leg carries exactly the parquet rows
    val parquetLeg = bySource("parquet")
      .map(r => (r.getAs[Int]("n_nationkey"), r.getAs[String]("n_name"),
        r.getAs[Int]("n_regionkey"))).toSet
    for (leg <- Seq("csv", "jdbc")) {
      val got = bySource(leg)
        .map(r => (r.getAs[Int]("n_nationkey"), r.getAs[String]("n_name"),
          r.getAs[Int]("n_regionkey"))).toSet
      assert(got == parquetLeg, s"$leg leg differs from parquet")
    }
    // overwrite discipline: a second invocation (Bench runs 3x) must
    // not double the jdbc leg or re-append csv part files
    assert(graft.operators.Federation.federatedNation(spark, sf).count() == 75)
  }
}
