package graft

import graft.ingest.CsvIngest
import org.apache.spark.sql.functions._

class CsvIngestSpec extends SparkSpec {

  lazy val dir: String = tempDir("csv_ingest_")
  lazy val f1: String = Fixtures.writeF1(dir)
  lazy val f2: String = Fixtures.writeF2(dir)
  lazy val f3: String = Fixtures.writeF3(dir)

  test("header probe returns the contract columns for F1") {
    assert(CsvIngest.probeColumns(spark, f1) == CsvIngest.mandatoryColumns)
  }

  test("validate accepts F1 (no extras) and F2 (payment_mode extra)") {
    assert(CsvIngest.validate(spark, f1) == Right(Nil))
    assert(CsvIngest.validate(spark, f2) == Right(Seq("payment_mode")))
  }

  test("validate rejects F3 with missing store_id") {
    assert(CsvIngest.validate(spark, f3) == Left(Set("store_id")))
  }

  test("triage splits good and bad files") {
    val (good, bad) = CsvIngest.triage(spark, Seq(f1, f2, f3))
    assert(good == Seq(f1, f2))
    assert(bad == Seq((f3, Set("store_id"))))
  }

  test("conform F1: contract schema, null additional_column, 500 rows") {
    val df = CsvIngest.conform(spark, f1)
    assert(df.schema == CsvIngest.factSchema)
    assert(df.count() == 500)
    assert(df.filter(col("additional_column").isNotNull).count() == 0)
  }

  test("conform F2: extras folded into additional_column") {
    val df = CsvIngest.conform(spark, f2)
    // names+types must match the contract; nullability may be tighter
    // (concat_ws output is provably non-null, which union relaxes).
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      CsvIngest.factSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(df.count() == 1000)
    val vals = df.select("additional_column").distinct()
      .collect().map(_.getString(0)).toSet
    assert(vals == Set("cash", "UPI"))
  }

  test("conform preserves the total_cost = price * quantity invariant") {
    val df = CsvIngest.conform(spark, f1)
    val bad = df.filter(col("total_cost") =!= col("price") * col("quantity"))
    assert(bad.count() == 0)
  }

  test("union fold over empty seed equals multi-path read (Q15)") {
    val f1b = Fixtures.writeF1(dir, name = "f1b_sales.csv", seed = 99L)
    val folded = CsvIngest.unionFold(spark, Seq(f1, f1b))
    val multi = CsvIngest.multiPathRead(spark, Seq(f1, f1b))
    assert(folded.count() == 1000)
    assert(folded.exceptAll(multi).count() == 0)
    assert(multi.exceptAll(folded).count() == 0)
  }

  test("union fold mixes heterogeneous headers (F1 + F2)") {
    val df = CsvIngest.unionFold(spark, Seq(f1, f2))
    assert(df.count() == 1500)
    assert(df.filter(col("additional_column").isNull).count() == 500)
  }
}
