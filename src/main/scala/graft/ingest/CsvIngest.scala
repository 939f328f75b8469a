package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingestion with the reference's three-layer schema handling
  * (SURVEY.md §1.5; reference main.py:136-178, 223-258):
  *
  *  1. header-only probe (S1) — cheap, no data scan;
  *  2. mandatory-column contract check (F2) — files missing any
  *     contract column are rejected (quarantine path);
  *  3. conform (P1/X1) — extra columns beyond the contract are folded
  *     into one `additional_column` string via concat_ws(", ", …),
  *     every file is projected to the same 9 columns.
  *
  * Divergence from the reference (documented, SURVEY.md §7.4): money
  * is DECIMAL(10,2) not float, and types come from explicit casts of
  * an all-string read, not from inferSchema — deterministic at any
  * scale and under ANSI mode.
  */
object CsvIngest {

  /** The mandatory-column contract (resources/dev/config.py:40). */
  val mandatoryColumns: Seq[String] = Seq(
    "customer_id", "store_id", "product_name", "sales_date",
    "sales_person_id", "price", "quantity", "total_cost")

  val Money: DecimalType = DecimalType(10, 2)

  /** Canonical 9-column fact schema (main.py:223-233). */
  val factSchema: StructType = StructType(Seq(
    StructField("customer_id", IntegerType),
    StructField("store_id", IntegerType),
    StructField("product_name", StringType),
    StructField("sales_date", DateType),
    StructField("sales_person_id", IntegerType),
    StructField("price", Money),
    StructField("quantity", IntegerType),
    StructField("total_cost", Money),
    StructField("additional_column", StringType)))

  /** S1 — header-only probe: one file-read of the first line, no
    * full scan (main.py:139-141).
    */
  def probeColumns(spark: SparkSession, path: String): Seq[String] =
    spark.read.option("header", "true").csv(path).columns.toSeq

  /** Contract check: Left(missing columns) if the file violates the
    * contract, Right(extra columns) otherwise (main.py:146-153).
    */
  def validate(spark: SparkSession, path: String): Either[Set[String], Seq[String]] = {
    val cols = probeColumns(spark, path)
    val missing = mandatoryColumns.toSet -- cols.toSet
    if (missing.nonEmpty) Left(missing)
    else Right(cols.filterNot(mandatoryColumns.contains))
  }

  /** Split candidate files into (good, bad-with-missing-cols). */
  def triage(spark: SparkSession, paths: Seq[String])
      : (Seq[String], Seq[(String, Set[String])]) = {
    val checked = paths.map(p => p -> validate(spark, p))
    (checked.collect { case (p, Right(_)) => p },
      checked.collect { case (p, Left(m)) => (p, m) })
  }

  /** Conform one (validated) file to the 9-column contract, folding
    * extra columns into `additional_column` (main.py:245-256).
    */
  def conform(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val extras = raw.columns.filterNot(mandatoryColumns.contains)
    val withAdd =
      if (extras.nonEmpty)
        raw.withColumn("additional_column",
          concat_ws(", ", extras.map(col).toIndexedSeq: _*))
      else
        raw.withColumn("additional_column", lit(null).cast(StringType))
    withAdd.select(
      col("customer_id").cast(IntegerType),
      col("store_id").cast(IntegerType),
      col("product_name"),
      col("sales_date").cast(DateType),
      col("sales_person_id").cast(IntegerType),
      col("price").cast(Money),
      col("quantity").cast(IntegerType),
      col("total_cost").cast(Money),
      col("additional_column"))
      // .to() aligns nullability with the declared contract (concat_ws
      // is non-nullable; the contract column is nullable).
      .to(factSchema)
  }

  /** O3/S4 — the reference's literal shape: per-file conform unioned
    * by position over an empty seed (main.py:235-258). Kept for
    * parity; plan depth is O(files), so prefer [[multiPathRead]] when
    * all files share a header.
    */
  def unionFold(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val seed = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], factSchema)
    paths.map(conform(spark, _)).foldLeft(seed)(_ union _)
  }

  /** Canonical scale form (SURVEY.md §4.3): one multi-path read for
    * files sharing a header — one scan node, parallel file listing,
    * no O(files) plan depth. Verified equal to [[unionFold]] in
    * CsvIngestSpec.
    */
  def multiPathRead(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "multiPathRead needs at least one path")
    val raw = spark.read.option("header", "true").csv(paths: _*)
    val extras = raw.columns.filterNot(mandatoryColumns.contains)
    val withAdd =
      if (extras.nonEmpty)
        raw.withColumn("additional_column",
          concat_ws(", ", extras.map(col).toIndexedSeq: _*))
      else raw.withColumn("additional_column", lit(null).cast(StringType))
    withAdd.select(factSchema.fields.map(f =>
      col(f.name).cast(f.dataType)).toIndexedSeq: _*)
      .to(factSchema)
  }
}
