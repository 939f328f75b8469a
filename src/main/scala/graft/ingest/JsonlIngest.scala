package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) ingestion — the de-facto delivery
  * format for LLM training corpora (one document object per line),
  * the CSV contract's ([[CsvIngest]]) modern sibling. Same
  * three-layer discipline as the reference's CSV path re-expressed
  * for JSON: explicit schema (never inference — a schema-inference
  * pass reads the data twice and a drifting corpus silently changes
  * types), PERMISSIVE parse with a `_corrupt_record` column so
  * malformed or type-mismatched lines are QUARANTINED as data
  * instead of killing the job (a 100 TB crawl always contains
  * broken lines), and a per-partition parse that keeps ingestion
  * map-only until the first real aggregate.
  */
object JsonlIngest {

  /** The documents-corpus schema, explicit (the qd49 contract). */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read JSONL under `paths` against `schema` + quarantine column;
    * PERMISSIVE: a malformed line (or one whose field can't meet the
    * schema's type) yields a row with the raw line in
    * `_corrupt_record` and NULL data fields.
    */
  def readQuarantined(spark: SparkSession, schema: StructType,
                      paths: String*): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(paths: _*)

  /** qd49 — JSONL round-trip with quarantine: export the documents
    * corpus as JSONL (`to_json` over the typed struct — map-only),
    * plant two corrupt lines beside it (one unparseable, one
    * type-mismatched — the two failure modes PERMISSIVE
    * distinguishes from good data), read everything back under the
    * explicit schema, and report the per-language ingest ledger with
    * the quarantined count as its own `_corrupt` row — the JSONL
    * twin of the reference's CSV triage (bad files aside, good data
    * conformed, nothing dropped silently).
    *
    * Scale shape: export and parse are both map-only; the only
    * exchange is the final small-key rollup. The corrupt lines are
    * planted deterministically, so the DuckDB oracle recomputes the
    * whole ledger from the source table.
    */
  def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.io.Scratch.qd49Dir(dir)
    val docs = graft.core.Tables.documents(s, dir)
    docs.select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))).as("value"))
      .write.mode("overwrite").text(s"$root/good")
    // NOTE the Spark subtlety the spec pins: corruption is detected
    // relative to the PARSED PROJECTION — a type clash on a column
    // the downstream query never references is invisible (the column
    // pruner keeps the parser from ever touching it). The planted
    // clash therefore sits on n_chars, which the ledger aggregates;
    // a doc_id clash would sail through this query as a "good" row.
    // Full-contract validation parses every column (cache/write the
    // parse first — the spec's path).
    Seq("{\"doc_id\": 1, \"text\": \"truncated",      // unparseable
        "{\"doc_id\": 4, \"text\": \"t\", \"lang\": \"en\"," +
          " \"source\": \"s\", \"n_chars\": \"not-a-number\"}")
      .toDF("value")
      .coalesce(1).write.mode("overwrite").text(s"$root/bad")
    val parsed = readQuarantined(s, DocSchema,
      s"$root/good", s"$root/bad")
    parsed
      .withColumn("bucket",
        when(col("_corrupt_record").isNotNull, "_corrupt")
          .otherwise(col("lang")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"))
      .orderBy("bucket")
  }
}
