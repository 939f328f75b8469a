package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PORTABLE product quantization — the oracle-recomputable member of
  * the PQ family, completing qe20's report card (VERDICT r10 #5: PQ
  * and IVF-PQ recall were spec-measured only, because [[Pq]]'s
  * k-means codebooks aren't recomputable by a SQL oracle). The
  * codebook here is DETERMINISTIC AND RELATIONAL by construction —
  * the `KCodes` lowest-vec_id corpus vectors, the "random codebook"
  * baseline of the PQ literature — and every distance is exact
  * BIGINT arithmetic over micro-quantized components
  * (floor(x·10⁶), the qe23/SQ8 convention), so codebook build, code
  * assignment, ADC tables, shortlist boundaries and recall counts
  * are bit-identical cross-engine: the whole index becomes
  * hash-checkable in the driver gate, not just spec-asserted.
  *
  * This is the HARNESS form, not the production scan: [[Pq]] keeps
  * the trained k-means codebooks and the broadcast-ADC scan
  * (corpus side never joins for scores); this module's relational
  * assignment — explode components, broadcast-join the 64-row
  * codebook, two-level aggregate — is the gramMatrix class of plan
  * (bounded in-stage fanout, partial-agg exchange) and exists so the
  * measured operating points of BOTH PQ geometries sit in a declared,
  * DuckDB-verified report. Overflow headroom: |q| ≤ 10⁶ ⇒ a squared
  * diff ≤ 4·10¹², a full-dim sum ≤ 2.6·10¹⁴ — integer-exact far
  * under 2⁶³; at ~10⁹-vector scale drop the quantization to 10³
  * (the gramMatrix note) and nothing else changes.
  *
  * The dim→subspace map is a PARAMETER (64-row broadcast frame):
  * identity (d div 8 — plain PQ) or the variance-balanced
  * round-robin permutation ([[dimMapVariance]] — the OPQ
  * initialization of Ge et al. 2013: rank dims by variance, deal
  * them round-robin so each subspace carries one dim per variance
  * octile). Subspace L2 is permutation-invariant WITHIN a subspace,
  * so the map fully determines the quantizer.
  */
object PqInt {
  /** 8 subspaces × 64 codes over 64 dims: 8 bytes-ish per vector,
    * 32× under float rows — the same compression point as the
    * Hamming-1024 sketch, measured against the same truth.
    */
  val M = 8
  val KCodes = 64
  val NCells = 8
  val NProbe = 2

  /** The dialect-shared per-dimension variance (valid verbatim in
    * Spark SQL and DuckDB over exact BIGINT moment columns `n`,
    * `s1`, `s2` — the qd51/weightMicroSql construction, so IEEE op
    * order cannot diverge): E[q²] − E[q]².
    */
  val varianceSql: String =
    "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) " +
      "- (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) " +
      "* (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"

  /** (vec_id, d, q): 0-based dim, micro-quantized integer component. */
  private def compFrame(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d"),
        floor(col("x").cast("double") * 1e6).cast("long").as("q"))

  /** Identity subspace map: m = d div subDim — plain contiguous PQ. */
  def dimMapIdentity(s: SparkSession, dim: Int = 64): DataFrame = {
    import s.implicits._
    val subDim = dim / M
    (0 until dim).map(d => (d, d / subDim)).toDF("d", "m")
  }

  /** Variance-balanced round-robin map (the OPQ-init permutation):
    * rank dims by [[varianceSql] descending (ties on d), deal rank r
    * to subspace r mod M. One 64-row aggregate; the window is
    * dim-sized, driver-trivial.
    */
  def dimMapVariance(emb: DataFrame): DataFrame =
    compFrame(emb).groupBy("d")
      .agg(count(lit(1)).as("n"), sum("q").as("s1"),
        sum(col("q") * col("q")).as("s2"))
      .withColumn("v", expr(varianceSql))
      .withColumn("r",
        row_number().over(Window.orderBy(col("v").desc, col("d"))) - 1)
      .select(col("d"), (col("r") % M).cast("int").as("m"))

  /** The deterministic sample codebook: subvectors of the `k`
    * lowest-vec_id corpus vectors, code id = rank within the sample.
    * (m, c, d, qc) with d GLOBAL — corpus joins need no div/mod.
    */
  private def codebook(emb: DataFrame, dimMap: DataFrame,
                       k: Int): DataFrame = {
    val sample = emb.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding"))
    val withC = sample.select(col("vec_id"),
      (row_number().over(Window.orderBy("vec_id")) - 1).as("c"))
    compFrame(sample)
      .join(withC, Seq("vec_id"))
      .join(dimMap, Seq("d"))
      .select(col("m"), col("c"), col("d"), col("q").as("qc"))
  }

  /** Exact-int subspace L2 of every (vector, code) pair: one
    * broadcast join on d (≤ KCodes-fold in-stage fanout, pipelined)
    * then a map-side-combined aggregate at (vec, m, c) grain.
    */
  private def distOver(comp: DataFrame, cb: DataFrame): DataFrame =
    comp.join(broadcast(cb), Seq("d"))
      .select(col("vec_id"), col("m"), col("c"),
        ((col("q") - col("qc")) * (col("q") - col("qc"))).as("p"))
      .groupBy("vec_id", "m", "c")
      .agg(sum("p").as("dist"))

  /** (vec_id, m, code): per-subspace argmin, ties to the lower code
    * (min over (dist, c) structs — exact ints, so the boundary is
    * order-free on both engines).
    */
  def codeFrame(emb: DataFrame, dimMap: DataFrame): DataFrame =
    distOver(compFrame(emb), codebook(emb, dimMap, KCodes))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("c"))).as("mc"))
      .select(col("vec_id"), col("m"), col("mc.c").as("code"))

  /** ADC shortlist: per-query LUT = the dist frame of just the query
    * vectors (driver-bounded), broadcast against the corpus code
    * table; score = Σ_m lut(m, code) exact longs; row_number
    * shortlist (deterministic: int scores, vec_id tiebreak). Self is
    * excluded, matching the truth's convention.
    */
  def adcShortlist(emb: DataFrame, dimMap: DataFrame,
                   queryIds: Seq[Long], n: Int,
                   codesTable: Option[DataFrame] = None): DataFrame = {
    val cb = codebook(emb, dimMap, KCodes)
    val codes = codesTable.getOrElse(codeFrame(emb, dimMap))
    val lut = distOver(
        compFrame(emb.filter(col("vec_id").isin(queryIds: _*))), cb)
      .select(col("vec_id").as("query_id"), col("m"),
        col("c").as("code"), col("dist"))
    codes.join(broadcast(lut), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum("dist").as("adist"))
      .withColumn("rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("adist"), col("vec_id"))))
      .filter(col("rn") <= n)
      .select(col("query_id"), col("vec_id"), col("rn").cast("int").as("rnk"))
  }

  /** Full-dimension exact-int L2 of every vector in `vecs` to the
    * `NCells` deterministic coarse centroids (the NCells lowest-
    * vec_id vectors OF THE CORPUS, `centSrc` — kept separate from
    * `vecs` so a filtered query frame probes the corpus's cells, not
    * cells derived from itself) — (vec_id, cell, dist).
    */
  private def cellDist(vecs: DataFrame, centSrc: DataFrame): DataFrame = {
    val cents = centSrc.orderBy("vec_id").limit(NCells)
      .select(col("vec_id"), col("embedding"))
    val withCell = cents.select(col("vec_id"),
      (row_number().over(Window.orderBy("vec_id")) - 1).as("c"))
    // a single all-dims "subspace" reuses the distOver machinery
    val cb = compFrame(cents).join(withCell, Seq("vec_id"))
      .select(lit(0).as("m"), col("c"), col("d"), col("q").as("qc"))
    distOver(compFrame(vecs), cb)
      .select(col("vec_id"), col("c").as("cell"), col("dist"))
  }

  /** (vec_id, cell): coarse assignment, ties to the lower cell. */
  def cellFrame(emb: DataFrame): DataFrame =
    cellDist(emb, emb)
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cell"))).as("mc"))
      .select(col("vec_id"), col("mc.cell").as("cell"))

  /** IVF-PQ shortlist: probe the `nProbe` nearest coarse cells per
    * query (same exact-int metric), then ADC-score ONLY the member
    * vectors of probed cells. A probed shortlist can run short of
    * `n` — that recall loss is exactly what the report card measures.
    */
  def ivfpqShortlist(emb: DataFrame, dimMap: DataFrame,
                     queryIds: Seq[Long], n: Int,
                     nProbe: Int = NProbe,
                     codesTable: Option[DataFrame] = None,
                     cellsTable: Option[DataFrame] = None): DataFrame = {
    val cb = codebook(emb, dimMap, KCodes)
    val codes = codesTable.getOrElse(codeFrame(emb, dimMap))
    val cells = cellsTable.getOrElse(cellFrame(emb))
    val probes = cellDist(emb.filter(col("vec_id").isin(queryIds: _*)), emb)
      .withColumn("rn", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("dist"), col("cell"))))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cell"))
    val members = cells.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"))
      .filter(col("vec_id") =!= col("query_id"))
    val lut = distOver(
        compFrame(emb.filter(col("vec_id").isin(queryIds: _*))), cb)
      .select(col("vec_id").as("query_id"), col("m"),
        col("c").as("code"), col("dist"))
    members
      .join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("query_id", "m", "code"))
      .groupBy("query_id", "vec_id")
      .agg(sum("dist").as("adist"))
      .withColumn("rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("adist"), col("vec_id"))))
      .filter(col("rn") <= n)
      .select(col("query_id"), col("vec_id"), col("rn").cast("int").as("rnk"))
  }
}
