package graft

import graft.io.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-code correctness and the data-skipping
  * property the layout exists for — a 2-D box predicate prunes most
  * files of a z-ordered layout and (almost) none of a 1-D-sorted
  * one. Content equality under the layout change is carried by the
  * qp5 oracle; these pin the MECHANISM.
  */
class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits: x on even positions, y on odd") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    // morton(3,5): x=0b011 -> bits 0,2; y=0b101 -> bits 1,5 => 0b100111
    assert(got == Seq(0L, 1L, 2L, 39L,
      0x5555555555555555L, 0xAAAAAAAAAAAAAAAAL))
  }

  test("z-order locality: adjacent codes differ in one quadrant step") {
    import spark.implicits._
    // the 4x4 grid in z order visits (0,0),(1,0),(0,1),(1,1),(2,0)…
    // integer grid coords: `/` is fractional in Spark SQL, so floor+cast
    val gy = floor(col("id") / 4).cast("long")
    val cells = spark.range(16)
      .select(ZOrder.zValue(col("id") % 4, gy).as("z"),
        (col("id") % 4).as("x"), gy.as("y"))
      .orderBy("z")
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSeq
    assert(cells.take(8) == Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (2L, 0L), (3L, 0L), (2L, 1L), (3L, 1L)),
      "first two quadrants of the 4x4 Morton walk")
  }

  test("a 2-D box prunes most z-ordered files but nearly no orderkey-sorted files") {
    val sf = "/root/testdata/sf0.01"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val zDir = tempDir("zorder")
    val linDir = tempDir("linear")
    ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey", zDir, numFiles = 16)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linDir)

    // per-FILE min/max footprint vs a 2-D box (wider than qp5's so the
    // sf0.01 hit counts are statistically stable) — exactly the stats a
    // format-level skipper (or parquet's row-group pruner; one row
    // group per file at this size) consults
    def filesHit(dir: String): (Int, Int) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val hit = files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min("l_partkey"), max("l_partkey"),
            min("l_suppkey"), max("l_suppkey"))
          .collect()(0)
        r.getLong(1) >= 100 && r.getLong(0) <= 300 &&
          r.getLong(3) >= 10 && r.getLong(2) <= 40
      }
      (hit, files.length)
    }
    val (zHit, zTotal) = filesHit(zDir)
    val (linHit, linTotal) = filesHit(linDir)
    assert(zTotal == 16 && linTotal == 16, "numFiles pinned on both layouts")
    assert(linHit >= 14,
      s"orderkey sort leaves part/supp keys unclustered: $linHit/16 files overlap the box")
    assert(zHit * 4 <= linHit,
      s"z-order confines the box to a few curve segments: $zHit vs $linHit")

    // live engine proof: the pushed box filter materializes fewer
    // rows out of the z-ordered scan (row-group pruning on stats)
    def scanRows(dir: String): Long = {
      val df = spark.read.parquet(dir)
        .filter(col("l_partkey").between(100, 300) &&
          col("l_suppkey").between(10, 40))
      df.collect()
      def leaves(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          leaves(a.executedPlan)
        case other => other.children.flatMap(leaves) :+ other
      }
      leaves(df.queryExecution.executedPlan).collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.get
    }
    val zRows = scanRows(zDir)
    val linRows = scanRows(linDir)
    assert(zRows * 2 <= linRows,
      s"z-ordered scan emits $zRows rows vs $linRows from the linear layout")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(zDir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(linDir))
  }
}
