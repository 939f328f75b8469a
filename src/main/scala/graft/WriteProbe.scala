package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** One-off measurement harness for the hive-partitioned write floor
  * (q14's dominant cost: ~2100 partition dirs at sf0.1, one parquet
  * writer init per file). Times writer variants — task count, codec,
  * maxRecordsPerFile — over the same cached mart so the scan/agg cost
  * is excluded. Results are recorded in BASELINE.md; the production
  * default in io.Writers keeps whatever this probe shows is best.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.WriteProbe /root/testdata/sf0.1"
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keys = Seq("store", "month")
    val mart = graft.operators.Relational.q09(spark, sfDir).cache()
    mart.count() // materialize once; probes time only the write

    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      System.err.println(
        f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val out = "/tmp/graft_write_probe"
    def write(n: Int, codec: String, extra: Map[String, String] = Map.empty)
        : Unit =
      mart.repartition(n, keys.map(col): _*)
        .write.mode("overwrite")
        .options(extra)
        .option("compression", codec)
        .partitionBy(keys: _*)
        .parquet(out)

    // warmup (writer classloading / codec init)
    write(cpus.toInt, "snappy")
    t("repartition(32), snappy [production]")(write(32, "snappy"))
    t("repartition(16), snappy")(write(16, "snappy"))
    t("repartition(8), snappy")(write(8, "snappy"))
    t("repartition(4), snappy")(write(4, "snappy"))
    t("repartition(8), snappy (repeat)")(write(8, "snappy"))
    t("repartition(32), snappy (repeat)")(write(32, "snappy"))
    t("repartition(64), snappy")(write(64, "snappy"))
    t("repartition(32), zstd")(write(32, "zstd"))
    t("repartition(32), uncompressed")(write(32, "none"))
    t("repartition(32), snappy, maxRecords=500")(
      write(32, "snappy", Map("maxRecordsPerFile" -> "500")))
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(out), true)
    spark.stop()
  }
}
