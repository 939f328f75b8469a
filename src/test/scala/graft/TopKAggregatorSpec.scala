package graft

import graft.functions.TopKAggregator
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed top-k aggregator equals the row_number-window answer") {
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val spend = events.groupBy("event_type", "user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("spend"))
      .cache()

    val got = spend
      .select(col("event_type"), col("user_id"), col("spend"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKAggregator(5).toColumn.name("topk"))
      .collect()
      .map { case (et, tk) => et -> tk.toList }
      .toMap

    val w = Window.partitionBy("event_type")
      .orderBy(col("spend").desc, col("user_id"))
    val expected = spend.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rn"))
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("spend"))).toList)
      .toMap

    assert(got.keySet == expected.keySet)
    expected.foreach { case (et, exp) => assert(got(et) == exp, s"type $et") }
  }

  test("aggregator is merge-order independent (partition count invariant)") {
    val data = (1L to 100L).map(i => ("g", i, (i % 13).toDouble)).toDF("g", "id", "s")
    def run(parts: Int) = data.repartition(parts)
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKAggregator(7).toColumn.name("tk"))
      .collect().head._2.toList
    assert(run(1) == run(13))
  }
}
