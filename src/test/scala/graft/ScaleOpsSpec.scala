package graft

import graft.core.Credentials
import graft.io.Bucketing
import graft.operators.Salting
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("salted join equals the plain join, including hot keys") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, "o_custkey")
      .select("o_orderkey", "c_name")
    val salted = Salting.saltedInnerJoin(orders, customer, "o_custkey", 8)
      .select("o_orderkey", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("topKeyCounts surfaces the heaviest keys") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val top = Salting.topKeyCounts(li, "l_returnflag", 3)
    assert(top.length == 3)
    assert(top.map(_._2).sum == li.count())
    assert(top(0)._2 >= top(1)._2 && top(1)._2 >= top(2)._2)
  }

  test("bucketed join plans without a shuffle exchange") {
    val wh = tempDir("bucket_wh_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val orders = s2.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = s2.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8,
      Some(s"$wh/b_orders"))
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8,
      Some(s"$wh/b_lineitem"))
    val joined = Bucketing.bucketedJoin(s2, "b_orders", "b_lineitem",
      "o_orderkey")
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"bucketed join still shuffles:\n$physical")
    // and it is still correct
    val expected = orders.join(lineitem, "o_orderkey").count()
    assert(joined.count() == expected)
  }

  test("schema-merge read unions eras by name with NULL fill") {
    val df = graft.operators.Extras.schemaMergeRead(
      spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq ==
      Seq("o_orderkey", "o_totalprice", "o_orderstatus"))
    val rows = df.collect()
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet").count()
    assert(rows.length == orders, "every era row survives the merge")
    rows.foreach { r =>
      val even = r.getAs[Long]("o_orderkey") % 2 == 0
      assert(r.isNullAt(r.fieldIndex("o_orderstatus")) == even,
        "era-1 rows must NULL-fill the era-2 column")
      assert(r.isNullAt(r.fieldIndex("o_totalprice")) == !even,
        "era-2 rows must NULL-fill the era-1 column")
    }
  }

  test("credentials roundtrip and tamper-detect (X10 parity)") {
    val c = new Credentials("pipeline-secret", "salt1234".getBytes)
    val enc = c.encrypt("jdbc:mysql://db/retail?user=app")
    assert(c.decrypt(enc) == "jdbc:mysql://db/retail?user=app")
    // fresh IV per encryption: same plaintext, different ciphertext
    assert(c.encrypt("x") != c.encrypt("x"))
    // wrong password fails to decrypt cleanly
    val wrong = new Credentials("other", "salt1234".getBytes)
    intercept[Exception] { wrong.decrypt(enc) }
  }

  test("qx23: unionByName aligns drifted eras by column identity with NULL fill") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.operators.Extras.unionByNameDrift(spark, sf)
    assert(df.columns.toSeq == Seq("o_orderkey", "o_custkey",
      "o_totalprice", "o_orderstatus", "o_orderpriority"),
      "first frame's columns lead, the new era's extras append")
    val eras = spark.read.parquet(s"$sf/orders.parquet")
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        (org.apache.spark.sql.functions.col("o_orderdate") <
          org.apache.spark.sql.functions.lit("1996-01-01").cast("timestamp"))
          .as("old"))
      .collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Boolean]("old")).toMap
    val rows = df.collect()
    assert(rows.length == eras.size, "the union conserves every order")
    rows.foreach { r =>
      val old = eras(r.getAs[Long]("o_orderkey"))
      assert(r.isNullAt(r.fieldIndex("o_orderstatus")) == old,
        "old-era rows NULL-fill the columns only the new era has")
      assert(r.isNullAt(r.fieldIndex("o_custkey")) == !old,
        "new-era rows NULL-fill the dropped custkey")
      assert(!r.isNullAt(r.fieldIndex("o_totalprice")),
        "the shared column is never NULL-filled")
    }
  }
}
