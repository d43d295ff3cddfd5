package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the write-once-shuffle-never-again path.
  * Asserts the physical property that matters at 100 TB — a join between
  * same-bucketed tables plans with NO Exchange on either side — and that
  * results equal the plain join exactly.
  */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join with zero exchanges, same result") {
    val dir = "/root/testdata/sf0.001"
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    Bucketing.writeBucketed(lineitem, "b_lineitem", 8, Seq("l_orderkey"))
    Bucketing.writeBucketed(orders, "b_orders", 8, Seq("o_orderkey"))

    // force the shuffle-sensitive plan: no broadcast shortcut
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")

      // exactness vs the plain (shuffled) join
      val expected = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      assert(joined.count() == expected.count())
      val a = joined.agg(
        sum(round(col("l_extendedprice") * 100).cast("long")).as("s")).head.getLong(0)
      val b = expected.agg(
        sum(round(col("l_extendedprice") * 100).cast("long")).as("s")).head.getLong(0)
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("aggregation on the bucket key needs no exchange either") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_li_agg")
    Bucketing.writeBucketed(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_quantity"),
      "b_li_agg", 8, Seq("l_orderkey"))
    try {
      val agg = spark.table("b_li_agg").groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n$plan")
      // values equal the unbucketed aggregation
      val direct = spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("q"))
      assert(agg.orderBy("l_orderkey").collect().toSeq ==
        direct.orderBy("l_orderkey").collect().toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS b_li_agg")
  }
}
