package graft

import graft.operators.TotalOrder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank: equal to the single-partition window form,
  * deterministic across runs, and never planned through one task.
  */
class TotalOrderSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank equals the window row_number over a total order") {
    val df = (0 until 1000).map(i => ((i * 7919) % 997, i.toLong))
      .toDF("k", "id")
    val ranked = TotalOrder.globalRank(df,
        Seq(col("k"), col("id")), "rnk", numPartitions = 7)
      .select("k", "id", "rnk")
    val expected = df.withColumn("rnk",
      row_number().over(Window.orderBy("k", "id")).cast("long"))
    assert(ranked.except(expected).isEmpty && expected.except(ranked).isEmpty)
  }

  test("globalRank is deterministic across partition counts") {
    val df = (0 until 500).map(i => ((i * 31) % 101, i.toLong)).toDF("k", "id")
    val a = TotalOrder.globalRank(df, Seq(col("k"), col("id")), "rnk", 3)
      .select("id", "rnk").as[(Long, Long)].collect().sortBy(_._1)
    val b = TotalOrder.globalRank(df, Seq(col("k"), col("id")), "rnk", 11)
      .select("id", "rnk").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq,
      "rank must not depend on range boundary sampling")
  }

  test("the range shuffle is parallel, not a single partition") {
    val df = spark.range(0, 10000).selectExpr("id", "id % 13 AS k")
    val ranged = df.repartitionByRange(8, col("k"), col("id"))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"expected a range exchange, got:\n$plan")
    assert(!plan.contains("SinglePartition"),
      "global ordering must never funnel through one partition")
  }

  test("prefixSum equals the window running sum over a total order") {
    val df = (0 until 800).map(i => (((i * 7919) % 499).toLong, i.toLong,
      (i % 97).toLong)).toDF("k", "id", "v")
    val got = TotalOrder.prefixSum(df,
        Seq(col("k"), col("id")), "v", "cum", numPartitions = 7)
      .select("id", "cum")
    val want = df.withColumn("cum",
        sum("v").over(Window.orderBy("k", "id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // invariant to partition count
    val again = TotalOrder.prefixSum(df,
        Seq(col("k"), col("id")), "v", "cum", numPartitions = 13)
      .select("id", "cum")
    assert(again.except(want).isEmpty && want.except(again).isEmpty)
  }

  test("prefixSum handles INT measures and counts nulls as zero") {
    // an IntegerType measure (what size()/length() produce) must not
    // ClassCastException at the RDD boundary, and NULLs add 0 by contract
    val df = Seq((1L, Some(5)), (2L, None), (3L, Some(2)))
      .toDF("id", "v") // v is IntegerType, nullable
    val got = TotalOrder.prefixSum(df, Seq(col("id")), "v", "cum", 3)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 5L, 2L -> 5L, 3L -> 7L))
    // the internal staging column must not leak into the output schema
    assert(!TotalOrder.prefixSum(df, Seq(col("id")), "v", "cum", 3)
      .columns.contains("_psv"))
  }
}
