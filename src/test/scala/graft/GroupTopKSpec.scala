package graft

import graft.plans.GroupTopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-group top-k operator: result equivalence against the
  * window row_number plan, physical-plan shape, and edge cases.
  */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def base = spark.read
    .parquet("/root/testdata/sf0.001/events.parquet")
    .select($"event_id", $"event_type",
      (round($"value" * 100).cast("long") * 100000L + $"event_id").as("score"))

  test("matches the window row_number top-k exactly") {
    val custom = GroupTopK(base, Seq("event_type"), "score", k = 5)
      .orderBy("event_type", "score").collect()
    val w = Window.partitionBy("event_type").orderBy($"score".desc)
    val reference = base
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5).drop("rn")
      .orderBy("event_type", "score").collect()
    assert(custom.length == reference.length && custom.length == 25)
    assert(custom.toSeq == reference.toSeq)
  }

  test("plans as GroupTopKExec with a clustered shuffle, not a sort") {
    val df = GroupTopK(base, Seq("event_type"), "score", k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), s"custom exec missing in:\n$plan")
    assert(!plan.contains("WindowExec"))
  }

  test("ascending mode, k larger than group, and missing column") {
    val asc = GroupTopK(base, Seq("event_type"), "score", k = 2,
      descending = false)
      .groupBy("event_type").agg(count(lit(1)).as("n"), min("score").as("m"))
    val mins = base.groupBy("event_type").agg(min("score").as("m"))
    assert(asc.select("event_type", "m").orderBy("event_type").collect().toSeq ==
      mins.select("event_type", "m").orderBy("event_type").collect().toSeq)

    val tiny = base.filter($"event_type" === "click").limit(2)
    assert(GroupTopK(tiny, Seq("event_type"), "score", k = 100).count() == 2)

    intercept[IllegalArgumentException] {
      GroupTopK(base, Seq("no_such_col"), "score", k = 1)
    }
  }
}
