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

  test("non-primitive (string) scores survive the child's row-buffer reuse") {
    // string scores are UTF8String VIEWS into the child's reused UnsafeRow;
    // without copyValue at enqueue, later rows corrupt stored heap keys
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"lang",
        // doc_id suffix = total order (near-dup docs can share a prefix)
        concat(substring($"text", 1, 24), lit("|"),
          lpad($"doc_id".cast("string"), 8, "0")).as("prefix"))
    val custom = GroupTopK(df, Seq("lang"), "prefix", k = 3)
      .orderBy("lang", "prefix").collect()
    val w = Window.partitionBy("lang").orderBy($"prefix".desc)
    val reference = df
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3).drop("rn")
      .orderBy("lang", "prefix").collect()
    assert(custom.nonEmpty && custom.toSeq == reference.toSeq)
  }

  test("multi-key sort spec with mixed directions matches the window exactly") {
    val ev = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_id", $"event_type",
        round($"value" * 100).cast("long").as("cents"))
    // cents DESC, event_id ASC — ties on cents are common, the second
    // key totalizes the order so the window twin agrees row-for-row
    val custom = GroupTopK(ev, Seq("event_type"),
      Seq("cents" -> true, "event_id" -> false), k = 4, withTies = false)
      .orderBy("event_type", "event_id").collect()
    val w = Window.partitionBy("event_type")
      .orderBy($"cents".desc, $"event_id".asc)
    val reference = ev
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 4).drop("rn")
      .orderBy("event_type", "event_id").collect()
    assert(custom.nonEmpty && custom.toSeq == reference.toSeq)
  }

  test("withTies keeps the rank() <= k boundary cohort exactly") {
    val ev = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_id", $"event_type",
        // coarse score: heavy ties at every rank boundary
        (round($"value" * 100).cast("long") % 7).as("bucket"))
    val custom = GroupTopK(ev, Seq("event_type"),
      Seq("bucket" -> true), k = 2, withTies = true)
      .orderBy("event_type", "event_id").collect()
    val w = Window.partitionBy("event_type").orderBy($"bucket".desc)
    val reference = ev
      .withColumn("rk", rank().over(w)).filter($"rk" <= 2).drop("rk")
      .orderBy("event_type", "event_id").collect()
    assert(custom.length == reference.length,
      s"cohort size ${custom.length} vs window ${reference.length}")
    assert(custom.toSeq == reference.toSeq)
    // and the cohort genuinely exceeds k rows somewhere (ties exist)
    assert(custom.length > 2 * ev.select("event_type").distinct().count(),
      "fixture must actually produce boundary ties for this test to bite")
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
