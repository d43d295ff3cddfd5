package graft

import org.apache.spark.sql.{GraftExtensionsProbe, SparkSessionExtensions}
import org.apache.spark.sql.functions._

/** The one-stop extension entry point: both the plugin path
  * (spark.sql.extensions=graft.GraftExtensions) and the runtime install
  * must expose every native expression and the GroupTopK strategy.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("install() exposes every native function and the topk strategy") {
    GraftExtensions.install(spark)
    // each native expression answers from SQL with no per-object register
    val row = Seq(("hello world hello spark", Array(1f, 0f), Array(1f, 0f)))
      .toDF("t", "a", "b")
      .selectExpr(
        "cosine_sim(a, b) AS cs",
        "quant_cosine_sim(a, b) AS qcs",
        "lsh_bits(a, 2) AS lb",
        "size(winnow_fps(t, 3, 4, 2)) AS wf",
        "size(minhash_sigs(t)) AS mh",
        "simhash_bits(t, 4) AS sh")
      .collect().head
    assert(row.getAs[Double]("cs") == 1.0)
    assert(row.getAs[Double]("qcs") == 1.0)
    assert(row.getAs[Int]("wf") > 0)
    assert(row.getAs[Int]("mh") == 16)
    assert(row.getAs[Long]("sh") >= 0L)
    // idempotent
    GraftExtensions.install(spark)
    assert(spark.experimental.extraStrategies
      .count(_ == graft.plans.GroupTopKStrategy) == 1)
    // the custom operator plans through the strategy
    val df = graft.plans.GroupTopK(
      Seq((1L, 5.0), (1L, 7.0), (2L, 3.0)).toDF("g", "s"),
      Seq("g"), "s", k = 1)
    assert(df.queryExecution.executedPlan.toString.contains("GroupTopK"))
    assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      == Set((1L, 7.0), (2L, 3.0)))
  }

  test("the plugin path injects the same functions and strategy") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    val strategies = GraftExtensionsProbe.plannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.GroupTopKStrategy))
    val names = GraftExtensionsProbe.injectedFunctionNames(ext).toSet
    Seq("cosine_sim", "quant_cosine_sim", "lsh_bits", "winnow_fps",
      "minhash_sigs", "simhash_bits").foreach { f =>
      assert(names.contains(f), s"$f not injected by the plugin path")
    }
  }
}
