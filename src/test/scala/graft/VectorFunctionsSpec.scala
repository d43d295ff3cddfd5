package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The native CosineSimilarity expression: interpreted vs codegen vs the
  * integer-quantized oracle-checked query must all agree on ranking.
  */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim: golden values, zero-norm safety, codegen path") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),   // identical → 1
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),   // orthogonal → 0
      (Array(1f, 2f, 3f), Array(-1f, -2f, -3f)),// opposite → -1
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f)))   // zero norm → 0, no NaN
      .toDF("a", "b")
    val got = df.select(expr("cosine_sim(a, b)")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
    assert(got(3) == 0.0)
    // null propagation
    val n = Seq((Array(1f), Option.empty[Array[Float]])).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).collect()
    assert(n.head.isNullAt(0))
  }

  test("native top-k ranking matches the quantized oracle query") {
    val dir = "/root/testdata/sf0.001"
    val native = SparkEntry.queries("ann_cosine_native")(spark, dir)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val quant = SparkEntry.queries("ann_cosine_topk")(spark, dir)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == quant) // 1e-4 quantization ≪ neighbor separation
  }
}
