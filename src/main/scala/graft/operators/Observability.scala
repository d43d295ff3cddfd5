package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation, Row, SparkSession}

/** Zero-extra-pass pipeline metrics.
  *
  * The reference pipeline reports its funnel (events seen, non-CSV
  * dropped, skipped duplicates, failures) through per-invocation log
  * lines (reference `csv-processor-function/main.py:31-53` logs each
  * decision). At 100 TB the equivalent cannot be a second counting pass
  * over the data — every metric must ride the job that does the real
  * work. Spark's [[Observation]] API does exactly that: named aggregate
  * expressions attached to a plan node are accumulated DURING execution
  * (accumulator-backed, no extra job, no extra scan) and read on the
  * driver after the action completes.
  *
  * ObservabilitySpec asserts the zero-extra-job property by counting
  * Spark jobs around an observed funnel run.
  */
object Observability {

  /** Attach named metric expressions to `df`, collected while the caller's
    * terminal action runs. Returns the instrumented frame (plan-identical
    * modulo the CollectMetrics node) and the handle to read afterwards.
    */
  def observed(df: DataFrame, metrics: (String, Column)*): (DataFrame, Observation) = {
    val obs = Observation()
    val exprs = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, exprs.head, exprs.tail: _*), obs)
  }

  /** Render a completed observation as a sorted (metric, value) frame —
    * the driver-side assembly is a handful of rows, never data-sized.
    * Metric values must be integral (counts/sums in cents); that keeps
    * them exact under parallel accumulation and oracle-comparable.
    */
  def metricsFrame(spark: SparkSession, obs: Observation): DataFrame = {
    val rows = obs.get.toSeq.sortBy(_._1).map {
      case (k, v: Number) => (k, v.longValue())
      case (k, v) => throw new IllegalStateException(
        s"non-numeric metric $k = $v; observe only counts and integer sums")
    }
    spark.createDataFrame(rows).toDF("metric", "value")
  }

  /** Convenience: observe, run a full materialization (the `noop` sink —
    * every row is produced, nothing is written), and return the metrics.
    * Callers with a real sink should use [[observed]] and let their own
    * write be the action.
    */
  def funnel(df: DataFrame, metrics: (String, Column)*): DataFrame = {
    val (instrumented, obs) = observed(df, metrics: _*)
    instrumented.write.format("noop").mode("overwrite").save()
    metricsFrame(df.sparkSession, obs)
  }
}
