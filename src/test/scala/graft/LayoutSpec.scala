package graft

import graft.operators.Layout
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Partition-pruning proof for the time-partitioned layout: the assertion
  * is on the executed scan's `numFiles` METRIC — how many files the scan
  * actually touched — not on results or wall-clock.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def scanMetric(df: org.apache.spark.sql.DataFrame,
      name: String): Long = {
    df.collect() // execute so metrics are populated
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .filter(_.nodeName.toLowerCase.contains("scan"))
    assert(scans.nonEmpty, "expected a file scan leaf")
    scans.map(_.metrics(name).value).sum
  }

  test("day filter prunes to matching partition directories") {
    val out = tmpDir("layout")
    // 4 days x 50 events, micros timestamps
    val base = 1700000000000000L // 2023-11-14T22:13:20Z
    val rows = for (d <- 0 until 4; i <- 0 until 50)
      yield (d * 50 + i.toLong, base + d * 86400000000L + i * 1000000L)
    Layout.writeDayPartitioned(
      rows.toDF("event_id", "ts_us").withColumn("v", col("event_id") * 2),
      col("ts_us"), out, sortCols = Seq("event_id"))

    val all = spark.read.parquet(out)
    val totalFiles = scanMetric(all, "numFiles")
    assert(all.count() == 200)
    assert(totalFiles >= 4, "at least one file per day directory")

    val oneDay = Layout.readDays(spark, out, Seq("2023-11-15"))
    assert(oneDay.count() == 50)
    val prunedFiles = scanMetric(oneDay, "numFiles")
    assert(prunedFiles * 4 <= totalFiles,
      s"day filter must prune to ~1/4 of files, read $prunedFiles of $totalFiles")

    // the pruning is a planning-time partition filter, not a data filter
    val explain = oneDay.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(explain.contains("PartitionFilters"),
      "day predicate must plan as a partition filter")
  }

  test("pruned read returns exactly the partition's rows") {
    val out = tmpDir("layout2")
    val rows = (0 until 100).map(i =>
      (i.toLong, 1700000000000000L + (i % 2) * 86400000000L))
    Layout.writeDayPartitioned(rows.toDF("event_id", "ts_us"),
      col("ts_us"), out, sortCols = Nil)
    val day0 = Layout.readDays(spark, out, Seq("2023-11-14"))
      .select("event_id").as[Long].collect().sorted
    assert(day0.toSeq == (0L until 100L by 2).toSeq)
  }
}
