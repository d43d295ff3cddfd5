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

  test("compaction collapses small files, preserves rows, and swaps atomically") {
    val out = tmpDir("compact") + "/events"
    // simulate a micro-batch sink: 32 tiny files
    spark.range(0, 2000).selectExpr("id AS event_id", "id * 3 AS v")
      .repartition(32).write.parquet(out)
    val beforeSum = spark.read.parquet(out)
      .agg(sum(col("v"))).head().getLong(0)

    val (before, after) = Layout.compact(spark, out, targetBytes = 1L << 20)
    assert(before == 32, s"fixture should start at 32 files, saw $before")
    assert(after < before && after >= 1,
      s"compaction must reduce the file count, got $before -> $after")

    val compacted = spark.read.parquet(out)
    assert(compacted.count() == 2000)
    assert(compacted.agg(sum(col("v"))).head().getLong(0) == beforeSum)
    // no leftover working directories
    assert(!new java.io.File(out + ".compact-tmp").exists())
    assert(!new java.io.File(out + ".compact-old").exists())
  }

  test("compaction plans no shuffle — coalesce only") {
    val out = tmpDir("compact2") + "/t"
    spark.range(0, 100).repartition(8).write.parquet(out)
    val plan = spark.read.parquet(out).coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "file-count narrowing must not pay a shuffle")
    val (b, a) = Layout.compact(spark, out, targetBytes = 1L << 20)
    assert(b == 8 && a == 1)
  }

  test("zval interleaves bits exactly") {
    val row = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zval(col("x"), col("y"), 16).as("z"))
      .collect().head.getLong(0)
    // x=101b -> even positions 0,2,4 = 1+0+16; y=011b -> odd 1,3 = 2+8
    assert(row == 27L)
    val top = Seq(((1L << 16) - 1, (1L << 16) - 1)).toDF("x", "y")
      .select(Layout.zval(col("x"), col("y"), 16).as("z"))
      .collect().head.getLong(0)
    assert(top == (1L << 32) - 1)
  }

  test("z-order layout bounds both dimensions; single-column sort only one") {
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select($"event_id", $"user_id".as("x"),
        round($"value" * 100).cast("long").as("y"))
    val zdir = tmpDir("zorder")
    val ldir = tmpDir("linear")
    Layout.writeZOrdered(ev, col("x"), col("y"), 16, zdir, 16)
    ev.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(ldir)

    // per-file (x, y) bounding boxes — what parquet min/max stats expose
    def boxes(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect().map(r => (r.getAs[Long]("x0"), r.getAs[Long]("x1"),
        r.getAs[Long]("y0"), r.getAs[Long]("y1")))
    val zb = boxes(zdir)
    val lb = boxes(ldir)
    assert(zb.length >= 8 && lb.length >= 8)

    // a y-only slice (~4% of the y range): the x-sorted layout cannot
    // prune it (every file spans all y); z-order skips most files
    def touchedY(bs: Array[(Long, Long, Long, Long)]) =
      bs.count { case (_, _, y0, y1) => y0 <= 12000L && y1 >= 10000L }
    assert(touchedY(lb) == lb.length,
      "x-sorted layout should be unable to prune a y predicate")
    assert(touchedY(zb) * 2 <= zb.length,
      s"z-order should skip at least half the files: " +
        s"${touchedY(zb)}/${zb.length}")

    // and an x slice still prunes under z-order (bounded boxes, both dims)
    def touchedX(bs: Array[(Long, Long, Long, Long)]) =
      bs.count { case (x0, x1, _, _) => x0 <= 40L && x1 >= 30L }
    assert(touchedX(zb) < zb.length,
      "z-order boxes must also bound the x dimension")
  }

  test("rank-coded z-order keeps resolution under skew; min/max does not") {
    // y is heavily skewed: 99% of rows in [0, 1000], outliers to 1e9 —
    // min/max scaling crushes the dense region into one code
    val rows = (0 until 10000).map { i =>
      val y = if (i % 100 == 99) 1000000000L + i else (i % 1000).toLong
      (i.toLong, (i % 500).toLong, y)
    }
    val df = spark.createDataFrame(rows).toDF("id", "x", "y").repartition(8)
    val mdir = tmpDir("z-minmax")
    val rdir = tmpDir("z-rank")
    Layout.writeZOrdered(df, col("x"), col("y"), 10, mdir, 16)
    Layout.writeZOrderedByRank(df, "x", "y", 8, rdir, 16)
    def touched(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("y").as("y0"), max("y").as("y1"))
      .collect()
      .map(r => (r.getAs[Long]("y0"), r.getAs[Long]("y1")))
      .count { case (y0, y1) => y0 <= 400L && y1 >= 200L }
    // a dense-region y slice: rank coding must prune where min/max can't
    val (m, r) = (touched(mdir), touched(rdir))
    assert(r < m, s"rank z-order should touch fewer files in the dense " +
      s"region: rank=$r minmax=$m")
  }

  test("stats manifest prunes a point lookup to one file of a key-sorted ledger") {
    val dir = tmpDir("zstat") + "/events"
    val rows = (0 until 20000).map(i =>
      (i.toLong, (i % 100).toLong, s"t${i % 5}"))
    rows.toDF("event_id", "user_id", "event_type")
      .repartitionByRange(10, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.parquet(dir)
    Layout.writeKeyStats(spark, dir, "event_id")

    // scanMetric must be the FIRST execution of each frame it inspects:
    // re-executing a DataFrame resets its SQL metrics, and numFiles is a
    // planning-time driver metric behind a lazy val — a second run reads 0
    def lookupPlain() = spark.read.parquet(dir)
      .filter(col("event_id") === 4242L)
    val fullFiles = scanMetric(lookupPlain(), "numFiles")
    assert(fullFiles >= 8, s"ledger must be multi-file for the test to " +
      s"bite (got $fullFiles)")
    val fullRows = lookupPlain().collect().toSeq
    assert(fullRows.size == 1)

    def lookupPruned() =
      Layout.statPrunedLookup(spark, dir, "event_id", 4242L)
    assert(scanMetric(lookupPruned(), "numFiles") == 1L,
      s"point lookup must read 1 file of the $fullFiles-file ledger")
    assert(lookupPruned().collect().toSeq == fullRows,
      "pruned lookup must return exactly the full scan's rows")

    // a key outside every file's range returns empty without a data scan
    assert(Layout.statPrunedLookup(spark, dir, "event_id", -7L).count() == 0L)
  }
}
