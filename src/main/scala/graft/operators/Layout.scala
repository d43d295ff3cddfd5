package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-partitioned table layout — the third data-layout lever next to
  * [[Bucketing]] (co-located joins) and sorted writes: a 100 TB event
  * table is only queryable because readers touch the days they ask for,
  * not the table. Writing hive-style `day=YYYY-MM-DD/` directories turns
  * a time filter into PLANNING-time directory pruning: the scan never
  * opens, lists, or footers the other partitions' files. LayoutSpec
  * asserts this from the executed plan's `numFiles` metric, not from
  * wall-clock.
  *
  * The partition column must be LOW cardinality (days, not timestamps):
  * each distinct value is a directory, and a too-fine key explodes the
  * file count and kills listing. Within a partition, rows are sorted by
  * the query's secondary key before writing so parquet row-group min/max
  * stats stay tight for residual predicate pushdown.
  */
object Layout {

  /** Write `df` as parquet partitioned by a derived UTC day column.
    *
    * @param tsMicros expression yielding epoch MICROS (the events table's
    *                 nanos-as-long `ts` divided by 1000)
    * @param sortCols secondary sort within each output file, so row-group
    *                 min/max stats are selective for those columns
    */
  def writeDayPartitioned(df: DataFrame, tsMicros: Column, out: String,
      sortCols: Seq[String]): Unit = {
    val withDay = df.withColumn("day",
      date_format(timestamp_micros(tsMicros), "yyyy-MM-dd"))
    val sorted =
      if (sortCols.isEmpty) withDay
      else withDay.repartition(col("day"))
        .sortWithinPartitions("day", sortCols: _*)
    sorted.write.partitionBy("day").mode("overwrite").parquet(out)
  }

  /** Read back with a day filter the planner prunes to directories. */
  def readDays(spark: SparkSession, path: String,
      days: Seq[String]): DataFrame =
    spark.read.parquet(path).filter(col("day").isin(days: _*))

  /** Compact a parquet directory's small files into ~`targetBytes` files.
    *
    * Streaming ingest and delta-style sinks (the ledger's base+delta
    * generations, micro-batch appends) accumulate files far smaller than
    * a scan wants: at 100 TB a million 1 MB files cost a listing storm,
    * a footer read per file, and one task per file. Compaction is the
    * maintenance pass that trades one bounded rewrite for every future
    * scan's speedup.
    *
    * The file count derives from the CURRENT on-disk byte size (listed
    * from the filesystem, not estimated), so output files land near
    * `targetBytes` regardless of row width. The rewrite goes to a
    * temporary sibling directory first and swaps in with two renames —
    * the window where neither directory is live is the two-rename gap;
    * on an object store a manifest-commit (the ledger's CAS pattern,
    * `LedgerStore.scala`) would close it, but plain parquet directories
    * have no manifest to commit to.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long): (Int, Int) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: org.apache.hadoop.fs.Path) = {
      val it = fs.listFiles(p, true)
      val buf = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.result()
    }
    val before = dataFiles(hPath)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact-tmp")
    fs.delete(tmp, true)
    // coalesce, not repartition: compaction must not pay a shuffle — it
    // only narrows the file count, preserving existing data order
    spark.read.parquet(path).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(path + ".compact-old")
    fs.delete(old, true)
    if (!fs.rename(hPath, old))
      throw new java.io.IOException(s"compact: cannot retire $path")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(old, hPath) // roll back to the original
      throw new java.io.IOException(s"compact: cannot publish $tmp")
    }
    fs.delete(old, true)
    (before.size, dataFiles(hPath).size)
  }
}
