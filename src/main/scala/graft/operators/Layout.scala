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
}
