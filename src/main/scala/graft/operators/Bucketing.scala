package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) tables: the 100 TB technique for repeated
  * co-located joins and aggregations.
  *
  * A join between two tables bucketed by the join key into the same bucket
  * count plans with ZERO Exchange operators — the shuffle was paid once at
  * write time and amortizes over every subsequent join/aggregation on that
  * key. At 100 TB, joining fact tables (lineitem ⋈ orders on orderkey) is
  * otherwise a full two-sided shuffle per query; bucketing both on the key
  * turns it into a per-bucket merge. `sortBy` additionally lets the join
  * run as a sort-merge without sorting at read time.
  *
  * Bucketed tables require the session catalog (`saveAsTable`), which is
  * where Spark keeps the bucketing metadata — a plain parquet path write
  * cannot record it.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (overwriting), bucketed and
    * sorted by `keys` into `buckets` files per partition.
    */
  def writeBucketed(df: DataFrame, tableName: String, buckets: Int,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Join two same-bucketed tables on their bucket keys — plans without
    * any Exchange when both were written via [[writeBucketed]] with the
    * same bucket count.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
