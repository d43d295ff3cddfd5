package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed total-order ranking.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY is the classic
  * scale cliff: Spark plans it as a SinglePartition exchange — every row
  * of a 100 TB table funnels through ONE task. The scalable form is the
  * three-step dance Spark's own `RDD.zipWithIndex` uses:
  *
  *   1. range-repartition on the sort key (sampled boundaries, so each
  *      partition holds a contiguous key range) and sort within partitions
  *      — a single parallel shuffle;
  *   2. one cheap job counting rows per partition (counts only — bytes
  *      per partition, never data);
  *   3. emit `global rank = partition offset + local index` in parallel.
  *
  * The rank is deterministic whenever the sort key is a total order (pass
  * a tiebreaker column); boundary placement from sampling never affects
  * it, only which task computes which range. The shuffle from step 1 is
  * reused by steps 2–3 (same lineage), so the table is read once.
  */
object TotalOrder {

  /** Append a 1-based dense global rank column ordered by `sortCols`.
    *
    * `sortCols` must be a total order (include a unique tiebreaker) for a
    * deterministic result; null sort keys order first, as in SQL
    * NULLS FIRST semantics.
    */
  /** Append an INCLUSIVE running sum of `valueCol` (a LONG column) in
    * `sortCols` order — the distributed prefix-sum (scan) primitive.
    * Same scale story as [[globalRank]]: the naive
    * `sum() OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)` funnels the
    * table through one partition; this form pays one range shuffle, a
    * counts-only pass collecting per-partition TOTALS (numPartitions
    * longs, never data), and a parallel emit of offset + local running
    * sum.
    */
  def prefixSum(df: DataFrame, sortCols: Seq[Column], valueCol: String,
      sumName: String, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    // Normalize the measure INSIDE the plan before the RDD boundary: an
    // IntegerType measure would otherwise ClassCastException at
    // Row.getLong, and a NULL would silently unbox to 0 — the cast
    // handles any integral type, and nulls are explicitly counted as 0
    // (documented SUM-of-nothing semantics for a running total).
    require(!df.columns.contains("_psv"),
      "prefixSum reserves the internal column name _psv")
    val prepared = df.withColumn("_psv",
      org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.col(valueCol).cast("long"),
        org.apache.spark.sql.functions.lit(0L)))
    val ranged = prepared
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = ranged.schema.fieldIndex("_psv") // appended: last position
    val totals = ranged.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    val schema = df.schema.add(sumName, LongType, nullable = false)
    val rows = ranged.rdd.mapPartitionsWithIndex { (i, it) =>
      var run = offsets(i)
      it.map { r =>
        run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq.patch(vIdx, Nil, 1) :+ run)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  def globalRank(df: DataFrame, sortCols: Seq[Column],
      rankName: String, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = ranged.schema.add(rankName, LongType, nullable = false)
    // zipWithIndex runs the per-partition count job and the emit pass
    // itself, reusing the range shuffle between them
    val rows = ranged.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rows, schema)
  }
}
