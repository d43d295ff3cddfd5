package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftInternal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
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
  *
  * Implementation note — why InternalRow: the emit pass crosses an RDD
  * boundary, and doing it over `Dataset.rdd` deserializes every field to
  * an external `Row` and back (`createDataFrame` then re-validates the
  * schema row by row) — a constant factor that dominated the operator's
  * cost. The passes below stay on the executed plan's `InternalRow`s
  * (UnsafeRow field reads, one UnsafeProjection per output row) and
  * rebuild the DataFrame through the internal constructor, so no
  * external-row materialization ever happens.
  */
object TotalOrder {

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
    // getLong, and a NULL would silently unbox to 0 — the cast
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
    val schema = ranged.schema
    val vIdx = schema.fieldIndex("_psv") // appended: last position
    val internal = GraftInternal.toInternalRdd(ranged)
    // Pass 2: per-partition TOTALS only (numPartitions longs cross the
    // driver, never rows). _psv is a non-null long by construction.
    val totals = internal.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    // Pass 3 (reuses pass 1's shuffle): drop _psv, append the running
    // sum. One UnsafeProjection per partition; the projected row is
    // reused per the iterator discipline — the scan operator downstream
    // copies as it consumes.
    val inFields = schema.fields
    val outIdx = inFields.indices.filter(_ != vIdx)
    val rows = internal.mapPartitionsWithIndex { (i, it) =>
      val refs = outIdx.map(j =>
        BoundReference(j, inFields(j).dataType, inFields(j).nullable)) :+
        BoundReference(inFields.length, LongType, nullable = false)
      val proj = UnsafeProjection.create(refs.toArray)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      var run = offsets(i)
      it.map { r =>
        run += r.getLong(vIdx)
        extra.update(0, run)
        proj(joined(r, extra)): InternalRow
      }
    }
    val outSchema = df.schema.add(sumName, LongType, nullable = false)
    GraftInternal.internalCreateDataFrame(spark, rows, outSchema)
  }

  /** Append a 1-based dense global rank column ordered by `sortCols`.
    *
    * `sortCols` must be a total order (include a unique tiebreaker) for a
    * deterministic result; null sort keys order first, as in SQL
    * NULLS FIRST semantics.
    */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
      rankName: String, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = ranged.schema
    val internal = GraftInternal.toInternalRdd(ranged)
    // Pass 2: row COUNTS per partition (what RDD.zipWithIndex does, but
    // without leaving InternalRow).
    val counts = internal.mapPartitionsWithIndex { (i, it) =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator((i, n))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    // Pass 3: rank = partition offset + local index, appended in-plan.
    val inFields = schema.fields
    val rows = internal.mapPartitionsWithIndex { (i, it) =>
      val refs = inFields.indices.map(j =>
        BoundReference(j, inFields(j).dataType, inFields(j).nullable)) :+
        BoundReference(inFields.length, LongType, nullable = false)
      val proj = UnsafeProjection.create(refs.toArray)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      var rank = offsets(i)
      it.map { r =>
        rank += 1L
        extra.update(0, rank)
        proj(joined(r, extra)): InternalRow
      }
    }
    val outSchema = schema.add(rankName, LongType, nullable = false)
    GraftInternal.internalCreateDataFrame(spark, rows, outSchema)
  }
}
