package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, functions}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}

/** KMV (k minimum values) distinct-value sketch as a typed Spark
  * `Aggregator` — the bounded-memory, mergeable cardinality/overlap
  * sketch (Bar-Yossef et al. 2002; the same structure Theta sketches
  * build on): keep the k smallest DISTINCT hash values ever seen; the
  * k-th minimum estimates cardinality as `(k-1) / U_(k)` with `U_(k)`
  * the k-th minimum normalized to [0,1], and two sketches union by
  * merging and re-truncating to k.
  *
  * Why this over exact distinct at 100 TB: `count(distinct key)` per
  * group shuffles every distinct key; this sketch reduces each partition
  * to ≤ k longs, merges associatively through map-side partial
  * aggregation, and — unlike HLL — supports set INTERSECTION estimates
  * (Jaccard between groups) because the retained values themselves can
  * be compared across sketches.
  *
  * Determinism: the k smallest distinct values of a set are a pure
  * function of the set — no insertion-order or merge-order dependence —
  * so results are bit-identical across partitionings and engines (the
  * DuckDB oracle re-derives them with a rank window over distinct
  * hashes).
  *
  * The buffer is a sorted distinct `Array[Long]` capped at k: reduce is
  * O(1) for the common full-sketch reject (`v >= last`), O(log k + k)
  * on accept; merge is one linear pass. k is small (64–1024), so the
  * array beats a tree in both allocation and encoder cost.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, s"sketch size must be positive: $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], v: Long): Array[Long] = {
    val n = b.length
    if (n == k && v >= b(n - 1)) b // full and not smaller: reject, O(1)
    else {
      val pos = java.util.Arrays.binarySearch(b, v)
      if (pos >= 0) b // already present: a sketch holds distinct values
      else {
        val ins = -pos - 1
        val out = new Array[Long](math.min(n + 1, k))
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(b, ins, out, ins + 1, out.length - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      // one merge pass over two sorted distinct arrays, stop at k kept
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { val v = b(j); j += 1; v }
          else if (j >= b.length) { val v = a(i); i += 1; v }
          else if (a(i) < b(j)) { val v = a(i); i += 1; v }
          else if (a(i) > b(j)) { val v = b(j); j += 1; v }
          else { val v = a(i); i += 1; j += 1; v } // shared value: once
        out(o) = take
        o += 1
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }
  }

  /** The ≤ k minima, ascending — `seq(k-1)` is the estimator's k-th
    * minimum; fewer than k entries means the sketch saw the whole set
    * and the cardinality is exact. */
  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object Kmv {
  /** UDAF form for untyped DataFrames:
    * `df.groupBy("g").agg(Kmv.minValues(64)(col("h")))` — yields the
    * ascending ≤ k distinct minima of the hash column. */
  def minValues(k: Int): UserDefinedFunction =
    functions.udaf(new KmvSketch(k), Encoders.scalaLong)
}
