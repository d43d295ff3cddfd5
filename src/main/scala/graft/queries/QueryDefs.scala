package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One driver-contract query: a Spark plan over the testdata parquet tables
  * plus an equivalent ANSI/DuckDB oracle (None for ops SQL can't express —
  * the driver then records a weaker rows-only check).
  *
  * Determinism rules (the oracle compares value hashes, so results must be
  * bit-identical between Spark and DuckDB):
  *
  *  - No floating-point *aggregation*: measures go through integer cents
  *    (`round(x*100)` cast to long) so sums are order-free, overflow-safe
  *    and exact. A sum of doubles would depend on partition/accumulation
  *    order in BOTH engines and can never hash-match reliably.
  *  - Per-row double arithmetic is fine: identical operand order means
  *    identical IEEE-754 results in any engine.
  *  - Timestamps surface as epoch micros, dates, or formatted strings —
  *    never raw timestamp columns (writer tz metadata differs between the
  *    two engines' parquet output).
  *  - DuckDB's SUM(BIGINT) widens to HUGEINT and COUNT stays BIGINT while
  *    Spark's row_number/size/length are INT: every such column is cast so
  *    both sides land on BIGINT/DOUBLE exactly.
  *  - Every computed column is aliased to the same name in both dialects
  *    (the driver sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 only reads with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by Verify/Bench/tests)
    * — so in Spark the column is a LONG of epoch nanos. Nanos exceed 2^53:
    * integer division only (double math would lose micros). Truncation via
    * DIV matches DuckDB's CAST(TIMESTAMP_NS AS TIMESTAMP) semantics.
    */
  val tsMicros: Column = expr("ts DIV 1000")

  /** `ts` as a real (UTC) timestamp column, micro precision. */
  val tsCol: Column = timestamp_micros(tsMicros)

  /** Exact integer cents for a non-negative 2-decimal measure. round() is
    * HALF_UP in Spark and half-away-from-zero in DuckDB — identical for the
    * non-negative values in this data.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Shared materializations of expensive intermediates, keyed by
    * (session, data dir, tag): composed queries (near-dup verify, corpus
    * curation, winnow pairs, ...) reuse ONE persisted computation instead
    * of rebuilding it per registered query.
    *
    * `persist(MEMORY_AND_DISK)` rather than `localCheckpoint`: checkpoint
    * blocks are executor-local with lineage truncated — at cluster scale
    * one lost executor fails the whole query instead of recomputing, and
    * the eager materialization serializes the pipeline at that point.
    * Persist is lazy and fault-tolerant; the eager `count()` only
    * guarantees the blocks exist before a self-join reads the same plan
    * from both sides.
    */
  private val memo =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String, String), DataFrame]

  def cached(s: SparkSession, d: String, tag: String)(
      build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((s, d, tag), {
      val df = build.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // populate blocks once; self-joins then read them
      df
    })

  /** Release every memoized intermediate held for `s` (all data dirs, all
    * tags): unpersist the blocks and drop the memo entries so the next
    * `cached` call rebuilds. Called between bench/verify query sets and at
    * spec teardown — without it, a long single-JVM sweep accumulates every
    * persisted intermediate (fingerprints, signatures, gram sets, cluster
    * assignments, …) in executor storage for the rest of the run, and late
    * queries pay the eviction + GC churn. A later set that reuses an
    * earlier set's intermediate rebuilds it once; that one rebuild is
    * cheaper than carrying all sets' blocks to the end of the sweep.
    *
    * `blocking = false`: block deletion proceeds asynchronously; callers
    * only need the storage *budget* back, not a synchronous fence.
    */
  def release(s: SparkSession): Unit = {
    val keys = memo.keysIterator.filter(_._1 eq s).toList
    keys.foreach { k =>
      memo.remove(k).foreach(_.unpersist(blocking = false))
    }
  }

  /** Release the memoized intermediates for one (session, data dir) pair —
    * multi-scale test suites free a scale's blocks when moving on to the
    * next scale without touching other dirs' entries. */
  def release(s: SparkSession, d: String): Unit = {
    val keys = memo.keysIterator
      .filter(k => (k._1 eq s) && k._2 == d).toList
    keys.foreach { k =>
      memo.remove(k).foreach(_.unpersist(blocking = false))
    }
  }
}
