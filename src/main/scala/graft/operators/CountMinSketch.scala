package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a RELATION: d
  * independent hash rows of w buckets each, held as the DataFrame
  * `(j, bucket, cnt)` with at most d·w rows. A key's frequency estimate
  * is `min_j cnt[j][h_j(key)]` — never an underestimate, over by at most
  * `e/w · N` with probability `1 - e^-d`.
  *
  * Why a relation and not an in-memory matrix: at 100 TB the sketch
  * BUILD is the expensive part, and as a plain `groupBy` it gets Spark's
  * full machinery — map-side partial aggregation caps the shuffle at
  * d·w rows PER PARTITION regardless of input size (the whole point of
  * a sketch: state bounded by d·w, not by distinct keys), whole-stage
  * codegen evaluates the hash inline, and AQE coalesces the tiny
  * post-agg output. The materialized sketch is also directly MERGEABLE:
  * two sketches (yesterday's and today's, stream A's and stream B's)
  * union by `UNION ALL → groupBy (j, bucket) → sum(cnt)` — no custom
  * serialization, time-travel and retention come free from the table
  * format it's stored in.
  *
  * Versus the exact alternatives already in this engine: exact per-key
  * counts (`q_heavy_hitters`' Space-Saving sketch keeps the top keys
  * THEMSELVES; KMV keeps distinct minima for cardinality) — CMS is the
  * point-query piece: O(d) lookup of ANY key's approximate frequency
  * without storing keys at all.
  *
  * Determinism (the oracle contract): `h_j(key) = sha256("j:key")`'s
  * first 12 hex digits as a 48-bit integer, mod w — replayed digit-exact
  * in DuckDB, no engine-native hash involved. 48 bits stays inside the
  * double-exact range (< 2^53) for the oracle's `power(16, i)` sum.
  */
object CountMin {

  /** Row-j bucket of a key: 48-bit sha-prefix hash of `"j:key"`, mod w.
    * Key is hashed via its canonical decimal/string form so both engines
    * agree on the bytes. */
  def bucket(key: Column, j: Column, w: Int): Column =
    conv(substring(sha2(
        concat(j.cast("string"), lit(":"), key.cast("string")), 256),
      1, 12), 16, 10).cast("long") % w

  /** Build the sketch relation `(j, bucket, cnt)` over one pass of `df`.
    * The explode multiplies rows by d BEFORE the aggregate, but partial
    * aggregation collapses each partition to ≤ d·w cells, so the shuffle
    * is sketch-sized, not data-sized. */
  def sketch(df: DataFrame, key: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d, w=$w")
    df.select(key.cast("string").as("k"))
      .select(explode(sequence(lit(0), lit(d - 1))).as("j"), col("k"))
      .groupBy(col("j"), bucket(col("k"), col("j"), w).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of every row of `keys` (a column named
    * `keyCol`), preserving the other columns of `keys`. The sketch side
    * is ≤ d·w rows and broadcast; keys absent from the sketched data
    * estimate as ≥ 0 via the left join (a missing cell is an empty
    * bucket, count 0). Output adds `cms_est`. */
  def estimate(sk: DataFrame, keys: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame = {
    val keep = keys.columns.toSeq
    keys
      .select(keep.map(col) :+
        explode(sequence(lit(0), lit(d - 1))).as("j"): _*)
      .withColumn("bucket", bucket(col(keyCol), col("j"), w))
      .join(broadcast(sk), Seq("j", "bucket"), "left")
      .groupBy(keep.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
