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
  * Determinism (the oracle contract): the key is hashed ONCE —
  * `sha256(key)`'s first 12 hex digits as a 48-bit integer — and the d
  * row-buckets derive arithmetically by double hashing:
  * `h_j = (h1 + j·(2·h2+1)) mod w` with `h1 = hv >> 24`,
  * `h2 = hv & 0xFFFFFF` (Kirsch & Mitzenmacher 2006: two hash functions
  * simulate d pairwise-independent ones with no loss in the CMS bound;
  * the `2·h2+1` keeps the stride odd, i.e. coprime with the
  * power-of-two w). One SHA-256 per input row instead of d — the hot
  * loop of the build — and the whole derivation is replayed digit-exact
  * in DuckDB with integer arithmetic. 48 bits stays inside the
  * double-exact range (< 2^53) for the oracle's `power(16, i)` sum.
  */
object CountMin {

  /** 48-bit hash of a key: first 12 hex digits of sha256 of the key's
    * canonical decimal/string form (both engines agree on the bytes).
    * Computed ONCE per row; every row-bucket derives from it. */
  def hash48(key: Column): Column =
    conv(substring(sha2(key.cast("string"), 256), 1, 12), 16, 10)
      .cast("long")

  /** Row-j bucket from the 48-bit hash, by odd-stride double hashing:
    * `(h1 + j·(2·h2+1)) mod w`. Pure integer arithmetic — no per-row
    * re-hash for each of the d rows. */
  def bucketOf(h48: Column, j: Column, w: Int): Column =
    (shiftright(h48, 24) +
      j.cast("long") * (pmod(h48, lit(1L << 24)) * 2 + 1)) % w

  /** Row-j bucket of a key (convenience composition — callers that touch
    * many rows should hash once via [[hash48]] and use [[bucketOf]]). */
  def bucket(key: Column, j: Column, w: Int): Column =
    bucketOf(hash48(key), j, w)

  /** Build the sketch relation `(j, bucket, cnt)` over one pass of `df`.
    * The key is SHA-hashed once per input row, THEN exploded ×d with
    * arithmetic-only bucket derivation; partial aggregation collapses
    * each partition to ≤ d·w cells, so the shuffle is sketch-sized, not
    * data-sized. */
  def sketch(df: DataFrame, key: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d, w=$w")
    // the odd stride is coprime with w ONLY when w is a power of two; an
    // odd w can share a factor with the stride and fold row-buckets
    // together (the CMS overestimate bound would still hold, but the
    // rows would stop being independent — silently worse accuracy)
    require((w & (w - 1)) == 0, s"w must be a power of two; got w=$w")
    df.select(hash48(key).as("h48"))
      .select(col("h48"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .groupBy(col("j"), bucketOf(col("h48"), col("j"), w).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of every row of `keys` (a column named
    * `keyCol`), preserving the other columns of `keys`. The sketch side
    * is ≤ d·w rows and broadcast; keys absent from the sketched data
    * estimate as ≥ 0 via the left join (a missing cell is an empty
    * bucket, count 0). Output adds `cms_est`. */
  def estimate(sk: DataFrame, keys: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame = {
    require((w & (w - 1)) == 0, s"w must be a power of two; got w=$w")
    val keep = keys.columns.toSeq
    keys
      .withColumn("__h48", hash48(col(keyCol)))
      .select(keep.map(col) :+ col("__h48") :+
        explode(sequence(lit(0), lit(d - 1))).as("j"): _*)
      .withColumn("bucket", bucketOf(col("__h48"), col("j"), w))
      .join(broadcast(sk), Seq("j", "bucket"), "left")
      .groupBy(keep.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
