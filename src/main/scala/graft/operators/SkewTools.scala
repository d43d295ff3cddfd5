package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys at 100 TB scale.
  *
  * A plain `groupBy(key).sum()` sends every row of a hot key to ONE
  * reducer; when one key owns 10% of a 100 TB table, that reducer gets
  * 10 TB and the stage never finishes. Salted aggregation spreads each key
  * over `salts` reducers with a uniform per-row salt, aggregates partials
  * on (key, salt), then combines the (tiny) partials per key — correct for
  * any algebraic aggregate whose partial states merge (sum/count/min/max,
  * and avg as sum+count).
  *
  * AQE's skew-join handling covers JOIN skew at runtime; this covers
  * AGGREGATION skew, which AQE does not re-plan.
  */
object SkewTools {

  /** Uniform per-row salt in [0, salts): derived from a per-partition
    * monotonically increasing id, so it needs no data columns, costs no
    * hashing, and spreads evenly regardless of key distribution.
    */
  def salt(salts: Int): Column = pmod(monotonically_increasing_id(), lit(salts.toLong))

  /** Two-stage salted sum+count per key. Result is EXACTLY the direct
    * `groupBy(keys).agg(sum, count)` — integer/long partials merge
    * losslessly — but the wide shuffle carries (key, salt) groups, so a
    * hot key fans out over `salts` reducers.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salts: Int = 64,
      sumName: String = "sum_value",
      countName: String = "n"): DataFrame = {
    val partial = df
      .withColumn("_salt", salt(salts))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_ps"), count(lit(1)).as("_pc"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_ps")).as(sumName), sum(col("_pc")).as(countName))
  }

  /** Salted skew JOIN: spread a hot fact key over `salts` reducers by
    * salting the fact side and replicating the (small) build side once
    * per salt value, then equi-joining on (key, salt). The result is
    * row-identical to the plain equi-join — the salt only changes WHERE
    * each row is joined, never whether it matches — but no single reducer
    * receives a hot key's full row set.
    *
    * This is the explicit form of what AQE's skew-join split does at
    * runtime; use it when the skew is known ahead of time (so the plan
    * never materializes the skewed partition at all), when AQE is
    * unavailable (streaming micro-batches), or when the build side is too
    * big to broadcast but small enough to replicate `salts`×. The
    * replication factor is the cost dial: `salts` × |build| extra rows
    * shuffled, in exchange for a `salts`-way fan-out of the hottest key.
    */
  def saltedJoin(
      fact: DataFrame,
      build: DataFrame,
      factKey: String,
      buildKey: String,
      salts: Int = 16): DataFrame = {
    val salted = fact.withColumn("_salt", salt(salts))
    val replicated = build.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          salted(factKey) === replicated(buildKey))
      .drop("_salt")
  }
}
