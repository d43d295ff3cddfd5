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
}
