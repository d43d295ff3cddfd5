package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * pattern: keep a per-key table of MERGEABLE partial statistics, fold
  * each arriving delta into it, and finalize user-facing views from the
  * state. A refresh then scans the delta, never the history — the only
  * way a continuously-updated aggregate over a 100 TB event table stays
  * affordable (the alternative, full-recompute-per-refresh, rescans the
  * world on every batch).
  *
  * The algebra is the same partial/final split Spark's own two-phase
  * aggregation uses inside one query, lifted to a PERSISTENT boundary:
  * `state(a ++ b) == merge(state(a), state(b))` because every kept
  * statistic folds associatively and commutatively (count/sum by
  * addition, min/max by extremum). Averages finalize from sum/count;
  * exact distinct counts are deliberately ABSENT — they are not
  * mergeable without per-key sets, which is precisely why production
  * state tables carry HLL/theta sketches for them instead.
  *
  * OperatorsSpec asserts the merge identity against a direct
  * full-recompute, and the `q_incr_agg` driver query oracles the
  * base+delta fold against DuckDB's single-pass GROUP BY.
  */
object IncrementalAgg {

  /** Build per-key partial state over an exact integer measure:
    * (keys..., s_cnt, s_sum, s_min, s_max). One map-side-combinable
    * shuffle on the keys — the same cost as the aggregate it maintains.
    */
  def state(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("s_cnt"), sum(value).as("s_sum"),
      min(value).as("s_min"), max(value).as("s_max"))

  /** Fold partial states (any number) into one: union + re-aggregate by
    * key, each statistic by its own fold. Inputs and output share one
    * schema, so folds chain: yesterday's state is just another operand.
    */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    states.reduce(_ unionByName _).groupBy(keys.map(col): _*).agg(
      sum("s_cnt").as("s_cnt"), sum("s_sum").as("s_sum"),
      min("s_min").as("s_min"), max("s_max").as("s_max"))
  }

  /** Finalize the user-facing view: derived statistics (integer average)
    * computed from the mergeable base, never stored in it.
    */
  def finalize(state: DataFrame): DataFrame =
    state.withColumn("s_avg", expr("s_sum DIV s_cnt"))
}
