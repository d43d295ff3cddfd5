package graft.queries

import graft.operators.{HeavyHitters, SkewTools}
import org.apache.spark.sql.functions._

/** Oracle rows for the scale operators that were previously spec-only:
  * salted aggregation and the Space-Saving sketch. Both are registered in
  * configurations where their result is EXACTLY a plain SQL aggregate, so
  * DuckDB can oracle the distributed implementation (the approximation
  * regimes — more keys than capacity, genuinely skewed reducers — are
  * covered by OperatorsSpec's property tests).
  */
object ScaleOpQueries {
  import Q._

  val defs: Seq[QueryDef] = Seq(

    // Skew-safe aggregation: two-stage salted sum/count over (key, salt)
    // partials. Exactly equals the direct groupBy — long partials merge
    // losslessly — while a hot key fans out over `salts` reducers instead
    // of landing on one (AQE re-plans join skew but NOT aggregation skew).
    QueryDef("q_salted_agg",
      (s, d) => SkewTools.saltedSumCount(
          table(s, d, "events")
            .select(col("user_id"), cents(col("value")).as("v_c")),
          Seq("user_id"), "v_c", salts = 16,
          sumName = "sum_value_c", countName = "n")
        .select(col("user_id"),
          col("sum_value_c").cast("long").as("sum_value_c"),
          col("n").cast("long").as("n")),
      Some("""SELECT user_id,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY user_id""".stripMargin)),

    // Arbitrary-state streaming surface (flatMapGroupsWithState) in its
    // batch-planned form: per-user running totals. On a bounded input the
    // final state equals a plain GROUP BY — which oracles the operator's
    // state-update logic (the incremental/multi-batch behavior is
    // StreamingAnalyticsSpec's job).
    QueryDef("st_user_state",
      (s, d) => graft.streaming.StreamingAnalytics
        .runningUserTotals(table(s, d, "events")).toDF(),
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c,
        |  CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS last_us
        |FROM events GROUP BY user_id""".stripMargin)),

    // Space-Saving heavy hitters: bounded-memory typed Aggregator, merged
    // across partitions. With capacity >= distinct-key count no counter is
    // ever evicted, so the sketch is EXACT (est = true count, error 0) and
    // the plain GROUP BY oracles the whole distributed reduce/merge path.
    QueryDef("q_heavy_hitters",
      (s, d) => table(s, d, "events")
        .agg(HeavyHitters.topValues(16)(col("event_type")).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h._1").as("value"),
          col("h._2").cast("long").as("est_count"),
          col("h._3").cast("long").as("max_err")),
      Some("""SELECT event_type AS value,
        |  CAST(count(*) AS BIGINT) AS est_count,
        |  CAST(0 AS BIGINT) AS max_err
        |FROM events GROUP BY event_type""".stripMargin))
  )
}
