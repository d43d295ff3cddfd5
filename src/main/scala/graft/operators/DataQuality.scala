package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the expectations pass a pipeline runs
  * before admitting a batch downstream (the reference's per-file
  * validation, generalized to table-level constraints).
  *
  * Every rule is an aggregate expression, so ONE pass over the table
  * evaluates all of them together (they fuse into a single HashAggregate —
  * no per-rule scan, which is what makes a 40-rule audit affordable at
  * 100 TB). Referential checks are the exception: they need the other
  * table, and run as a single anti-join counted into the same report.
  *
  * The report is rows of (rule, violations, checked) — exact counts, not
  * booleans, so downstream thresholds ("fail the batch if >0.1% nulls")
  * stay a consumer decision.
  */
object DataQuality {

  final case class Rule(name: String, violation: Column)

  /** Rows where `c` is null. */
  def notNull(c: String): Rule =
    Rule(s"not_null_$c", col(c).isNull)

  /** Rows where `c` falls outside [lo, hi]. */
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$c", col(c).isNotNull && (col(c) < lo || col(c) > hi))

  /** Rows where `c` is not one of the allowed values. */
  def inSet(c: String, allowed: Seq[String]): Rule =
    Rule(s"set_$c", col(c).isNotNull && !col(c).isin(allowed: _*))

  /** Rows failing an arbitrary boolean expectation (violation = NOT ok). */
  def expect(name: String, ok: Column): Rule = Rule(name, !ok)

  /** The fused one-row aggregate all single-table rules evaluate in:
    * one `checked` count plus one violation count per rule, over ONE scan
    * of `df` (DataQualitySpec asserts the single-scan plan).
    */
  def auditAggregate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("checked") +:
      rules.map(r => count(when(r.violation, 1)).as(r.name))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Evaluate all single-table rules in one aggregate pass. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    val row = auditAggregate(df, rules).head()
    val checked = row.getLong(0)
    val out = rules.zipWithIndex.map { case (r, i) =>
      (r.name, row.getLong(i + 1), checked)
    }
    spark.createDataFrame(out).toDF("rule", "violations", "checked")
  }

  /** Referential-integrity orphan count: rows of `fact` whose `factKey`
    * has no match in `dim.dimKey` — a left-anti join, broadcast when the
    * key side is small, counted into the same (rule, violations, checked)
    * shape so it unions with [[audit]] reports.
    */
  def orphans(name: String, fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame = {
    val spark = fact.sparkSession
    val n = fact.join(dim.select(col(dimKey)).distinct(),
      col(factKey) === col(dimKey), "left_anti").count()
    val total = fact.count()
    spark.createDataFrame(Seq((name, n, total)))
      .toDF("rule", "violations", "checked")
  }
}
