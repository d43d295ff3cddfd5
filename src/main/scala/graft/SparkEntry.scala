package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 plus the LLM-data-pipeline extension
  * surface (dedup / similarity / text) is registered here as a named query
  * over the driver's parquet tables, with a matching DuckDB oracle where
  * ANSI SQL can express it. Sessions that run these queries must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (events.ts is parquet
  * TIMESTAMP(NANOS)); Verify/Bench/tests all do.
  */
object SparkEntry {

  val all: Seq[QueryDef] =
    IngestOpQueries.defs ++ RelationalQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ TextQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
