package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.tuned(SparkSession.builder())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // Legacy-fixture compat (old nanos events.parquet); no-op on current
    // TIMESTAMP(MICROS) testdata — Q.normalizeEventsTs adapts per schema
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.spark
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Suites share one session: release this suite's memoized persisted
    * intermediates when it finishes, so a full `sbt test` run doesn't
    * accumulate every suite's blocks in executor storage (same hygiene as
    * Bench/Verify at query-set boundaries). */
  override protected def afterAll(): Unit = {
    graft.queries.Q.release(spark)
    super.afterAll()
  }
}
