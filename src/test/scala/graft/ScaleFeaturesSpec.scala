package graft

import org.apache.spark.sql.functions._

/** Runtime scale machinery the engine leans on at 100 TB, demonstrated on
  * an isolated `newSession` (own SQLConf, shared context — conf changes
  * cannot leak into concurrently running suites):
  *
  *  - injected runtime bloom filters: a selective dimension predicate is
  *    turned into a bloom-filter semi-filter on the fact side, pruning
  *    shuffle input before the join (thresholds forced to 0 here because
  *    the local fixtures are far below the 10 MB/10 GB production
  *    defaults);
  *  - AQE skew-join splitting: a hot key's shuffle partition is split
  *    into sub-partitions at runtime — the runtime counterpart of
  *    `SkewTools.saltedJoin`'s plan-time salting.
  */
class ScaleFeaturesSpec extends SparkSpec {

  test("runtime bloom filter prunes the fact side of a selective join") {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // creationSideThreshold is a MAXIMUM (the filter-building side must be
    // small); applicationSideScanSizeThreshold is a MINIMUM (the pruned
    // side must be big). Local fixtures are tiny, so only the minimum
    // needs lowering.
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val l = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = s.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val optimized = j.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain") ||
      optimized.toLowerCase.contains("bloomfilter"),
      s"expected an injected bloom filter in:\n${optimized.take(1500)}")

    // pruning must not change the answer
    val plain = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .join(spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(j.collect().toSeq == plain.collect().toSeq)
  }

  test("AQE splits a skewed join partition at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._

    // key 7 owns ~95% of the fact rows; the dim side is uniform
    val fact = ((1 to 200000).map(i => (7L, s"payload-$i")) ++
      (1 to 10000).map(i => (i.toLong % 100, s"p-$i")))
      .toDF("k", "payload").repartition(8)
    val dim = (0L to 99L).map(k => (k, s"attr-$k")).toDF("k2", "attr")
    val joined = fact.join(dim, $"k" === $"k2")
      .groupBy("attr").agg(count(lit(1)).as("n"))

    val rows = joined.collect()
    assert(rows.map(_.getLong(1)).sum == 210000L)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected a skew-split join in:\n${finalPlan.take(1500)}")
  }
}
