package graft

import graft.operators.DataQuality
import graft.operators.DataQuality._
import org.apache.spark.sql.functions._

/** The audit contract: exact violation counts, all single-table rules
  * fused into one aggregate pass.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(5.0), "click"),
    (2L, None, "view"),
    (3L, Some(-1.0), "bogus"),
    (4L, Some(250.0), "click")).toDF("id", "v", "t")

  test("rules count violations exactly") {
    val report = DataQuality.audit(df, Seq(
        notNull("v"),
        inRange("v", 0.0, 100.0),
        inSet("t", Seq("click", "view")),
        expect("even_id", col("id") % 2 === 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(report("not_null_v") == (1L, 4L))
    assert(report("range_v") == (2L, 4L), "null must not count as range violation")
    assert(report("set_t") == (1L, 4L))
    assert(report("even_id") == (2L, 4L))
  }

  test("all single-table rules fuse into one scan") {
    val agg = DataQuality.auditAggregate(df,
      Seq(notNull("v"), inRange("v", 0.0, 100.0),
        inSet("t", Seq("click")), expect("even_id", col("id") % 2 === 0)))
    val leaves = agg.queryExecution.executedPlan.collectLeaves()
    assert(leaves.length === 1,
      s"4 rules must evaluate over ONE scan of the input, planned ${leaves.length}")
  }

  test("k-anonymity audit flags exactly the small equivalence classes") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // (click, day 0, bucket 0): 6 rows — safe; (click, day 0, bucket 1):
    // 2 rows — risky; (view, day 1, bucket 0): 1 row — risky
    val rows =
      (1 to 6).map(i => (ts(1000L + i), "click", 5.0)) ++
        Seq((ts(2000L), "click", 15.0), (ts(2001L), "click", 12.0),
          (ts(86500L), "view", 3.0))
    val dir = tmpDir("kanon")
    rows.toDF("ts", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("dq_k_anonymity")(spark, dir)
      .select("event_type", "n_combos", "n_risky_combos", "n_risky_rows",
        "min_combo_size")
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      ("click", 2L, 1L, 2L, 2L),
      ("view", 1L, 1L, 1L, 1L)), s"got $out")
  }

  test("freshness audit: the type holding the global max has zero staleness") {
    val out = SparkEntry.queries("dq_freshness")(spark, "/root/testdata/sf0.001")
      .select("event_type", "latest_us", "staleness_us")
      .as[(String, Long, Long)].collect()
    assert(out.length == 5)
    assert(out.count(_._3 == 0L) >= 1, "some type must hold the global max")
    assert(out.forall(_._3 >= 0L), "staleness is a lag, never negative")
    val globalMax = out.map(_._2).max
    assert(out.forall { case (_, l, s) => l + s == globalMax })
  }

  test("orphan check counts missing referents") {
    val dim = Seq(1L, 2L).toDF("k")
    val fact = Seq(1L, 1L, 2L, 3L, 4L).toDF("fk")
    val r = DataQuality.orphans("orphan_fk", fact, "fk", dim, "k").head()
    assert(r.getString(0) == "orphan_fk")
    assert(r.getLong(1) == 2L && r.getLong(2) == 5L)
  }
}
