package graft

/** The shared-intermediate memo's release contract (`Q.release`): storage
  * actually drops when a sweep leaves a query set — the round-4 bench
  * degradation was exactly this hygiene missing, so it's pinned as a test,
  * not just a Bench behavior.
  */
class MemoHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("release unpersists every memoized block and the memo rebuilds") {
    graft.queries.Q.release(spark) // start from a clean memo
    val before = spark.sparkContext.getPersistentRDDs.size
    // text_winnow_fingerprint builds through a cached() intermediate
    SparkEntry.queries("text_winnow_fingerprint")(spark, dir).foreach(_ => ())
    val during = spark.sparkContext.getPersistentRDDs.size
    assert(during > before,
      s"cached() must register persisted blocks (before=$before during=$during)")
    graft.queries.Q.release(spark)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before,
      s"release must unpersist every memoized block (before=$before after=$after)")
    // the memo is empty, not poisoned: the next consumer rebuilds cleanly
    assert(SparkEntry.queries("text_winnow_fingerprint")(spark, dir).count() > 0)
    graft.queries.Q.release(spark)
  }

  test("per-dir release frees one scale's entries and leaves others cached") {
    graft.queries.Q.release(spark)
    val otherDir = "/root/testdata/sf0.01"
    SparkEntry.queries("text_winnow_fingerprint")(spark, dir).foreach(_ => ())
    SparkEntry.queries("text_winnow_fingerprint")(spark, otherDir).foreach(_ => ())
    val both = spark.sparkContext.getPersistentRDDs.size
    graft.queries.Q.release(spark, dir)
    val one = spark.sparkContext.getPersistentRDDs.size
    assert(one < both, "releasing one dir must free its blocks")
    assert(one > 0, "the other dir's blocks must survive a per-dir release")
    graft.queries.Q.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
