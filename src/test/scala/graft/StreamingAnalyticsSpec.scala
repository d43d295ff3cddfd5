package graft

import graft.streaming.StreamingAnalytics
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation: the streaming plan must produce exactly
  * the batch answer once the stream drains (the Dataflow-model equivalence
  * that Structured Streaming guarantees).
  */
class StreamingAnalyticsSpec extends SparkSpec {

  test("watermarked hourly windows: streaming result == batch result") {
    // stage the events file into a streaming-source directory
    val dir = tmpDir("stream-events")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(dir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val streamed = StreamingAnalytics.hourlyCounts(
      StreamingAnalytics.readEvents(spark, dir))
    val q = streamed.writeStream
      .format("memory").queryName("hourly")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly")
      .orderBy("hour_start", "event_type").collect()

    val batch = StreamingAnalytics.hourlyCounts(
        spark.read.schema(StreamingAnalytics.eventsSchema).parquet(dir))
      .orderBy("hour_start", "event_type").collect()

    assert(got.length == batch.length && got.length > 0)
    assert(got.toSeq == batch.toSeq)
  }

  test("streaming dedup within watermark drops cross-batch redeliveries") {
    import spark.implicits._
    val dir = tmpDir("dedup-events")
    val cp = tmpDir("dedup-cp")
    val src = spark.read.schema(StreamingAnalytics.eventsSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
      .filter($"event_id" < 200)

    // wave 1: the events; wave 2: the SAME events again (at-least-once
    // redelivery) plus a fresh tail — the dedup state must survive the
    // micro-batch boundary and absorb the duplicates
    src.filter($"event_id" < 100).write.parquet(s"$dir/b1")
    val rawStream = spark.readStream
      .schema(StreamingAnalytics.eventsSchema).parquet(s"$dir/*")
    val deduped = rawStream
      .withColumn("ts_ts",
        timestamp_micros(graft.queries.Q.tsMicrosOf(rawStream)))
      .withWatermark("ts_ts", "10 days")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      q.processAllAvailable()
      src.write.parquet(s"$dir/b2") // full redelivery + tail
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sdedup").select("event_id").as[Long].collect()
    assert(got.length == got.distinct.length) // no duplicate survived
    assert(got.toSet == src.select("event_id").as[Long].collect().toSet)
  }

  test("session windows run incrementally: streaming result == batch") {
    // the same session_window() aggregation the st_session_window contract
    // query registers, run as an actual stream — proves the operator's
    // streaming capability, not just its batch semantics
    val dir = tmpDir("session-events")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(dir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts_ts", timestamp_micros(graft.queries.Q.tsMicrosOf(df)))
      .withWatermark("ts_ts", "10 days")
      .groupBy(col("user_id"), session_window(col("ts_ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start"),
        col("n_events"))

    val q = sessions(spark.readStream
        .schema(StreamingAnalytics.eventsSchema).parquet(dir))
      .writeStream.format("memory").queryName("ssw")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("ssw")
      .orderBy("user_id", "session_start").collect()
    val batch = sessions(spark.read
        .schema(StreamingAnalytics.eventsSchema).parquet(dir))
      .orderBy("user_id", "session_start").collect()
    assert(got.length == batch.length && got.length > 0)
    assert(got.toSeq == batch.toSeq)
  }

  test("stream-static broadcast join enriches events statelessly") {
    val dir = tmpDir("enrich-events")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(dir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val cust = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))

    def enriched(ev: org.apache.spark.sql.DataFrame) = ev
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))

    val q = enriched(StreamingAnalytics.readEvents(spark, dir))
      .writeStream.format("memory").queryName("enrich")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // the dimension join itself holds NO streaming state — only the
      // aggregation appears as a state operator
      assert(q.lastProgress.stateOperators.length == 1)
    } finally q.stop()

    val got = spark.table("enrich").orderBy("c_mktsegment").collect()
    val batch = enriched(spark.read
        .schema(StreamingAnalytics.eventsSchema).parquet(dir))
      .orderBy("c_mktsegment").collect()
    assert(got.length == batch.length && got.length > 0)
    assert(got.toSeq == batch.toSeq)
  }

  test("stream-stream interval join: waves == batch, state bounded by watermark") {
    import spark.implicits._
    val vDir = tmpDir("ssj-views")
    val pDir = tmpDir("ssj-purchases")
    val cp = tmpDir("ssj-cp")
    val src = spark.read.schema(StreamingAnalytics.eventsSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    val views = src.filter($"event_type" === "view")
    val purchases = src.filter($"event_type" === "purchase")

    // waves split by TIME, not id: late-past-watermark input would be
    // dropped by the streaming join and diverge from the batch plan
    val tsUs = graft.queries.Q.tsMicrosOf(src)
    val Array(lo, hi) = src.agg(min(tsUs), max(tsUs)).as[(Long, Long)]
      .collect().map { case (a, b) => Array(a, b) }.head
    val mid = lo + (hi - lo) / 2
    views.filter(tsUs < mid).write.parquet(s"$vDir/w1")
    purchases.filter(tsUs < mid).write.parquet(s"$pDir/w1")

    val joined = StreamingAnalytics.attributionJoin(
      spark.readStream.schema(StreamingAnalytics.eventsSchema)
        .parquet(s"$vDir/*"),
      spark.readStream.schema(StreamingAnalytics.eventsSchema)
        .parquet(s"$pDir/*"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      q.processAllAvailable()
      views.filter(tsUs >= mid).write.parquet(s"$vDir/w2")
      purchases.filter(tsUs >= mid).write.parquet(s"$pDir/w2")
      q.processAllAvailable()

      // the streaming plan is the symmetric hash join, and its buffered
      // state holds only rows the watermark still allows to match — far
      // fewer than the full 30-day corpus of views+purchases
      val stateOps = q.recentProgress.reverse
        .flatMap(_.stateOperators).headOption
      assert(stateOps.exists(_.operatorName == "symmetricHashJoin"))
      val total = views.count() + purchases.count()
      assert(stateOps.exists(_.numRowsTotal < total / 2))
    } finally q.stop()

    val got = spark.table("ssj")
      .orderBy("view_id", "purchase_id").collect()
    val batch = StreamingAnalytics.attributionJoin(views, purchases)
      .orderBy("view_id", "purchase_id").collect()
    assert(got.length == batch.length && got.length > 0)
    assert(got.toSeq == batch.toSeq)
  }

  test("flatMapGroupsWithState accumulates per-user state across batches") {
    import spark.implicits._
    val dir = tmpDir("state-events")
    val cp = tmpDir("state-cp")
    val src = spark.read.schema(StreamingAnalytics.eventsSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")

    // two arrival waves into one running query — state must carry across
    // the micro-batch boundary
    src.filter($"event_id" < 500).write.parquet(s"$dir/b1")
    val stream1 = StreamingAnalytics.runningUserTotals(
      spark.readStream.schema(StreamingAnalytics.eventsSchema)
        .parquet(s"$dir/*"))
    val q = stream1.writeStream.format("memory").queryName("ut")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      q.processAllAvailable()
      src.filter($"event_id" >= 500).write.parquet(s"$dir/b2")
      q.processAllAvailable()
    } finally q.stop()

    // the LATEST update per user must equal the batch ground truth
    val latest = spark.table("ut").groupBy("user_id")
      .agg(max(struct($"n", $"value_c", $"last_us")).as("s"))
      .select($"user_id", $"s.n", $"s.value_c", $"s.last_us")
      .orderBy("user_id").collect()
    val truth = src.groupBy("user_id").agg(
        count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("long")).as("value_c"),
        max(graft.queries.Q.tsMicrosOf(src)).as("last_us"))
      .orderBy("user_id").collect()
    assert(latest.length == truth.length)
    assert(latest.toSeq == truth.toSeq)
  }

  test("left-outer interval join: nulls emit only after the window closes") {
    import spark.implicits._
    val dir = tmpDir("soj-events")
    val cp = tmpDir("soj-cp")
    def ev(id: Long, min: Long, user: Long, typ: String) =
      (id, min * 60L * 1000000L, user, typ, 1.0, "") // ts in epoch MICROS
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    // waves are written in the events-table physical shape the streaming
    // schema expects: ts as TIMESTAMP_NTZ (micros), like driver testdata
    def waveDf(rows: Seq[(Long, Long, Long, String, Double, String)]) =
      rows.toDF(cols: _*)
        .withColumn("ts", timestamp_micros($"ts").cast("timestamp_ntz"))
    // wave 1: two views; user 1's purchase lands inside the 1h horizon,
    // user 2 never purchases
    waveDf(Seq(ev(1, 1, 1L, "view"), ev(2, 2, 2L, "view"),
      ev(3, 30, 1L, "purchase"))).write.parquet(s"$dir/b1")
    val views = spark.readStream.schema(StreamingAnalytics.eventsSchema)
      .parquet(s"$dir/*").filter($"event_type" === "view")
    val purchases = spark.readStream.schema(StreamingAnalytics.eventsSchema)
      .parquet(s"$dir/*").filter($"event_type" === "purchase")
    val joined = StreamingAnalytics.attributionJoin(
      views, purchases, joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("soj")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      q.processAllAvailable()
      // user 2's null verdict must NOT have emitted yet: the purchase
      // watermark (30min - 2h delay) has not closed view 2's horizon
      val early = spark.table("soj").collect()
      assert(early.forall(r => !r.isNullAt(r.fieldIndex("purchase_id"))),
        s"null row emitted before the window provably closed: ${early.toSeq}")
      // wave 2: far-future events on BOTH sides — the operator's
      // watermark is the MIN over all inputs, so advancing only the
      // purchase side would leave the view-side watermark at 2min and
      // nothing would ever close. The far-future view itself stays open
      // (its own horizon is beyond the new watermark) and must NOT emit.
      waveDf(Seq(ev(4, 600, 98L, "view"), ev(5, 601, 99L, "purchase")))
        .write.mode("append").parquet(s"$dir/b2")
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("soj")
      .select("view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(out == Set((1L, 3L), (2L, -1L)),
      s"expected one inner match and one closed-window null, got $out")
  }

  test("streaming heavy hitters: exact regime across micro-batches") {
    import spark.implicits._
    val dir = tmpDir("hh-events")
    val cp = tmpDir("hh-cp")
    val src = spark.read.schema(StreamingAnalytics.eventsSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    src.filter($"event_id" < 500).write.parquet(s"$dir/b1")
    val stream = StreamingAnalytics.streamingTopUsers(
      spark.readStream.schema(StreamingAnalytics.eventsSchema)
        .parquet(s"$dir/*"), capacity = 4096, k = 10)
    val q = stream.writeStream.format("memory").queryName("hh")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      q.processAllAvailable()
      src.filter($"event_id" >= 500).write.parquet(s"$dir/b2")
      q.processAllAvailable()
    } finally q.stop()

    // final emission per type = the one whose n_seen covers the full type
    val totals = src.groupBy("event_type").agg(count(lit(1)).as("tot"))
    val finalTop = spark.table("hh")
      .join(totals, "event_type")
      .filter($"n_seen" === $"tot")
      .select("event_type", "user_id", "cnt", "err", "rnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy($"cnt".desc, $"user_id")
    val truth = src.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 10)
      .select($"event_type", $"user_id", $"cnt", lit(0L).as("err"), $"rnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(finalTop == truth)
  }

  test("streaming heavy hitters: approx regime keeps Space-Saving bounds") {
    import spark.implicits._
    // 60 events over 12 users, skewed; capacity 4 forces evictions
    val rows = (1 to 30).map(i => (i.toLong, 0L, 1L, "click", 0.0, "")) ++
      (1 to 15).map(i => (30L + i, 0L, 2L, "click", 0.0, "")) ++
      (1 to 15).map(i => (45L + i, 0L, (2 + i).toLong, "click", 0.0, ""))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = StreamingAnalytics.streamingTopUsers(ev, capacity = 4, k = 4)
      .collect()
    assert(out.length <= 4, "emission bounded by k <= capacity")
    val truth = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    out.foreach { t =>
      assert(t.n_seen == 60L)
      val real = truth.getOrElse(t.user_id, 0L)
      assert(t.cnt >= real, s"Space-Saving must overestimate: $t vs $real")
      assert(t.cnt - t.err <= real, s"err bound violated: $t vs $real")
    }
    // any key with true count > n/capacity = 15 must be present
    val present = out.map(_.user_id).toSet
    assert(present.contains(1L), "guaranteed heavy key (30 > 60/4) missing")
  }

  test("watermark late-drop ledger matches Spark's own drop metric") {
    import spark.implicits._
    // the REAL two-batch stream behind st_late_data: even event_ids
    // arrive in batch 1, odd in batch 2 — after batch 1 the watermark is
    // max(batch-1 event time) - 10 min, so batch-2 rows whose hourly
    // window closed below it are dropped by the stateful aggregation.
    // The registered query PREDICTS those drops in exact integer micros;
    // the stream's numRowsDroppedByWatermark metric must agree.
    val sfDir = "/root/testdata/sf0.001"
    val dir = tmpDir("late-events")
    val cp = tmpDir("late-cp")
    val src = spark.read.schema(StreamingAnalytics.eventsSchema)
      .parquet(s"$sfDir/events.parquet")
    src.filter($"event_id" % 2 === 0).write.parquet(s"$dir/b1")
    val rawStream = spark.readStream
      .schema(StreamingAnalytics.eventsSchema).parquet(s"$dir/*")
    val agg = rawStream
      .withColumn("ts_ts",
        timestamp_micros(graft.queries.Q.tsMicrosOf(rawStream)))
      .withWatermark("ts_ts", "10 minutes")
      .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
      .count()
    val q = agg.writeStream.format("memory").queryName("latewm")
      .option("checkpointLocation", cp).outputMode("update").start()
    try {
      q.processAllAvailable()
      src.filter($"event_id" % 2 === 1).write.parquet(s"$dir/b2")
      q.processAllAvailable()
    } finally q.stop()
    val droppedByEngine = q.recentProgress
      .flatMap(p => p.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    // the engine filters late keys AFTER map-side partial aggregation,
    // so its metric counts closed (window, type) GROUPS — the ledger's
    // n_late_windows view, summed per type over distinct late windows
    val ledger = SparkEntry.queries("st_late_data")(spark, sfDir)
      .agg(sum("n_batch2_late"), sum("n_late_windows"))
      .as[(Long, Long)].head()
    assert(ledger._1 > 0, "fixture must contain late batch-2 rows")
    assert(droppedByEngine == ledger._2,
      s"engine dropped $droppedByEngine groups, ledger predicts ${ledger._2}")
    assert(ledger._1 >= ledger._2, "late rows can never undercount groups")
  }
}
