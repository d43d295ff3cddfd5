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
}
