package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time streaming analytics over the events stream (SURVEY.md §2.6
  * ST1 generalized beyond ingest): watermarked tumbling-window aggregation,
  * the standard Structured Streaming shape — incremental state per
  * (window, key), late data dropped past the watermark, output grows only
  * with closed windows.
  *
  * Scale: state is O(open windows × keys), independent of stream length;
  * the aggregation is partial (map-side) before the window-key shuffle.
  */
object StreamingAnalytics {

  /** The events schema as stored (ts read as epoch-nanos long — see
    * SparkEntry scaladoc on TIMESTAMP(NANOS)).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the events directory as a stream. */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(eventsSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toString))
    r.parquet(dir)
  }

  /** Tumbling event-time windows with a watermark: per (hour, event_type)
    * counts and exact value cents. Works on both streaming and batch
    * DataFrames (same plan, incrementalized by the streaming runner).
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val withTime = events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
    val timed =
      if (withTime.isStreaming) withTime.withWatermark("event_time", watermark)
      else withTime
    timed
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("value_c"))
  }
}
