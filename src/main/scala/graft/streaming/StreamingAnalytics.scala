package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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

  /** Per-user running state for the stateful-streaming surface
    * (`flatMapGroupsWithState`): event count, exact value cents, last-seen
    * micros. Kept deliberately small — state size is what kills stateful
    * streaming at scale, so the state object is three longs.
    */
  case class UserState(n: Long, value_c: Long, last_us: Long)
  case class UserUpdate(user_id: Long, n: Long, value_c: Long, last_us: Long)

  /** Arbitrary-state streaming: per-user running totals via
    * `flatMapGroupsWithState` (the ledger-free state path the reference
    * never had — SURVEY §2.6 note on mapGroupsWithState). Emits one update
    * per user per micro-batch. Works identically on a batch Dataset for
    * testing (Spark plans batch flatMapGroupsWithState as a plain group).
    */
  def runningUserTotals(events: DataFrame): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    val typed = events.select(
      col("user_id"), expr("ts DIV 1000").as("ts_us"),
      round(col("value") * 100).cast("long").as("value_c"))
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[UserState]) => {
          val prev = state.getOption.getOrElse(UserState(0L, 0L, Long.MinValue))
          var n = prev.n; var v = prev.value_c; var last = prev.last_us
          rows.foreach { case (_, ts, c) =>
            n += 1; v += c; if (ts > last) last = ts
          }
          state.update(UserState(n, v, last))
          Iterator.single(UserUpdate(user, n, v, last))
        })
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
