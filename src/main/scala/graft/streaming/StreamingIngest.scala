package graft.streaming

import graft.functions.IngestFunctions._
import graft.ingest.IngestPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Event-driven ingest: the reference's storage-trigger model (ST1) as a
  * Structured Streaming file source + `foreachBatch` over the shared batch
  * core.
  *
  * The file source's checkpointed seen-files log gives source-level
  * exactly-once discovery (each new file enters exactly one micro-batch);
  * the explicit ledger anti-join on top reproduces the reference's
  * *observable* idempotency state (README.md:98-104) and also covers
  * replays after checkpoint loss. `Trigger.AvailableNow` = "process what's
  * there, then stop" for drain-style runs; the default processing-time
  * trigger for long-lived tailing.
  *
  * Scale: discovery is a directory listing per micro-batch (maxFilesPerTrigger
  * bounds batch size); per-file work fans out across executors; state
  * (ledger) stays O(uploads). (reference: csv-processor-function/
  * main.py:21-31 for the event entry point; SURVEY.md §2.6.)
  */
class StreamingIngest(spark: SparkSession, pipeline: IngestPipeline) {

  /** Streamed equivalent of IngestPipeline.discover: text wholetext source
    * with the `_metadata` hidden column for size/mtime — same five event
    * columns, so the batch core is reused verbatim inside foreachBatch.
    */
  def discoverStream(inbox: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.format("text")
      .option("wholetext", "true")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    reader.load(inbox)
      .select(
        col("_metadata.file_path").as("path"),
        regexp_extract(col("_metadata.file_path"), "^(.*)/([^/]+)$", 1).as("bucket_name"),
        col("_metadata.file_name").as("file_name"),
        col("_metadata.file_size").as("file_size"),
        pyIsoformatUtc(col("_metadata.file_modification_time")).as("created_iso"),
        // Streaming batches already paid the read (wholetext source), so
        // content rides along and processEvents skips its targeted fetch.
        col("value").as("content"))
  }

  /** Drain everything currently in `inbox` through the pipeline, then stop.
    * Returns after the query terminates.
    */
  def runAvailableNow(inbox: String, checkpointDir: String): Unit = {
    val q = start(inbox, checkpointDir, Trigger.AvailableNow)
    q.awaitTermination()
  }

  def start(inbox: String, checkpointDir: String, trigger: Trigger): StreamingQuery =
    discoverStream(inbox)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        pipeline.processEvents(batch)
        ()
      }
      .start()
}
