package graft.operators

import graft.functions.IngestFunctions.envelopeJson
import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Externalized envelope handoff — the reference's Pub/Sub topic
  * (SURVEY.md §2.1 S4/S5) as a directory of JSON-lines files.
  *
  * The in-pipeline handoff stays intra-query (no bus needed inside one
  * Spark job); this bus is for when detect and process run as SEPARATE
  * jobs/clusters, exactly the reference's two-function split
  * (main.py:21-86 publishes, main.py:89-103 decodes). Messages are
  * append-only text files of `{"upload_id":…,"bucket_name":…,"file_name":…}`
  * — at-least-once by construction; the ledger's idempotent merge on the
  * consumer side upgrades the end-to-end effect to exactly-once (ST4), the
  * same contract Pub/Sub + Firestore gave the reference.
  *
  * Scale: a "publish" is a parallel text write (one file per task); a
  * subscriber is the streaming text source with its checkpointed seen-files
  * log. No driver bottleneck in either direction.
  */
class EnvelopeBus(spark: SparkSession, dir: String) {

  val envelopeSchema = Encoders.product[Envelope].schema

  /** S4 — publish: serialize `(upload_id, bucket_name, file_name)` rows.
    * `envelopeJson` escapes quotes/backslashes like the reference's
    * json.dumps (main.py:74-80).
    */
  def publish(envelopes: DataFrame): Unit =
    envelopes
      .select(envelopeJson(col("upload_id"), col("bucket_name"),
        col("file_name")).as("value"))
      .write.mode("append").text(dir)

  /** S5 — subscribe, batch: decode every message currently on the bus.
    * Malformed payloads decode to null fields (Spark's PERMISSIVE mode) —
    * route them to a DLQ rather than failing the stream, mirroring the
    * reference's retry-then-dead-letter posture.
    */
  def readAll(): DataFrame = decode(spark.read.text(dir))

  /** S5 — subscribe, streaming: tail the bus incrementally. */
  def readStreaming(maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toString))
    decode(r.text(dir))
  }

  private def decode(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), envelopeSchema).as("e")).select("e.*")
}
