package graft.model

import org.apache.spark.sql.types._

/** Status domain of the uploads ledger.
  *
  * Mirrors the reference's implicit enum (reference: csv-processor-function/
  * main.py:66,111,134,149 — `pending|processing|done|failed`); the reference
  * enforces it by convention only, we enforce it at merge time.
  */
object UploadStatus {
  val Pending    = "pending"
  val Processing = "processing"
  val Done       = "done"
  val Failed     = "failed"
  val All: Set[String] = Set(Pending, Processing, Done, Failed)
}

/** One row of the uploads ledger.
  *
  * Schema per reference ARCHITECTURE.md:86-101 (Firestore collection
  * `uploads`), plus the engine-added `attempts` column that replaces the
  * Pub/Sub delivery-attempt counter (max 5 before DLQ, ARCHITECTURE.md:75).
  * Nullable fields are Options: a Firestore document accretes fields over its
  * lifecycle (main.py:61-68 merge=True, then partial update() calls), so e.g.
  * a `failed` row has `failed_at`/`error_message` but no
  * `processing_completed_at`.
  */
case class UploadRecord(
    upload_id: String,
    bucket_name: Option[String],
    file_name: Option[String],
    file_size: Option[Long],
    status: Option[String],
    queued_at: Option[java.sql.Timestamp],
    processing_started_at: Option[java.sql.Timestamp],
    processing_completed_at: Option[java.sql.Timestamp],
    failed_at: Option[java.sql.Timestamp],
    error_message: Option[String],
    lines_processed: Option[Long],
    attempts: Option[Int]
)

/** The inter-stage handoff row — the reference's Pub/Sub JSON envelope
  * `{upload_id, bucket_name, file_name}` (main.py:74-80).
  */
case class Envelope(upload_id: String, bucket_name: String, file_name: String)

object Ledger {
  /** Typed ledger schema (SURVEY.md §1.4). Order matters: merge preserves it. */
  val schema: StructType = StructType(Seq(
    StructField("upload_id", StringType, nullable = false),
    StructField("bucket_name", StringType),
    StructField("file_name", StringType),
    StructField("file_size", LongType),
    StructField("status", StringType),
    StructField("queued_at", TimestampType),
    StructField("processing_started_at", TimestampType),
    StructField("processing_completed_at", TimestampType),
    StructField("failed_at", TimestampType),
    StructField("error_message", StringType),
    StructField("lines_processed", LongType),
    StructField("attempts", IntegerType)
  ))

  val key = "upload_id"
  val valueColumns: Seq[String] = schema.fieldNames.filterNot(_ == key).toSeq
}
