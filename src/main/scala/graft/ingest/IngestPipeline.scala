package graft.ingest

import graft.functions.IngestFunctions._
import graft.ledger.LedgerStore
import graft.model.{Ledger, UploadStatus}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Outcome counts of one ingest pass (observability only). */
case class IngestResult(discovered: Long, skipped: Long, done: Long,
    failed: Long, quarantined: Long)

/** The reference pipeline, re-expressed as one declarative dataflow.
  *
  * Reference shape (SURVEY.md §3): GCS `object.finalized` event → extension
  * filter → metadata hash → Firestore idempotency probe → mark pending →
  * Pub/Sub → download → split('\n') count → validate → mark done|failed →
  * retry ≤5 → DLQ.
  *
  * Spark shape: file listing (with metadata) → `filter` → `withColumn
  * (upload_id)` → broadcast LEFT ANTI join vs the ledger's done/quarantined
  * keys → per-file line count + validation → one ledger MERGE per pass →
  * failures carry an `attempts` counter; `attempts >= maxAttempts` rows go
  * to a quarantine parquet table (the DLQ) and stop being retried.
  *
  * Semantics preserved from the reference (SURVEY.md §2.6-2.7):
  *  - idempotency is keyed on metadata identity, not content (main.py:15-18);
  *  - only `done` blocks reprocessing — pending/processing/failed retry
  *    (main.py:56);
  *  - non-CSV files leave no ledger trace (main.py:34-36);
  *  - `"\n"` alone passes validation, `lines_processed` counts the
  *    split-fencepost extra element (main.py:121-127);
  *  - at-least-once × idempotent merge ⇒ exactly-once effect (ST4).
  *
  * Scale: the event/file side is arbitrarily large and never collected; the
  * ledger side is small and broadcast. Per-file work (count/validate) is
  * embarrassingly parallel across executors; the merge is a shuffle on the
  * small ledger only.
  */
class IngestPipeline(
    spark: SparkSession,
    store: LedgerStore,
    quarantineDir: String,
    maxAttempts: Int = 5,
    now: () => Column = () => current_timestamp()) {

  import spark.implicits._

  /** Discover files in `inbox` as an events DataFrame with the columns the
    * reference's CloudEvent + metadata fetch provide (S1+S2):
    * bucket_name, file_name, file_size, created_iso, content.
    *
    * `binaryFile` supplies path/length/modificationTime/content in one scan;
    * zero-byte files still list (content = empty), matching a GCS zero-byte
    * object. At 100 TB the per-file unit matches the reference's model —
    * the real columnar path for row-level processing is `spark.read.csv`
    * (CsvWarehouse), not whole-file strings.
    */
  def discover(inbox: String): DataFrame =
    spark.read.format("binaryFile").load(inbox)
      .select(
        regexp_extract(col("path"), "^(.*)/([^/]+)$", 1).as("bucket_name"),
        regexp_extract(col("path"), "^(.*)/([^/]+)$", 2).as("file_name"),
        col("length").as("file_size"),
        pyIsoformatUtc(col("modificationTime")).as("created_iso"),
        decode(col("content"), "UTF-8").as("content"))

  /** One batch pass: the whole reference pipeline over whatever is in
    * `inbox`, with exactly one ledger MERGE. Returns outcome counts.
    */
  def runOnce(inbox: String): IngestResult =
    processEvents(discover(inbox))

  /** Core stage shared by batch and streaming (`foreachBatch`) drivers. */
  def processEvents(events: DataFrame): IngestResult = {
    val ts = now()

    // F1 — extension filter, pre-ledger (non-CSV leaves no trace).
    val csvEvents = events
      .filter(isCsvPath(col("file_name")))
      // F2 — metadata-hash identity.
      .withColumn("upload_id",
        uploadId(col("bucket_name"), col("file_name"), col("file_size"),
          col("created_iso")))

    val ledger = store.read().persist()
    // D1 — idempotency: skip `done`; additionally skip quarantined rows
    // (attempts exhausted — the reference's DLQ'd messages also never
    // re-enter processing, ARCHITECTURE.md:69-79).
    val blockedKeys = ledger
      .filter(col("status") === UploadStatus.Done ||
        (col("status") === UploadStatus.Failed && col("attempts") >= maxAttempts))
      .select("upload_id")
    val priorAttempts = ledger.select(col("upload_id"),
      coalesce(col("attempts"), lit(0)).as("prior_attempts"))

    val todo = csvEvents
      .join(broadcast(blockedKeys), Seq("upload_id"), "left_anti")
      // Within-batch dedup: two events for the same object in one batch
      // collapse to one (the reference's TOCTOU race, fixed — ST5).
      .dropDuplicates("upload_id")
      .join(broadcast(priorAttempts), Seq("upload_id"), "left")
      .na.fill(0, Seq("prior_attempts"))
      .persist()

    // A-L1 + F5 — count lines (split-fencepost) and validate.
    val judged = todo
      .withColumn("n_lines", pySplitLineCount(coalesce(col("content"), lit(""))))
      .withColumn("ok", isValidCsv(col("n_lines")))

    // A1..A4 collapsed: each upload's terminal row for this pass. The
    // intermediate pending/processing hops are represented by their
    // timestamps, exactly the fields the reference writes (main.py:61-152).
    val updates = judged.select(
      col("upload_id"), col("bucket_name"), col("file_name"), col("file_size"),
      when(col("ok"), UploadStatus.Done).otherwise(UploadStatus.Failed).as("status"),
      ts.as("queued_at"),
      ts.as("processing_started_at"),
      when(col("ok"), ts).as("processing_completed_at"),
      when(!col("ok"), ts).as("failed_at"),
      when(!col("ok"), ValidationError).as("error_message"),
      when(col("ok"), col("n_lines").cast("long")).as("lines_processed"),
      when(!col("ok"), col("prior_attempts") + 1)
        .otherwise(lit(null)).cast("int").as("attempts"))
      .persist()

    val discovered = events.count()
    val doneN = updates.filter(col("status") === UploadStatus.Done).count()
    val failedN = updates.filter(col("status") === UploadStatus.Failed).count()

    // S7 — quarantine (DLQ): failures that just exhausted their attempts.
    val quarantined = updates
      .filter(col("status") === UploadStatus.Failed && col("attempts") >= maxAttempts)
    val quarantinedN = quarantined.count()
    if (quarantinedN > 0)
      quarantined.withColumn("quarantined_at", ts)
        .write.mode("append").parquet(quarantineDir)

    // S6 — the single idempotent MERGE.
    store.merge(updates)

    updates.unpersist(); todo.unpersist(); ledger.unpersist()
    IngestResult(discovered, discovered - doneN - failedN, doneN, failedN,
      quarantinedN)
  }

  /** The reference's "actual CSV processing" extension point (main.py:129-130):
    * parse a done upload's rows columnar-ly. Schema-per-upload stays dynamic,
    * matching the reference's schema-agnostic treatment.
    */
  def readCsv(path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "false").csv(path)
}
