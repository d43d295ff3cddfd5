package graft.ledger

import graft.model.Ledger
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.util.UUID

/** Parquet-backed uploads ledger with MERGE (upsert) semantics.
  *
  * The reference's ledger is a Firestore collection written with
  * `set(..., merge=True)` and partial `update()` calls (reference:
  * csv-processor-function/main.py:61-68,110-113,133-137,148-152). No
  * MERGE-capable table format ships in this environment, so the classic
  * pointer-file pattern is used instead (SURVEY.md §7.3):
  *
  *   dir/_current            ← tiny text file naming the live version dir
  *   dir/v-<uuid>/ (parquet) ← immutable snapshot versions
  *
  * A merge reads the live snapshot, full-outer-joins the updates on
  * `upload_id`, per-column `coalesce(new, old)` (exactly Firestore
  * merge=True field semantics), writes a NEW snapshot dir, then atomically
  * swaps the pointer. Readers never observe a partial write; the swap is a
  * single-file rename. Crash before the swap leaves the old version live.
  *
  * Scale notes (100 TB design): the ledger is bounded by *upload count*,
  * not data volume — millions of rows at most, a few hundred MB of parquet.
  * The merge is one shuffle on a small table; callers broadcast the `done`
  * key set against the (huge) event stream, never the reverse. Single
  * writer (the streaming driver) matches the reference's effective
  * serialization through Firestore and makes the swap safe without locks.
  */
class LedgerStore(spark: SparkSession, dir: String) {
  import Ledger.{key, schema, valueColumns}

  private val rootPath = new Path(dir)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val pointer = new Path(rootPath, "_current")

  private def currentVersion(): Option[String] = {
    if (!fs.exists(pointer)) None
    else {
      val in = fs.open(pointer)
      try {
        val bytes = new Array[Byte](256)
        val n = in.read(bytes)
        Some(new String(bytes, 0, math.max(n, 0), StandardCharsets.UTF_8).trim)
          .filter(_.nonEmpty)
      } finally in.close()
    }
  }

  /** Live ledger snapshot; empty (schema'd) DataFrame if none exists yet. */
  def read(): DataFrame = currentVersion() match {
    case Some(v) => spark.read.schema(schema).parquet(new Path(rootPath, v).toString)
    case None    => spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Typed view of the ledger (compile-time field safety for callers). */
  def readTyped(): org.apache.spark.sql.Dataset[graft.model.UploadRecord] = {
    import spark.implicits._
    read().as[graft.model.UploadRecord]
  }

  /** MERGE: upsert `updates` into the ledger keyed on `upload_id`.
    *
    * Field semantics = Firestore `set(merge=True)`: a non-null update field
    * overwrites, a null/absent update field preserves the existing value
    * (main.py:68). Missing columns in `updates` are treated as all-null.
    * Updates must be unique per `upload_id` (callers reduce per-batch first;
    * the reference serializes per-document through Firestore the same way).
    *
    * `requireExisting=true` gives Firestore `update()` semantics (A2–A4):
    * rows whose key is absent from the ledger are dropped — the reference
    * throws for them and leaves no trace (SURVEY.md §2.7.5).
    */
  def merge(updates: DataFrame, requireExisting: Boolean = false): Unit = {
    val aligned = {
      val cols = schema.fields.map { f =>
        if (updates.columns.contains(f.name)) col(f.name).cast(f.dataType)
        else lit(null).cast(f.dataType).as(f.name)
      }
      updates.select(cols.toIndexedSeq: _*)
    }
    // Status-domain check on the UPDATES, before the join: an invalid
    // incoming status must be rejected loudly and can never remove or
    // corrupt an existing ledger row. (Filtering the merged result instead
    // silently deleted the pre-existing row — ADVICE round 1.)
    val badStatus = aligned
      .filter(col("status").isNotNull && !col("status").isin(UploadStatusValues: _*))
      .select("status").limit(1).collect()
    if (badStatus.nonEmpty)
      throw new IllegalArgumentException(
        s"ledger merge rejected: invalid status '${badStatus.head.getString(0)}' " +
          s"(domain: ${UploadStatusValues.mkString("|")})")
    val old = read()
    val joinType = if (requireExisting) "right_outer" else "full_outer"
    val n = aligned.as("n")
    val o = old.as("o")
    val merged = n
      .join(o, n(key) === o(key), joinType)
      .select(
        coalesce(n(key), o(key)).as(key) +:
          valueColumns.map(c => coalesce(n(c), o(c)).as(c)): _*
      )
    val rows = merged
      .persist()
      .count() // materialize BEFORE touching the old snapshot
    writeSnapshot(merged, rows)
    merged.unpersist()
  }

  private val UploadStatusValues = graft.model.UploadStatus.All.toSeq

  /** Overwrite the ledger wholesale (tests / bootstrap). */
  def overwrite(rows: DataFrame): Unit = {
    val aligned = rows.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    writeSnapshot(aligned, aligned.count())
  }

  /** Rows per snapshot file: below this, one file keeps point lookups a
    * single-footer read; above it, shard so no single writer task owns the
    * whole (multi-GB) ledger — a million ~200-byte rows per file keeps
    * files in the low hundreds of MB.
    */
  private val rowsPerSnapshotFile = 1000000L

  private def writeSnapshot(df: DataFrame, rows: Long): Unit = {
    val version = s"v-${UUID.randomUUID().toString.take(12)}"
    val target = new Path(rootPath, version)
    val parts = math.max(1L, (rows + rowsPerSnapshotFile - 1) / rowsPerSnapshotFile).toInt
    df.coalesce(parts).write.mode("overwrite").parquet(target.toString)
    val prev = currentVersion()
    val tmp = new Path(rootPath, s"_current.tmp-${UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // Crash-atomic pointer swap: a single rename-with-overwrite (atomic on
    // HDFS and local FS via FileContext) — never delete-then-rename, which
    // had a window where `_current` was absent and a crash lost the whole
    // ledger's visibility (ADVICE round 1).
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(pointer),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // Retain current + previous + two older generations: a lazy DataFrame
    // from an earlier read() (e.g. a StatusQueries result acted on after a
    // merge) can still resolve its files even across a full ingest pass,
    // which performs THREE merges (pending + processing + terminal).
    // Current and previous are protected unconditionally; among the rest
    // only the two newest stay.
    val protect = Set(version) ++ prev
    fs.listStatus(rootPath)
      .filter(st => st.getPath.getName.startsWith("v-") &&
        !protect.contains(st.getPath.getName))
      .sortBy(-_.getModificationTime)
      .drop(2)
      .foreach(st => fs.delete(st.getPath, true))
  }
}
