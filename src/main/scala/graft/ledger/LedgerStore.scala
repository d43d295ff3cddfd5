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
  * publishes it. Readers never observe a partial write. Crash before the
  * publish leaves the old version live.
  *
  * Writer safety is COMPARE-AND-SWAP, not convention: the live version is
  * named by the highest-numbered `_ptr-<seq>` file, and a merge that read
  * seq S may only publish seq S+1 — via rename-WITHOUT-overwrite
  * (atomic-exclusive on HDFS; check-then-rename on the local FS), followed
  * by a post-publish verification that the pointer still carries this
  * writer's version AND is still the maximum sequence. Two concurrent
  * merges both read S; the first to publish S+1 wins, the other gets
  * [[ConcurrentLedgerWriteException]] and its orphan snapshot is removed —
  * a lost update becomes a loud retry instead of a silent clobber. (The
  * reference got this serialization for free from Firestore,
  * main.py:53-68.)
  *
  * Scale notes (100 TB design): the ledger is bounded by *upload count*,
  * not data volume — millions of rows at most, a few hundred MB of parquet.
  * The merge is one shuffle on a small table; callers broadcast the `done`
  * key set against the (huge) event stream, never the reverse.
  */
class LedgerStore(spark: SparkSession, dir: String) {
  import Ledger.{key, schema, valueColumns}

  private val rootPath = new Path(dir)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ptrPath(seq: Long) = new Path(rootPath, f"_ptr-$seq%012d")

  private def readPtrFile(p: Path): Option[String] = {
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](256)
      val n = in.read(bytes)
      Some(new String(bytes, 0, math.max(n, 0), StandardCharsets.UTF_8).trim)
        .filter(_.nonEmpty)
    } finally in.close()
  }

  /** Highest committed (seq, snapshot version dir name), if any. Only the
    * MAX-seq pointer is opened (older ones may be swept concurrently —
    * opening them both raced with the sweep and cost one file-open per
    * historical pointer); if the sweep deletes the max between listing and
    * open, the listing is retried.
    */
  private[ledger] def currentPointer(): Option[(Long, String)] = {
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      if (!fs.exists(rootPath)) return None
      val top = fs.listStatus(rootPath).toSeq
        .map(_.getPath)
        .filter(_.getName.startsWith("_ptr-"))
        .flatMap(p => p.getName.stripPrefix("_ptr-").toLongOption.map(_ -> p))
        .sortBy(-_._1)
        .headOption
      top match {
        case None =>
          // migration: a pre-CAS ledger has a single `_current` pointer —
          // read it as sequence 0 rather than silently starting empty
          val legacy = new Path(rootPath, "_current")
          return (try {
            if (fs.exists(legacy)) readPtrFile(legacy).map(0L -> _) else None
          } catch { case _: java.io.FileNotFoundException => None })
        case Some((seq, p)) =>
          try return readPtrFile(p).map(seq -> _)
          catch { case _: java.io.FileNotFoundException => () /* retry */ }
      }
    }
    throw new java.io.IOException(
      s"ledger pointer listing unstable after $attempts attempts under $rootPath")
  }

  private def currentVersion(): Option[String] = currentPointer().map(_._2)

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
    // Pin the pointer ONCE: the snapshot this merge reads is the state the
    // CAS commit below requires to still be live at publish time.
    val pinned = currentPointer()
    val old = pinned match {
      case Some((_, v)) =>
        spark.read.schema(schema).parquet(new Path(rootPath, v).toString)
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
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
    try commitSnapshot(merged, rows, pinned)
    finally merged.unpersist() // also on a lost CAS race (the retry path)
  }

  private val UploadStatusValues = graft.model.UploadStatus.All.toSeq

  /** Overwrite the ledger wholesale (tests / bootstrap). Subject to the
    * same CAS commit as merge: a concurrent writer makes this fail loudly.
    */
  def overwrite(rows: DataFrame): Unit = {
    val aligned = rows.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    commitSnapshot(aligned, aligned.count(), currentPointer())
  }

  /** Rows per snapshot file: below this, one file keeps point lookups a
    * single-footer read; above it, shard so no single writer task owns the
    * whole (multi-GB) ledger — a million ~200-byte rows per file keeps
    * files in the low hundreds of MB.
    */
  private val rowsPerSnapshotFile = 1000000L

  /** Write `df` as a new snapshot dir, then CAS-publish it: the pointer
    * file for `expected.seq + 1` is created via rename-WITHOUT-overwrite
    * (atomic-exclusive), so the publish succeeds only if no other writer
    * committed after `expected` was read. On a lost race the orphan
    * snapshot is deleted and [[ConcurrentLedgerWriteException]] thrown —
    * the caller's merge was computed against a stale base and must be
    * retried against the winner's state.
    */
  private[ledger] def commitSnapshot(df: DataFrame, rows: Long,
      expected: Option[(Long, String)]): Unit = {
    val version = s"v-${UUID.randomUUID().toString.take(12)}"
    val target = new Path(rootPath, version)
    val parts = math.max(1L, (rows + rowsPerSnapshotFile - 1) / rowsPerSnapshotFile).toInt
    df.coalesce(parts).write.mode("overwrite").parquet(target.toString)
    val nextSeq = expected.map(_._1 + 1).getOrElse(1L)
    val tmp = new Path(rootPath, s"_tmp-${UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // Readers only ever see a COMPLETE pointer file (content is renamed
    // into place, never written in place); Rename without OVERWRITE is the
    // compare-and-swap — it fails iff another writer already published
    // this sequence number.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, spark.sparkContext.hadoopConfiguration)
    try {
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(ptrPath(nextSeq)))
    } catch {
      case e: java.io.IOException =>
        // The local ChecksumFileSystem renames the data file BEFORE its
        // .crc sidecar — a stale sidecar (crash debris) can make the crc
        // rename throw after the pointer itself already landed. If the
        // pointer now exists WITH OUR content, the publish succeeded;
        // otherwise distinguish a lost CAS (someone else's content / this
        // seq taken) from a genuine IO failure.
        val ourPublishLanded =
          try readPtrFile(ptrPath(nextSeq)).contains(version)
          catch { case _: Throwable => false }
        if (!ourPublishLanded) {
          val lostRace = try fs.exists(ptrPath(nextSeq)) catch { case _: Throwable => false }
          fs.delete(tmp, false)
          if (!lostRace) throw e
          fs.delete(target, true)
          throw new ConcurrentLedgerWriteException(
            s"ledger CAS failed: another writer published seq $nextSeq under " +
              s"$rootPath while this merge was computing against seq " +
              s"${expected.map(_._1).getOrElse(0L)}; retry against the new state", e)
        }
        fs.delete(tmp, false) // leftover data/crc of the tmp name
    }
    // Post-publish verification, closing two non-HDFS holes: (a) the local
    // FS implements no-overwrite rename as check-then-rename, so a same-seq
    // racer can silently replace this pointer — detected here by re-reading
    // it; (b) the retention sweep may have REOPENED this sequence slot
    // (deleted its old pointer) while this merge was stalled for longer
    // than the grace window, in which case a HIGHER seq is already live and
    // this publish, though it "succeeded", is stale — detected by checking
    // nothing newer exists. Either way: loud retry, never a silent clobber.
    val (ownIsOurs, isMax) =
      try {
        val own = try readPtrFile(ptrPath(nextSeq)) catch {
          case _: java.io.FileNotFoundException => None
        }
        (own.contains(version), currentPointer().exists(_._1 == nextSeq))
      } catch { case _: java.io.IOException => (true, true) /* can't tell; keep */ }
    if (!ownIsOurs) {
      // a same-seq racer replaced our pointer: their state is live, our
      // snapshot is an unreferenced orphan
      fs.delete(target, true)
      throw new ConcurrentLedgerWriteException(
        s"ledger CAS failed post-publish: seq $nextSeq under $rootPath was " +
          s"replaced by a concurrent writer; retry against the new state", null)
    }
    if (!isMax) {
      // our publish landed in a REOPENED slot (we stalled past the sweep's
      // grace window and newer seqs exist): ours, but stale — withdraw it
      fs.delete(ptrPath(nextSeq), false)
      fs.delete(target, true)
      throw new ConcurrentLedgerWriteException(
        s"ledger CAS failed post-publish: seq $nextSeq under $rootPath is " +
          s"older than the live sequence; this merge was computed against a " +
          s"superseded base — retry against the new state", null)
    }
    // Retain current + previous + two older generations: a lazy DataFrame
    // from an earlier read() (e.g. a StatusQueries result acted on after a
    // merge) can still resolve its files even across a full ingest pass,
    // which performs THREE merges (pending + processing + terminal).
    // Current and previous are protected unconditionally; among the rest
    // only the two newest stay — and ONLY once old enough that no
    // concurrent writer can still be producing them: a racing merge's
    // in-flight snapshot dir is an unprotected `v-*` too, and deleting it
    // mid-write was exactly the clobber the CAS exists to prevent.
    // Pointer files follow the same policy.
    val protect = Set(version) ++ expected.map(_._2)
    val cutoff = System.currentTimeMillis() - retentionGraceMs
    fs.listStatus(rootPath)
      .filter(st => st.getPath.getName.startsWith("v-") &&
        !protect.contains(st.getPath.getName) &&
        st.getModificationTime < cutoff)
      .sortBy(-_.getModificationTime)
      .drop(2)
      .foreach(st => fs.delete(st.getPath, true))
    fs.listStatus(rootPath)
      .filter(st => st.getPath.getName.startsWith("_ptr-") &&
        st.getModificationTime < cutoff)
      .sortBy(_.getPath.getName)
      .dropRight(4)
      .foreach(st => fs.delete(st.getPath, false))
  }

  /** Unprotected generations younger than this are never swept: they may
    * belong to a writer that is still publishing (or to a reader that just
    * resolved them). Bounds stale-snapshot accumulation to the merge rate
    * over this window — single-digit dirs for any sane cadence.
    */
  private val retentionGraceMs = 10L * 60 * 1000
}

/** A ledger merge lost the compare-and-swap publish race: another writer
  * committed first and the merge was computed against a stale snapshot.
  * The ledger state is the WINNER's; the loser's snapshot was discarded.
  * Callers retry by re-running the merge (it re-reads the live state).
  */
class ConcurrentLedgerWriteException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)
