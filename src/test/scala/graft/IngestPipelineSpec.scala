package graft

import graft.api.StatusQueries
import graft.ingest.IngestPipeline
import graft.ledger.LedgerStore
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** End-to-end pipeline semantics over reference-shaped fixtures — the
  * SURVEY.md §7.4 minimum slice, automated (round 1 only had a manual demo).
  *
  * Fixture shapes mirror the reference corpus semantics (SURVEY.md §2.7):
  *  - a header + 5 rows + trailing newline  → done, lines_processed = 7
  *    (the split('\n') fencepost);
  *  - a header with no trailing newline     → failed ("empty or has only
  *    headers": 1 split element);
  *  - a single "\n"                         → done, lines_processed = 2
  *    (the §2.7.2 quirk: the "bad" empty file actually passes);
  *  - a .txt file                           → no ledger trace at all.
  */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: String, name: String, content: String): Unit =
    Files.write(Paths.get(dir, name), content.getBytes("UTF-8"))

  private def fixtures(dir: String): Unit = {
    writeFile(dir, "good.csv",
      "id,name,qty\n1,ant,2\n2,bee,3\n3,cow,4\n4,doe,5\n5,elk,6\n")
    writeFile(dir, "bad-only-header.csv", "id,name,qty")
    writeFile(dir, "bad-empty.csv", "\n")
    writeFile(dir, "notes.txt", "not a csv\n")
  }

  private def harness(maxAttempts: Int = 5) = {
    val inbox = tmpDir("inbox")
    fixtures(inbox)
    val store = new LedgerStore(spark, tmpDir("ledger"))
    val qDir = tmpDir("quarantine")
    val pipe = new IngestPipeline(spark, store, qDir, maxAttempts)
    (inbox, store, qDir, pipe)
  }

  test("§7.4 golden slice: one pass over the fixture inbox") {
    val (inbox, store, _, pipe) = harness()
    val r = pipe.runOnce(inbox)
    assert(r.discovered == 4 && r.done == 2 && r.failed == 1 && r.quarantined == 0)

    val ledger = store.read()
    assert(ledger.count() == 3) // notes.txt left no trace

    val good = ledger.filter($"file_name" === "good.csv").collect().head
    assert(good.getAs[String]("status") == "done")
    assert(good.getAs[Long]("lines_processed") == 7L) // fencepost
    assert(good.getAs[java.sql.Timestamp]("queued_at") != null)
    assert(good.getAs[java.sql.Timestamp]("processing_started_at") != null)
    assert(good.getAs[java.sql.Timestamp]("processing_completed_at") != null)
    assert(good.getAs[String]("error_message") == null)

    val empty = ledger.filter($"file_name" === "bad-empty.csv").collect().head
    assert(empty.getAs[String]("status") == "done")
    assert(empty.getAs[Long]("lines_processed") == 2L) // the §2.7.2 quirk

    val bad = ledger.filter($"file_name" === "bad-only-header.csv").collect().head
    assert(bad.getAs[String]("status") == "failed")
    assert(bad.getAs[String]("error_message") == "CSV file is empty or has only headers")
    assert(bad.getAs[Int]("attempts") == 1)
    assert(bad.getAs[java.sql.Timestamp]("failed_at") != null)
    assert(bad.isNullAt(bad.fieldIndex("lines_processed")))

    // the reference read API over the same ledger (S8/L1/L2/D2)
    val api = new StatusQueries(store)
    assert(api.listUploads(Some("done")).count() == 2)
    assert(api.listUploads(Some("failed"), limit = 1).count() == 1)
    val gid = good.getAs[String]("upload_id")
    assert(api.getUploadStatus(gid).count() == 1)
  }

  test("idempotent re-run: done uploads never reprocess, failed retry") {
    val (inbox, store, _, pipe) = harness()
    pipe.runOnce(inbox)
    val doneBefore = store.read().filter($"status" === "done")
      .orderBy("upload_id").collect()

    val r2 = pipe.runOnce(inbox)
    assert(r2.done == 0 && r2.failed == 1) // only the failed row re-enters

    val doneAfter = store.read().filter($"status" === "done")
      .orderBy("upload_id").collect()
    assert(doneBefore.toSeq == doneAfter.toSeq) // byte-identical done rows

    val bad = store.read().filter($"status" === "failed").collect().head
    assert(bad.getAs[Int]("attempts") == 2) // retry counted
  }

  test("DLQ: attempts exhaust into quarantine, then stop retrying") {
    val (inbox, store, qDir, pipe) = harness(maxAttempts = 2)
    pipe.runOnce(inbox) // attempts=1
    val r2 = pipe.runOnce(inbox) // attempts=2 → quarantined
    assert(r2.quarantined == 1)

    val dlq = spark.read.parquet(qDir)
    assert(dlq.count() == 1)
    assert(dlq.collect().head.getAs[String]("file_name") == "bad-only-header.csv")

    val r3 = pipe.runOnce(inbox) // exhausted row must be skipped now
    assert(r3.failed == 0 && r3.quarantined == 0) // nothing NEWLY quarantined
    assert(spark.read.parquet(qDir).count() == 1) // and nothing re-appended
    val bad = store.read().filter($"status" === "failed").collect().head
    assert(bad.getAs[Int]("attempts") == 2) // unchanged
  }

  test("unknown-ID terminal update leaves no ledger trace (must-exist)") {
    val (_, store, _, _) = harness()
    store.merge(
      Seq(("feedfacedeadbeef", "done")).toDF("upload_id", "status"),
      requireExisting = true)
    assert(store.read().filter($"upload_id" === "feedfacedeadbeef").isEmpty)
  }

  test("invalid status update is rejected and cannot delete existing rows") {
    val (inbox, store, _, pipe) = harness()
    pipe.runOnce(inbox)
    val before = store.read().count()
    val ex = intercept[IllegalArgumentException] {
      store.merge(Seq(("feedfacedeadbeef", "bogus")).toDF("upload_id", "status"))
    }
    assert(ex.getMessage.contains("bogus"))
    assert(store.read().count() == before) // nothing lost, nothing added
  }

  test("a crash between the pending merge and processing recovers on rerun") {
    // stage-1-only crash: the detect stage marked uploads `pending` and
    // died before any processing — the reference's equivalent is a
    // published Pub/Sub message whose process function never ran. Leftover
    // pending rows must not block, duplicate, or corrupt the next pass
    // (only `done` blocks reprocessing — SURVEY §2.7.4).
    val (inbox, store, _, pipe) = harness()
    val pending = pipe.discover(inbox)
      .filter(graft.functions.IngestFunctions.isCsvPath($"file_name"))
      .select(
        graft.functions.IngestFunctions.uploadId(
          $"bucket_name", $"file_name", $"file_size", $"created_iso")
          .as("upload_id"),
        $"bucket_name", $"file_name", $"file_size",
        lit("pending").as("status"), current_timestamp().as("queued_at"))
    store.merge(pending)
    assert(store.read().filter($"status" === "pending").count() == 3)

    val r = pipe.runOnce(inbox) // the recovery pass
    assert(r.done == 2 && r.failed == 1)
    val ledger = store.read()
    assert(ledger.count() == 3) // no duplicated rows for the same upload
    assert(ledger.filter($"status" === "pending").isEmpty)
    val good = ledger.filter($"file_name" === "good.csv").collect().head
    assert(good.getAs[String]("status") == "done")
    assert(good.getAs[Long]("lines_processed") == 7L)
    assert(good.getAs[java.sql.Timestamp]("queued_at") != null) // preserved
  }

  test("a lazy reader from before a merge survives one generation") {
    val (inbox, store, _, pipe) = harness()
    pipe.runOnce(inbox)
    val before = store.read() // lazy plan pinned to the old snapshot dir
    pipe.runOnce(inbox) // merges → new snapshot generation
    assert(before.count() == 3) // old version dir retained one generation
  }

  test("large files use the splittable text-source count path") {
    val inbox = tmpDir("big-inbox")
    // trailing newline: N newlines -> N+1 split elements
    writeFile(inbox, "big-trail.csv", "h,a\n" + (1 to 500).map(i => s"$i,x\n").mkString)
    // no trailing newline
    writeFile(inbox, "big-plain.csv", "h,a\n" + (1 to 499).map(i => s"$i,x\n").mkString + "500,x")
    val store = new LedgerStore(spark, tmpDir("big-ledger"))
    // threshold of 64 bytes forces both files onto the large-file path
    val pipe = new IngestPipeline(spark, store, tmpDir("big-q"),
      wholeFileMaxBytes = 64L)
    val r = pipe.runOnce(inbox)
    assert(r.done == 2 && r.failed == 0)
    val ledger = store.read()
    val trail = ledger.filter($"file_name" === "big-trail.csv").collect().head
    assert(trail.getAs[Long]("lines_processed") == 502L) // 501 newlines + 1
    val plain = ledger.filter($"file_name" === "big-plain.csv").collect().head
    assert(plain.getAs[Long]("lines_processed") == 501L) // 500 newlines + 1
  }

  test("content-identity mode: identical bytes under a new name are skipped") {
    val inbox = tmpDir("ci-inbox")
    writeFile(inbox, "a.csv", "id,v\n1,2\n")
    val store = new LedgerStore(spark, tmpDir("ci-ledger"))
    val pipe = new IngestPipeline(spark, store, tmpDir("ci-q"),
      contentIdentity = true)
    val r1 = pipe.runOnce(inbox)
    assert(r1.done == 1)
    // same bytes, different object -> same upload_id -> skipped as done
    writeFile(inbox, "b.csv", "id,v\n1,2\n")
    val r2 = pipe.runOnce(inbox)
    assert(r2.done == 0 && r2.skipped == 2)
    assert(store.read().count() == 1)
    // different bytes -> new identity -> processed
    writeFile(inbox, "c.csv", "id,v\n9,9\n")
    val r3 = pipe.runOnce(inbox)
    assert(r3.done == 1)
    assert(store.read().count() == 2)
    // metadata mode on the same inbox would have seen 3 distinct ids
    val store2 = new LedgerStore(spark, tmpDir("ci-ledger2"))
    val meta = new IngestPipeline(spark, store2, tmpDir("ci-q2"))
    meta.runOnce(inbox)
    assert(store2.read().count() == 3)
  }

  test("requeueQuarantined re-admits DLQ'd uploads for retry") {
    val (inbox, store, _, pipe) = harness(maxAttempts = 2)
    pipe.runOnce(inbox); pipe.runOnce(inbox) // exhaust -> quarantined
    assert(pipe.runOnce(inbox).failed == 0)  // skipped while quarantined
    assert(pipe.requeueQuarantined() == 1)
    val bad0 = store.read().filter($"status" === "failed").collect().head
    assert(bad0.getAs[Int]("attempts") == 0)
    val r = pipe.runOnce(inbox) // retried again
    assert(r.failed == 1)
    val bad = store.read().filter($"status" === "failed").collect().head
    assert(bad.getAs[Int]("attempts") == 1)
  }

  test("typed ledger view exposes UploadRecord fields") {
    val (inbox, store, _, pipe) = harness()
    pipe.runOnce(inbox)
    val recs = store.readTyped().collect()
    assert(recs.length == 3)
    assert(recs.filter(_.status.contains("done"))
      .flatMap(_.lines_processed).sorted.toSeq == Seq(2L, 7L))
  }

  test("steady-state pass over an all-done inbox writes nothing") {
    val inbox = tmpDir("ss-inbox")
    writeFile(inbox, "a.csv", "id,v\n1,2\n")
    val ledgerDir = tmpDir("ss-ledger")
    val store = new LedgerStore(spark, ledgerDir)
    val pipe = new IngestPipeline(spark, store, tmpDir("ss-q"))
    pipe.runOnce(inbox)
    def livePointer(): (String, String) = {
      val ptrs = new java.io.File(ledgerDir).listFiles()
        .map(_.getName).filter(_.startsWith("_ptr-")).sorted
      val top = ptrs.last
      (top, java.nio.file.Files.readString(
        java.nio.file.Paths.get(ledgerDir, top)))
    }
    val pointerBefore = livePointer()
    val r = pipe.runOnce(inbox) // everything already done
    assert(r.discovered == 1 && r.done == 0 && r.failed == 0 && r.skipped == 1)
    assert(livePointer() == pointerBefore) // no new ledger generation at all
  }

  test("a file deleted between listing and read fails that upload only") {
    val inbox = tmpDir("del-inbox")
    writeFile(inbox, "keep.csv", "a,b\n1,2\n")
    writeFile(inbox, "gone.csv", "a,b\n3,4\n")
    val store = new LedgerStore(spark, tmpDir("del-ledger"))
    val pipe = new IngestPipeline(spark, store, tmpDir("del-q"))
    val events = pipe.discover(inbox).persist()
    events.count() // snapshot the listing while both files exist
    java.nio.file.Files.delete(Paths.get(inbox, "gone.csv"))
    val r = pipe.processEvents(events) // must not abort the pass
    events.unpersist()
    assert(r.done == 1 && r.failed == 1)
    val gone = store.read().filter($"file_name" === "gone.csv").collect().head
    assert(gone.getAs[String]("status") == "failed")
    val kept = store.read().filter($"file_name" === "keep.csv").collect().head
    assert(kept.getAs[String]("status") == "done")
  }

  test("jsonl roundtrip: corrupt lines are counted, valid rows reconcile") {
    val dir = "/root/testdata/sf0.001"
    // columns: (source, is_corrupt, n_rows, sum_chars) — corrupt lines
    // bucket on the is_corrupt marker, not on a NULL source
    val out = SparkEntry.queries("wh_jsonl_roundtrip")(spark, dir)
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val docs = graft.queries.Q.table(spark, dir, "documents")
    val nCorrupt = docs.filter($"doc_id" % 97 === 0).count()
    val nTotal = docs.count()
    assert(out.map(_._3).sum == nTotal, "every line must land somewhere")
    val corrupt = out.filter(_._2 == 1L)
    assert(corrupt.map(_._3).sum == nCorrupt && corrupt.forall(_._4 == 0L),
      s"corrupt ledger wrong: ${corrupt.toList}")
    val wantChars = docs.filter($"doc_id" % 97 =!= 0)
      .agg(sum($"n_chars")).collect().head.getLong(0)
    assert(out.filter(_._2 == 0L).map(_._4).sum == wantChars)
  }
}
