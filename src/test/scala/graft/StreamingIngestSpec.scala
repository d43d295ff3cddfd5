package graft

import graft.ingest.IngestPipeline
import graft.ledger.LedgerStore
import graft.streaming.StreamingIngest
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Streaming semantics (SURVEY.md §2.6): event-driven incremental triggers,
  * checkpointed exactly-once discovery, and replay safety (ST1/ST2/ST4).
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: String, name: String, content: String): Unit =
    Files.write(Paths.get(dir, name), content.getBytes("UTF-8"))

  test("availableNow drain, checkpoint replay, and incremental pickup") {
    val inbox = tmpDir("s-inbox")
    writeFile(inbox, "good.csv",
      "id,name,qty\n1,ant,2\n2,bee,3\n3,cow,4\n4,doe,5\n5,elk,6\n")
    writeFile(inbox, "bad-only-header.csv", "id,name,qty")
    val cp = tmpDir("s-checkpoint")
    val store = new LedgerStore(spark, tmpDir("s-ledger"))
    val pipe = new IngestPipeline(spark, store, tmpDir("s-quarantine"))
    val si = new StreamingIngest(spark, pipe)

    // Drain 1: both files enter exactly one micro-batch each run.
    si.runAvailableNow(inbox, cp)
    val l1 = store.read().orderBy("upload_id").collect()
    assert(l1.length == 2)
    assert(l1.count(_.getAs[String]("status") == "done") == 1)
    assert(l1.count(_.getAs[String]("status") == "failed") == 1)

    // Drain 2, same checkpoint, no new files: the source's seen-files log
    // re-emits nothing → zero effects, ledger bit-identical (ST4).
    si.runAvailableNow(inbox, cp)
    val l2 = store.read().orderBy("upload_id").collect()
    assert(l1.toSeq == l2.toSeq)

    // New file arrives: only it is processed (event-driven incremental).
    writeFile(inbox, "extra.csv", "a,b\n1,2\n")
    si.runAvailableNow(inbox, cp)
    val l3 = store.read()
    assert(l3.count() == 3)
    val extra = l3.filter($"file_name" === "extra.csv").collect().head
    assert(extra.getAs[String]("status") == "done")
    assert(extra.getAs[Long]("lines_processed") == 3L)
    // the previously-failed upload was NOT re-delivered by the source
    val bad = l3.filter($"status" === "failed").collect().head
    assert(bad.getAs[Int]("attempts") == 1)
  }
}
