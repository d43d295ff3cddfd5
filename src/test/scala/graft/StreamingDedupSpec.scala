package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Continuous corpus admission: dedup within a batch, across batches, and
  * across micro-batch retries.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def admittedIds(outDir: String): Set[Long] =
    spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet

  test("streamed waves admit each distinct content exactly once") {
    val src = tmpDir("sdd-src")
    val idx = tmpDir("sdd-idx") + "/index"
    val out = tmpDir("sdd-out") + "/out"
    val cp = tmpDir("sdd-cp")

    // one AvailableNow drain per wave, SHARING the checkpoint: batch ids
    // continue across restarts and the signature index persists, so this
    // exercises cross-batch dedup through a real stop/start cycle with
    // fully deterministic batch boundaries (a continuous trigger would
    // race the assertions against its own spinning micro-batches)
    def drain(): Unit = {
      val q = StreamingDedup.start(spark,
        spark.readStream.schema(docSchema).parquet(s"$src/*"), idx, out, cp)
      try q.processAllAvailable() finally q.stop()
    }

    // wave 1: bravo duplicated within the batch
    Seq((1L, "alpha"), (2L, "bravo"), (3L, "bravo"))
      .toDF("doc_id", "text").write.parquet(s"$src/w1")
    drain()
    assert(admittedIds(out) == Set(1L, 2L))

    // wave 2: bravo again (cross-batch dup), charlie twice (within-batch)
    Seq((4L, "bravo"), (5L, "charlie"), (6L, "charlie"))
      .toDF("doc_id", "text").write.parquet(s"$src/w2")
    drain()
    assert(admittedIds(out) == Set(1L, 2L, 5L))

    // the index never stores text — bytes per doc, not the corpus
    assert(spark.read.parquet(idx).columns.toSet ==
      Set("content_hash", "doc_id", "ingest_batch"))
  }

  test("re-running a micro-batch converges (retry idempotence)") {
    val idx = tmpDir("sdd-idx2") + "/index"
    val out = tmpDir("sdd-out2") + "/out"
    val b0 = Seq((1L, "alpha"), (2L, "bravo")).toDF("doc_id", "text")
    val b1 = Seq((3L, "bravo"), (4L, "delta")).toDF("doc_id", "text")

    StreamingDedup.processBatch(spark, b0, 0L, idx, out)
    StreamingDedup.processBatch(spark, b1, 1L, idx, out)
    assert(admittedIds(out) == Set(1L, 2L, 4L))

    // redeliver batch 1 (failure replay): its own partial state must not
    // change the decision, other batches' state must survive
    StreamingDedup.processBatch(spark, b1, 1L, idx, out)
    assert(admittedIds(out) == Set(1L, 2L, 4L))
    assert(spark.read.parquet(idx).count() == 3)

    // a later batch still dedups against everything admitted so far
    StreamingDedup.processBatch(spark,
      Seq((5L, "delta"), (6L, "echo")).toDF("doc_id", "text"), 2L, idx, out)
    assert(admittedIds(out) == Set(1L, 2L, 4L, 6L))
  }
}
