package graft.ledger

import graft.SparkSpec
import graft.model.UploadStatus

/** Scale housekeeping of the base+delta chain: reads must stay
  * O(base + deltas-since-compaction) no matter how many merges have ever
  * happened (compaction bounds the chain, the plan scans only chain
  * generations), and time travel / the generation log must stay correct
  * across multiple compaction cycles even when the merges that drove them
  * ran concurrently.
  */
class LedgerCompactionScaleSpec extends SparkSpec {
  import spark.implicits._

  private def upsert(id: String, lines: Long) =
    Seq((id, UploadStatus.Pending, lines))
      .toDF("upload_id", "status", "lines_processed")

  test("read cost is bounded by base + deltas-since-compaction, not merge count") {
    val store = new LedgerStore(spark, tmpDir("cost-ledger"), compactEvery = 4)
    for (i <- 1 to 19) {
      store.merge(upsert(s"u${i % 7}", i.toLong))
      // The chain a read resolves never exceeds one base + compactEvery
      // deltas: merge() compacts synchronously once the threshold is hit,
      // so 19 merges must NOT mean a 19-generation read.
      val ch = store.liveChain()
      assert(ch.count(!_.isDelta) <= 1, s"chain holds >1 base after merge $i")
      assert(ch.count(_.isDelta) <= 4,
        s"chain holds ${ch.count(_.isDelta)} deltas after merge $i — " +
          "compaction is not bounding read cost")
    }
    // Plan-level: the merge-on-read resolution scans only the chain's
    // generation dirs — per chain link a SMALL CONSTANT of scans (the
    // union feeding the value pass and the created-keys aggregate each
    // read the chain, and the formatted explain prints the broadcast's
    // subtree again instead of a ReusedExchange marker: 4 appearances per
    // link) — and never anything proportional to the 19 merges that
    // built this state.
    val ch = store.liveChain()
    val plan = store.read().queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 4 * ch.size,
      s"read plan has $scans parquet scans for a ${ch.size}-link chain:\n$plan")
    // exact state survives the churn (last writer per key wins)
    val got = store.read().select("upload_id", "lines_processed")
      .as[(String, Long)].collect().toMap
    val expect = (1 to 19).groupBy(i => s"u${i % 7}")
      .view.mapValues(_.max.toLong).toMap
    assert(got == expect)
  }

  test("readAt/history stay correct across two compaction cycles under concurrent merges") {
    val store = new LedgerStore(spark, tmpDir("tt-storm"), compactEvery = 3)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    // Phase 1: concurrent writers (disjoint keys) racing merge + compaction.
    Await.result(Future.sequence((1 to 4).map { t =>
      Future { (1 to 3).foreach { i =>
        store.merge(upsert(s"t$t-m$i", (t * 10 + i).toLong)) } }
    }), 5.minutes)
    // Phase 2: drive two full DETERMINISTIC compaction cycles on top, so
    // the retained history provably crosses ≥ 2 base snapshots whatever
    // compaction races phase 1 won or lost.
    for (i <- 1 to 6) store.merge(upsert(s"seq-m$i", (100 + i).toLong))

    val hist = store.history().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // the generation log is strictly increasing with no duplicate seqs
    assert(hist.map(_._1).toSeq == hist.map(_._1).toSeq.sorted)
    assert(hist.map(_._1).distinct.length == hist.length)
    assert(hist.count(_._2 == "base") >= 2,
      s"expected ≥2 retained base snapshots, got: ${hist.mkString(", ")}")

    // every retained generation resolves through readAt, and the observed
    // key sets grow monotonically along the timeline (merges only add or
    // update keys, so any historical state must be a subset of any later
    // one — a compaction that lost or resurrected rows would break this)
    val keysBySeq = hist.map { case (seq, _) =>
      seq -> store.readAt(seq).select("upload_id").as[String].collect().toSet
    }
    keysBySeq.sliding(2).foreach {
      case Array((s1, k1), (s2, k2)) =>
        assert(k1.subsetOf(k2), s"keys at seq $s1 ⊄ keys at seq $s2")
      case _ => ()
    }
    // the newest retained generation IS the live state: all 18 merges
    // (12 concurrent + 6 sequential) present with last-writer values
    val fin = store.read().select("upload_id", "lines_processed")
      .as[(String, Long)].collect().toMap
    val expect =
      (for (t <- 1 to 4; i <- 1 to 3) yield s"t$t-m$i" -> (t * 10 + i).toLong)
        .toMap ++ (1 to 6).map(i => s"seq-m$i" -> (100 + i).toLong).toMap
    assert(fin == expect)
    assert(keysBySeq.last._2 == expect.keySet)
    // and the post-storm chain is still compaction-bounded
    assert(store.liveChain().count(_.isDelta) <= 3)
  }
}
