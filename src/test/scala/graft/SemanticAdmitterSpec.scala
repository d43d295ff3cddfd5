package graft

import graft.streaming.SemanticAdmitter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantizer lifecycle around semantic streaming admission: k ∝ √n
  * staleness refresh, mid-stream index swap, and the completion-marker
  * ledger that keeps redelivery bit-stable ACROSS a swap (re-derivation
  * stability is unattainable once the quantizer can change between a
  * batch's first delivery and its redelivery).
  */
class SemanticAdmitterSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random 16-dim vectors, ids [lo, hi). Hash
    * mixing, not a linear congruence: a small-modulus LCG repeats the
    * whole vector every `m` ids (batch 1 became a pure duplicate of
    * batch 0 — nothing indexed, no staleness, no swap), and a large-
    * modulus one makes each vector a near-linear ramp in `d` (cosines
    * ≈ 1 corpus-wide — 24 of 300 admitted). xxhash64(vec_id, d) has
    * neither period nor ramp. */
  private def vecs(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 15),
        d -> CAST((pmod(xxhash64(vec_id, d), 2001) - 1000)
               / 1000.0 AS FLOAT))""")
        .as("embedding"))

  private def admittedPairs(base: String): Set[(Long, Long)] =
    spark.read.parquet(s"$base/out")
      .select("vec_id", "ingest_batch").as[(Long, Long)].collect().toSet

  test("bootstrap, within-batch and cross-batch semantic rejection") {
    val base = tmpDir("sem-adm")
    val adm = new SemanticAdmitter(spark, base, simThreshold = 0.99)
    // v1 is v0 scaled (cosine exactly 1, identical argmax list under any
    // codebook); v2 points elsewhere
    val b0 = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.5f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val o0 = adm.admit(b0, 0L)
    assert(!o0.replayed && o0.refreshed.isEmpty)
    assert(adm.currentVersion == 0 && adm.currentK >= SemanticAdmitter.MinK)
    assert(admittedPairs(base).map(_._1) == Set(0L, 2L))

    // cross-batch: v3 duplicates admitted v0 (same direction → same list
    // → cosine 1 against evidence); v4 is novel
    val b1 = Seq(
      (3L, Array(2f, 0f, 0f, 0f)),
      (4L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    adm.admit(b1, 1L)
    assert(admittedPairs(base).map(_._1) == Set(0L, 2L, 4L))
  }

  test("staleness refresh swaps the index; evidence and redelivery hold" +
      " across the swap") {
    val base = tmpDir("sem-swap")
    // bound chosen so batch 0 (300 rows, k=18, ratio 300/324≈0.93) stays
    // fresh and batch 1 (600/324≈1.85) triggers the swap
    val adm = new SemanticAdmitter(spark, base, simThreshold = 0.995,
      stalenessBound = 1.2)
    val o0 = adm.admit(vecs(0, 300), 0L)
    assert(!o0.replayed && o0.refreshed.isEmpty)
    assert(adm.currentVersion == 0 && adm.currentK == 18)
    val preSwap = admittedPairs(base)

    val o1 = adm.admit(vecs(300, 600), 1L)
    val info = o1.refreshed.getOrElse(fail("expected a quantizer refresh"))
    assert(adm.currentVersion == 1)
    // k returned to the √n operating point of the grown index
    assert(info.k == math.ceil(math.sqrt(info.indexRows.toDouble)).toInt)
    assert(adm.currentK == info.k)
    // old index version dropped, new one carries every admitted row
    assert(!new java.io.File(s"$base/index_v0").exists())
    val idx = spark.read.parquet(s"$base/index_v1")
    assert(idx.count() == info.indexRows)
    // per-list population back inside the staleness bound
    assert(adm.stalenessRatio < 1.2)

    // REDELIVERY of a PRE-swap batch: the completion marker replays it —
    // bit-stable admitted set even though the quantizer that decided it
    // no longer exists
    val all = admittedPairs(base)
    val r = adm.admit(vecs(0, 300), 0L)
    assert(r.replayed && r.refreshed.isEmpty)
    assert(admittedPairs(base) == all)
    assert(admittedPairs(base).filter(_._2 == 0L) == preSwap)

    // POST-swap evidence: an exact duplicate of an admitted batch-0
    // vector lands in the same (reassigned) list and is rejected
    val dupOf = preSwap.map(_._1).min
    val dupEmb = spark.read.parquet(s"$base/index_v1")
      .filter(col("vec_id") === dupOf)
      .select("embedding").as[Array[Float]].head()
    val b2 = Seq((9000L, dupEmb), (9001L, dupEmb.map(-_)))
      .toDF("vec_id", "embedding")
    adm.admit(b2, 2L)
    val batch2 = admittedPairs(base).filter(_._2 == 2L).map(_._1)
    assert(!batch2.contains(9000L), "duplicate must be rejected post-swap")
    assert(batch2.contains(9001L), "novel (antipodal) vector admitted")
  }

  test("restart recovers the pointer; half-written attempts converge") {
    val base = tmpDir("sem-rec")
    val adm = new SemanticAdmitter(spark, base, simThreshold = 0.995,
      stalenessBound = 1.2)
    adm.admit(vecs(0, 300), 0L)
    adm.admit(vecs(300, 600), 1L) // triggers the swap (see above)
    val (v, k) = (adm.currentVersion, adm.currentK)
    assert(v == 1)
    val all = admittedPairs(base)

    // a NEW admitter on the same baseDir recovers version/k/codebook
    // from the pointer (written last in every swap)
    val adm2 = new SemanticAdmitter(spark, base, simThreshold = 0.995,
      stalenessBound = 1.2)
    assert(adm2.currentVersion == v && adm2.currentK == k)
    // marked batches replay through the recovered instance
    assert(adm2.admit(vecs(0, 300), 0L).replayed)
    assert(admittedPairs(base) == all)

    // HALF-WRITTEN attempt: batch 7's output partition exists (crashed
    // mid-write, no marker) with rows a fresh decision would not emit —
    // admit must delete the partials and decide fresh
    Seq((777L, 0L, 7L)).toDF("vec_id", "list_id", "ingest_batch")
      .write.option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").mode("append").parquet(s"$base/out")
    val o7 = adm2.admit(vecs(600, 610), 7L)
    assert(!o7.replayed)
    val batch7 = admittedPairs(base).filter(_._2 == 7L).map(_._1)
    assert(!batch7.contains(777L), "stale partial row must be purged")
    assert(batch7.nonEmpty)
  }
}
