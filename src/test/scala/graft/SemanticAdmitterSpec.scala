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
    // a 3-row bootstrap trains 3 centroids — currentK records the k that
    // EXISTS, not the MinK floor (which only applies once n >= MinK)
    assert(adm.currentVersion == 0 && adm.currentK == 3)
    assert(admittedPairs(base).map(_._1) == Set(0L, 2L))
    assert(o0.admitted == 2L)

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

  test("a crashed mid-refresh swap (orphan index_v1) converges on the" +
      " next trigger") {
    val base = tmpDir("sem-orphan")
    val adm = new SemanticAdmitter(spark, base, simThreshold = 0.995,
      stalenessBound = 1.2)
    adm.admit(vecs(0, 300), 0L) // k=18, no swap yet
    assert(adm.currentVersion == 0)
    // plant the crash artifact: a refresh died AFTER starting its
    // reassignment write into index_v1 but BEFORE the pointer landed —
    // the pointer still names v0 and index_v1 holds partial garbage
    Seq((31337L, 0L, Array(1f, 0f), 999L))
      .toDF("vec_id", "list_id", "embedding", "ingest_batch")
      .write.partitionBy("ingest_batch").parquet(s"$base/index_v1")
    // the next staleness trigger recomputes newVersion = 1 and must
    // OVERWRITE the orphan, not die on path-already-exists forever
    val o1 = adm.admit(vecs(300, 600), 1L)
    assert(o1.refreshed.nonEmpty, "refresh must succeed over the orphan")
    assert(adm.currentVersion == 1)
    val idx = spark.read.parquet(s"$base/index_v1")
    assert(idx.filter(col("vec_id") === 31337L).isEmpty,
      "the orphan's phantom rows must not survive the swap")
    assert(idx.count() == o1.refreshed.get.indexRows)
  }

  test("a kCap-pinned quantizer never enters a per-batch retrain loop") {
    val base = tmpDir("sem-kcap")
    val adm = new SemanticAdmitter(spark, base, simThreshold = 0.995,
      kCap = 16, stalenessBound = 1.2)
    adm.admit(vecs(0, 300), 0L) // k pinned at the cap
    assert(adm.currentK == 16)
    // ratio 600/256 ≈ 2.3 is past the bound, but clampK(600) == 16 == k:
    // a retrain cannot change a single list, so no refresh may fire —
    // without the guard EVERY batch from here would pay O(index) retrain
    val o1 = adm.admit(vecs(300, 600), 1L)
    assert(o1.refreshed.isEmpty && adm.currentVersion == 0)
    val o2 = adm.admit(vecs(600, 900), 2L)
    assert(o2.refreshed.isEmpty && adm.currentVersion == 0)
    assert(adm.stalenessRatio > 1.2) // stale by the ratio, pinned by k
  }

  test("past flatKMax the codebook trains as a two-level IMI tree;" +
      " admission, swap and recovery hold") {
    val base = tmpDir("sem-tree")
    // flatKMax=4 forces the tree at fixture scale: bootstrap k=18 > 4
    // trains k1=5 supers × k2=4 children
    val adm = new SemanticAdmitter(spark, base, simThreshold = 0.995,
      stalenessBound = 1.2, flatKMax = 4)
    val o0 = adm.admit(vecs(0, 300), 0L)
    assert(!o0.replayed && o0.admitted > 0)
    assert(new java.io.File(s"$base/quantizer/v0/children").exists(),
      "tree mode must persist the children codebook")
    // swap under tree mode (same staleness dial as the flat test)
    val o1 = adm.admit(vecs(300, 600), 1L)
    val info = o1.refreshed.getOrElse(fail("expected a tree-mode refresh"))
    assert(adm.currentVersion == 1 && info.k > 4)
    assert(new java.io.File(s"$base/quantizer/v1/children").exists())
    // an exact duplicate of an admitted vector descends to the same
    // list under the two-level argmax and is rejected
    val all = admittedPairs(base)
    val dupOf = all.map(_._1).min
    val dupEmb = spark.read.parquet(s"$base/index_v1")
      .filter(col("vec_id") === dupOf)
      .select("embedding").as[Array[Float]].head()
    adm.admit(Seq((9000L, dupEmb)).toDF("vec_id", "embedding"), 2L)
    assert(!admittedPairs(base).filter(_._2 == 2L).map(_._1)
      .contains(9000L), "duplicate must be rejected under the tree")
    // restart recovers the TREE codebook from disk and replays markers
    val adm2 = new SemanticAdmitter(spark, base, simThreshold = 0.995,
      stalenessBound = 1.2, flatKMax = 4)
    assert(adm2.currentVersion == adm.currentVersion
      && adm2.currentK == adm.currentK)
    assert(adm2.admit(vecs(0, 300), 0L).replayed)
  }
}
