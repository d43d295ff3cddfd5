package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IvfCodebook

/** Quantizer LIFECYCLE for semantic streaming admission — the layer
  * [[StreamingDedup.processBatchSemantic]] deliberately leaves to its
  * caller ("callers supply `list_id` from an offline-trained coarse
  * quantizer"). A continuously-admitting corpus outgrows any build-time
  * codebook: per-batch similarity work is O(admitted · batch / k), so a
  * FIXED k decays linearly as the corpus grows (measured round 12: k=16
  * at x300 fell 1810 → 1263 docs/s over the run), while k ∝ √n keeps the
  * per-list population flat. This class owns that dial end-to-end:
  *
  *  - **Assignment**: each arriving batch is assigned `list_id` against
  *    the CURRENT codebook (broadcast argmax — the per-trigger cost a
  *    production streaming ANN pays), then admitted by
  *    [[StreamingDedup.processBatchSemantic]].
  *  - **Staleness trigger**: after each batch, if
  *    `indexRows / k² ≥ stalenessBound` — i.e. the per-list population
  *    `n/k` has drifted `stalenessBound`× past the k ∝ √n operating
  *    point — AND the recomputed k actually differs from the current
  *    one, the quantizer is retrained at `k' = ceil(√n)` (capped by
  *    `kCap`) on the admitted index and the WHOLE index is reassigned
  *    into a new versioned directory. Bound-4 doubling makes the total
  *    reassignment work a geometric series ≈ 4/3 of the final index —
  *    amortized O(n), the same argument as array doubling. The
  *    k-unchanged guard is what keeps that amortization claim TRUE
  *    under a binding `kCap`: once k is pinned at the cap, n/k² only
  *    grows, and without the guard every subsequent batch would pay a
  *    full-index retrain that cannot change a single list — O(n) per
  *    batch, not a geometric series.
  *  - **Training complexity**: flat Lloyd is O(n·k) per iteration —
  *    the wrong complexity class once k grows past [[SemanticAdmitter.FlatKMax]]
  *    (at k = √n ≈ 2236 for a 5 M-vector index, flat training touches
  *    ~11 M centroid pairs per sampled row-pass). Past the cutover the
  *    codebook trains as the same two-level IMI tree the batch family
  *    uses ([[IvfCodebook.trainChildren]]): k1 ≈ √k supers, k2 ≈ k/k1
  *    children per super — O(n·2√k) per pass for both training and
  *    assignment, with the standard IMI best-child-of-best-super
  *    approximation. The cutover changes WHICH lists vectors land in,
  *    never the admission discipline; the oracled contract query pins
  *    k below the cutover so its DuckDB replay stays the flat Lloyd.
  *  - **Exactly-once across swaps — the idempotency-LEDGER discipline**
  *    (the reference pipeline's Firestore `status == done → skip`,
  *    SURVEY.md §2 F4/D1, re-applied to vector state):
  *    re-DERIVATION stability, which the fixed-quantizer admission
  *    relies on, is unattainable once the quantizer can change between
  *    a batch's first delivery and its redelivery — the dedup relation
  *    itself ("similar within the same coarse list") moves. So each
  *    completed batch writes a completion MARKER after its output and
  *    index partitions land, and a redelivered marked batch is a
  *    replay no-op: decisions are made exactly once, under exactly one
  *    quantizer version, and redelivery is bit-stable by construction.
  *    A batch with no marker (first delivery, or a crashed half-written
  *    attempt) has committed nothing: its partial partitions are
  *    deleted and it is decided fresh under the current version — and,
  *    symmetrically, UNMARKED partitions of OTHER batches are excluded
  *    from every evidence read and from refresh reassignment, so a
  *    crashed batch's phantom rows can never reject another batch's
  *    vectors before their own redelivery re-decides them.
  *
  * Scale notes: the evidence side stays scan-only (inherited from
  * [[StreamingDedup]]); codebooks are k·dims local rows (broadcast-
  * small at any √n that fits a coarse quantizer); the only non-O(batch)
  * step is the refresh reassignment, amortized geometrically. The index
  * row count backing the staleness check is a RUNNING COUNTER — seeded
  * once at recovery from the marked partitions, advanced by each batch's
  * admitted delta — not a per-trigger count job (at 1 B vectors a
  * footer-metadata count would still list the entire evidence tree every
  * few seconds). Single-writer, like the ingest ledger (SURVEY.md §2.6):
  * one admitter instance owns `baseDir`.
  *
  * On-disk layout under `baseDir`:
  * {{{
  *   out/                    admitted (vec_id, list_id, ingest_batch);
  *                           list_id is the ADMITTING version's — the
  *                           current index is the authoritative layout
  *   index_v<V>/             vector index under quantizer version V
  *   markers/<batchId>       completion markers (the ledger)
  *   quantizer/v<V>/super    codebook parquet (cent_id, dim, cs)
  *   quantizer/v<V>/children two-level mode only: (grp, cent_id, dim, cs)
  *   quantizer/CURRENT       "version k" pointer, written LAST in a
  *                           swap — a crash mid-swap leaves the old
  *                           version current and the new dir orphaned
  *                           (the next refresh OVERWRITES the orphan:
  *                           every versioned write below is
  *                           SaveMode.Overwrite for exactly that crash)
  * }}}
  */
final class SemanticAdmitter(
    spark: SparkSession,
    baseDir: String,
    simThreshold: Double = 0.4,
    kCap: Int = Int.MaxValue,
    stalenessBound: Double = 4.0,
    lloydIters: Int = 2,
    trainSampleEvery: Int = 4,
    flatKMax: Int = SemanticAdmitter.FlatKMax,
    outputPartitions: Int = StreamingDedup.DefaultOutputPartitions) {

  import SemanticAdmitter._

  require(stalenessBound > 1.0,
    s"stalenessBound must exceed 1 (k is set to sqrt(n) at build), " +
      s"got $stalenessBound")

  private val outDir = s"$baseDir/out"
  private def indexDir(v: Int) = s"$baseDir/index_v$v"
  private def codebookDir(v: Int) = s"$baseDir/quantizer/v$v"
  private val markersDir = s"$baseDir/markers"
  private val pointerPath = s"$baseDir/quantizer/CURRENT"

  private val fs = new org.apache.hadoop.fs.Path(baseDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  /** The completion ledger, held locally (single-writer): seeded from the
    * markers directory at construction, advanced as batches complete.
    * Every evidence read and the refresh reassignment are restricted to
    * these batches — an unmarked partition is a crashed attempt that has
    * committed nothing. */
  private val markedBatches: scala.collection.mutable.Set[Long] = {
    val s = scala.collection.mutable.Set.empty[Long]
    if (fs.exists(p(markersDir)))
      fs.listStatus(p(markersDir)).foreach { st =>
        val name = st.getPath.getName
        try { s += name.toLong; () } catch { case _: NumberFormatException => }
      }
    s
  }

  /** (version, k, codebook): recovered from the pointer file if a prior
    * admitter wrote one (crash/restart — the pointer is written last in
    * every swap, so it always names a fully-landed codebook+index pair);
    * otherwise untrained until the first batch arrives. */
  private var state: Option[QuantizerState] = {
    if (fs.exists(p(pointerPath))) {
      val in = fs.open(p(pointerPath))
      val text = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      val Array(v, k) = text.trim.split("\\s+").map(_.toInt)
      Some(QuantizerState(v, k, loadCodebook(v)))
    } else None
  }

  /** Running count of MARKED index rows — the staleness check's n.
    * Seeded once at recovery (a count over the marked partitions of the
    * recovered index: one job per process lifetime), then advanced by
    * each batch's admitted delta; a per-trigger count job would list the
    * whole evidence tree on every batch of a corpus that only grows. */
  private var indexedRows: Long = state match {
    case Some(s) if fs.exists(p(indexDir(s.version))) =>
      spark.read.schema(StreamingDedup.vecIndexSchema)
        .parquet(indexDir(s.version))
        .filter(markedOnly)
        .count()
    case _ => 0L
  }

  private def markedOnly: Column =
    if (markedBatches.isEmpty) lit(false)
    else col("ingest_batch").isin(markedBatches.toSeq: _*)

  def currentVersion: Int = state.map(_.version).getOrElse(-1)
  def currentK: Int = state.map(_.k).getOrElse(0)
  /** The CURRENT version's index directory (state-size reporting). */
  def currentIndexDir: String = indexDir(math.max(0, currentVersion))
  def admittedDir: String = outDir

  /** indexRows / k² — 1.0 at the k = √n operating point, `stalenessBound`
    * at the refresh trigger. 0 while untrained. */
  def stalenessRatio: Double = state match {
    case Some(s) => indexedRows.toDouble / (s.k.toDouble * s.k)
    case None => 0.0
  }

  private def loadCodebook(v: Int): Coarse = {
    val sup = localRelation(spark.read.parquet(s"${codebookDir(v)}/super")
      .select(col("cent_id"), col("dim").cast("int"), col("cs")))
    if (fs.exists(p(s"${codebookDir(v)}/children")))
      TreeCoarse(sup, localGroupedRelation(
        spark.read.parquet(s"${codebookDir(v)}/children")
          .select(col("grp"), col("cent_id"), col("dim").cast("int"),
            col("cs"))))
    else FlatCoarse(sup)
  }

  /** Explicit (cent_id, dim, cs) seed: the k lowest vec_ids actually IN
    * `vecs` — the default `vec_id < k` seed assumes ids dense from 0,
    * false for micro-batches (residue classes) and admitted subsets
    * (rejections punch holes). orderBy+limit plans as a top-k
    * (TakeOrdered), never a full sort. */
  private def seedFor(vecs: DataFrame, k: Int): DataFrame = {
    val low = vecs.select("vec_id").orderBy("vec_id").limit(k)
    IvfCodebook.comps(vecs.join(broadcast(low), "vec_id"))
      .select(col("vec_id").as("cent_id"), col("dim"), col("qx").as("cs"))
  }

  /** k = min(kCap, max(MinK, ceil(√n))), additionally clamped to n itself:
    * Lloyd cannot produce more centroids than it has seed vectors, so a
    * bootstrap batch below MinK records the k that actually exists —
    * otherwise currentK and stalenessRatio describe phantom lists and the
    * first refresh is deferred past the real operating point. */
  private def clampK(n: Long): Int = {
    val r = math.ceil(math.sqrt(math.max(1L, n).toDouble)).toInt
    val floor = math.min(MinK.toLong, math.max(1L, n)).toInt
    math.min(kCap, math.max(floor, r))
  }

  /** Train a codebook at list count `k` on `vecs`: flat Lloyd up to
    * `flatKMax` lists; the two-level IMI tree past it (see the class
    * doc's training-complexity note). */
  private def train(vecs: DataFrame, k: Int, sampleEvery: Int): Coarse =
    trainCoarse(spark, vecs, k, lloydIters, sampleEvery, flatKMax,
      Some(seedFor(vecs, math.min(k, flatKMax))))

  /** Assign `list_id` against the current codebook (broadcast argmax,
    * exact-integer arithmetic — the family discipline; two-level descent
    * in tree mode). */
  private def assigned(vecs: DataFrame): DataFrame = {
    val cm = IvfCodebook.comps(vecs)
    val asg = assignCoarse(cm, IvfCodebook.norms(cm), state.get.codebook)
    vecs.join(asg, "vec_id")
      .select(col("vec_id"), col("list_id"), col("embedding"))
  }

  /** Admit one micro-batch of (vec_id, embedding) rows. Replays (no-op)
    * if `batchId` already completed; otherwise deletes any half-written
    * partitions, decides under the current quantizer, marks completion,
    * and refreshes the quantizer if the index has grown stale. */
  def admit(batch: DataFrame, batchId: Long): AdmitOutcome = {
    val marker = p(s"$markersDir/$batchId")
    if (fs.exists(marker)) return AdmitOutcome(replayed = true, None, 0L)

    if (state.isEmpty) {
      // bootstrap: first batch ever — train the v0 codebook on it, at
      // the k = √n operating point of what is about to be indexed
      val n = batch.count()
      val k = clampK(n)
      val cb = train(batch, k, sampleEvery = 1)
      persistCodebook(0, k, cb)
      state = Some(QuantizerState(0, k, cb))
    }
    val s = state.get

    // a prior incomplete attempt committed nothing — but its partial
    // partitions could survive a dynamic overwrite if this attempt's
    // decision set is empty for a partition the crashed one wrote, so
    // delete them explicitly before re-deciding
    fs.delete(p(s"$outDir/ingest_batch=$batchId"), true)
    fs.delete(p(s"${indexDir(s.version)}/ingest_batch=$batchId"), true)

    val admitted = StreamingDedup.processBatchSemantic(spark,
      assigned(batch), batchId, indexDir(s.version), outDir, simThreshold,
      outputPartitions, evidenceBatches = Some(markedBatches.toSeq))
    // the marker commits the decision: everything before it re-runs on
    // redelivery, everything after it is maintenance
    fs.create(marker, true).close()
    markedBatches += batchId
    indexedRows += admitted

    val kNew = clampK(indexedRows)
    val refreshed =
      if (indexedRows.toDouble / (s.k.toDouble * s.k) >= stalenessBound
          && kNew != s.k) {
        // the kNew guard: under a binding kCap the ratio stays past the
        // bound forever, and a retrain that cannot change k is O(n) per
        // batch for zero list-population gain
        Some(refresh(indexedRows, kNew))
      } else None
    AdmitOutcome(replayed = false, refreshed, admitted)
  }

  /** Offline retrain + index swap: train k' = √n on the admitted (MARKED)
    * index, reassign every marked indexed vector into `index_v(V+1)`,
    * land codebook then pointer (crash-safe ordering), drop the old
    * version dir. Every versioned write is an OVERWRITE: a crash between
    * the reassignment write and the pointer leaves an orphan
    * index_v(V+1)/quantizer dir, and the NEXT refresh recomputes the same
    * version number — ErrorIfExists would fail it permanently. */
  private def refresh(n: Long, k: Int): RefreshInfo = {
    val t0 = System.nanoTime()
    val s = state.get
    val idx = spark.read.schema(StreamingDedup.vecIndexSchema)
      .parquet(indexDir(s.version))
      .filter(markedOnly)
    val vecs = idx.select(col("vec_id"), col("embedding"))
    val cb = train(vecs, k, sampleEvery = trainSampleEvery)
    val newVersion = s.version + 1
    // full-index reassignment under the new codebook, batch partitioning
    // preserved (the admission functions' dynamic-overwrite and
    // own-partition-exclusion semantics key on ingest_batch)
    val cm = IvfCodebook.comps(vecs)
    val asg = assignCoarse(cm, IvfCodebook.norms(cm), cb)
    // the reassignment write and the codebook-parquet write are
    // independent (both must land before the pointer, which
    // persistCodebookFiles does NOT write) — overlap their job latency
    // from driver threads, then publish the pointer last as before
    StreamingDedup.concurrently(
      () => idx.drop("list_id").join(asg, "vec_id")
        .select(col("vec_id"), col("list_id"), col("embedding"),
          col("ingest_batch"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("ingest_batch").parquet(indexDir(newVersion)),
      () => persistCodebookFiles(newVersion, cb))
    writePointer(newVersion, k)
    fs.delete(p(indexDir(s.version)), true)
    state = Some(QuantizerState(newVersion, k, cb))
    RefreshInfo(newVersion, k, n, (System.nanoTime() - t0) / 1e9)
  }

  private def persistCodebook(v: Int, k: Int, cb: Coarse): Unit = {
    persistCodebookFiles(v, cb)
    writePointer(v, k)
  }

  /** The codebook parquet files WITHOUT the pointer — split out so
    * [[refresh]] can overlap this write with the index reassignment and
    * still write the pointer strictly last (the crash-ordering
    * invariant). */
  private def persistCodebookFiles(v: Int, cb: Coarse): Unit = {
    val dir = codebookDir(v)
    fs.delete(p(dir), true) // a crashed swap's orphan (see refresh)
    cb match {
      case FlatCoarse(cents) =>
        cents.coalesce(1).write.mode("overwrite").parquet(s"$dir/super")
      case TreeCoarse(supers, children) =>
        StreamingDedup.concurrently(
          () => supers.coalesce(1).write.mode("overwrite")
            .parquet(s"$dir/super"),
          () => children.coalesce(1).write.mode("overwrite")
            .parquet(s"$dir/children"))
    }
  }

  private def writePointer(v: Int, k: Int): Unit = {
    val out = fs.create(p(pointerPath), true)
    try out.write(s"$v $k\n".getBytes("UTF-8")) finally out.close()
  }
}

object SemanticAdmitter {
  /** Floor on the list count — below this, coarse quantization buys
    * nothing over a flat scan of the evidence. */
  val MinK = 16

  /** Flat-Lloyd ceiling: past this many lists the codebook trains and
    * assigns as a two-level IMI tree (O(√k) per row instead of O(k)) —
    * the same cutover the batch IVF family applies
    * (`SimilarityQueries.FlatKMax`). */
  val FlatKMax = 64

  /** A trained coarse quantizer: flat centroids, or the two-level
    * (supers, children) IMI tree — both broadcast-small local relations. */
  sealed trait Coarse
  final case class FlatCoarse(cents: DataFrame) extends Coarse
  final case class TreeCoarse(supers: DataFrame, children: DataFrame)
      extends Coarse

  /** Train a coarse quantizer at list count `k`: flat deterministic Lloyd
    * while `k ≤ flatKMax`; past it, a √k-super two-level tree via
    * [[IvfCodebook.trainChildren]] (supers trained flat at k1 = ceil(√k),
    * then ~k/k1 children per super in one grouped-Lloyd pipeline). The
    * explicit `seed` (the flat/supers seed) lets callers on sparse-id
    * frames avoid the dense-ids `vec_id < k` default. */
  def trainCoarse(spark: SparkSession, vecs: DataFrame, k: Int,
      iters: Int, sampleEvery: Int, flatKMax: Int = FlatKMax,
      seed: Option[DataFrame] = None): Coarse =
    if (k <= flatKMax)
      FlatCoarse(IvfCodebook.train(spark, vecs, k = k, iters = iters,
        sampleEvery = sampleEvery, seedDf = seed))
    else {
      val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
      val k2 = (k + k1 - 1) / k1
      val supers = IvfCodebook.train(spark, vecs, k = k1, iters = iters,
        sampleEvery = sampleEvery, seedDf = seed)
      TreeCoarse(supers, IvfCodebook.trainChildren(spark, vecs, supers,
        k2 = k2, iters = iters, sampleEvery = sampleEvery))
    }

  /** Nearest-list assignment against a trained [[Coarse]]: flat broadcast
    * argmax, or the two-level descent. (vec_id, list_id) either way. */
  def assignCoarse(cm: DataFrame, norms: DataFrame,
      cb: Coarse): DataFrame = cb match {
    case FlatCoarse(cents) => IvfCodebook.assign(cm, norms, broadcast(cents))
    case TreeCoarse(supers, children) =>
      IvfCodebook.assignTwoLevel(cm, norms, supers, children)
  }

  /** Re-localize a codebook read back from parquet: it must be a SMALL
    * LOCAL relation (the broadcast side of every assignment), not a file
    * scan. */
  private def localRelation(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[(Long, Int, Long)].collect().toSeq.toDF("cent_id", "dim", "cs")
  }

  private def localGroupedRelation(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[(Long, Long, Int, Long)].collect().toSeq
      .toDF("grp", "cent_id", "dim", "cs")
  }

  private case class QuantizerState(version: Int, k: Int,
      codebook: Coarse)

  final case class RefreshInfo(version: Int, k: Int, indexRows: Long,
      seconds: Double)

  final case class AdmitOutcome(replayed: Boolean,
      refreshed: Option[RefreshInfo], admitted: Long)
}
