package graft.queries

import graft.ingest.{CsvWarehouse, IngestPipeline}
import graft.ledger.LedgerStore
import graft.streaming.StreamingIngest
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end pipeline queries: unlike the per-operator queries in
  * [[IngestOpQueries]] (which prove each operator's dataflow over the
  * parquet tables), these run the REAL machinery — the streaming ingest
  * with its checkpointed source and ledger merges, and the CSV warehouse
  * with schema inference — over a deterministic CSV inbox derived from
  * `documents`, then surface the resulting state for the DuckDB oracle.
  * This is how ST4's exactly-once effect and the typed warehouse get
  * CORRECTNESS rows, not just ScalaTest coverage.
  */
object PipelineQueries {
  import Q._

  /** Eagerly materialize `df` (localCheckpoint), then delete the fixture
    * directories it was derived from — a Verify+Bench sweep would otherwise
    * leak hundreds of files into the temp dir per round. The returned
    * DataFrame is checkpoint-backed, so later materialization (the
    * contract's ORDER BY, the driver's parquet dump) no longer needs the
    * fixture on disk.
    */
  private def cleanupAfter(dirs: String*)(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val out = df.localCheckpoint()
    dirs.foreach { d =>
      import scala.jdk.CollectionConverters._
      val root = Paths.get(d)
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
        finally walk.close()
      }
    }
    out
  }

  /** Materialize a deterministic CSV inbox from `documents` (doc_id < 100):
    * `f<id>.csv` holds a typed 2-column row `k,v` = (doc_id, text length);
    * every 7th file is the 1-line invalid shape (fails the <2-split-element
    * validation, reference main.py:126-127). Bounded: ≤100 tiny files,
    * driver-side — a test fixture, not a data path.
    */
  private def writeInbox(s: SparkSession, d: String): String = {
    val base = Files.createTempDirectory("graft-e2e-").toString
    table(s, d, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), length(col("text")).as("len"))
      .collect()
      .foreach { r =>
        val id = r.getLong(0)
        val content =
          if (id % 7 == 0) "x" else s"k,v\n$id,${r.getInt(1)}"
        Files.write(Paths.get(base, s"f$id.csv"),
          content.getBytes(StandardCharsets.UTF_8))
      }
    base
  }

  val defs: Seq[QueryDef] = Seq(

    // ST4 — exactly-once EFFECT under redelivery: drain the inbox through
    // the streaming ingest, then drain it AGAIN with a fresh checkpoint
    // (worst-case redelivery: every file re-presented, as after checkpoint
    // loss). The ledger must show each valid upload done exactly once
    // (lines_processed from the single processing) and each invalid upload
    // retried (attempts = 2) — at-least-once delivery × idempotent merge.
    QueryDef("st4_replay_ledger",
      (s, d) => {
        val inbox = writeInbox(s, d)
        val tmp = Files.createTempDirectory("graft-st4-").toString
        val store = new LedgerStore(s, s"$tmp/ledger")
        val pipe = new IngestPipeline(s, store, s"$tmp/dlq")
        val si = new StreamingIngest(s, pipe)
        si.runAvailableNow(inbox, s"$tmp/ckpt1")
        si.runAvailableNow(inbox, s"$tmp/ckpt2") // full redelivery
        cleanupAfter(inbox, tmp) {
          store.read().select(
            col("file_name"), col("status"),
            col("lines_processed").cast("long").as("lines_processed"),
            col("attempts").cast("long").as("attempts"))
        }
      },
      Some("""SELECT 'f' || CAST(doc_id AS VARCHAR) || '.csv' AS file_name,
        |  CASE WHEN doc_id % 7 = 0 THEN 'failed' ELSE 'done' END AS status,
        |  CASE WHEN doc_id % 7 <> 0 THEN CAST(2 AS BIGINT) END AS lines_processed,
        |  CASE WHEN doc_id % 7 = 0 THEN CAST(2 AS BIGINT) END AS attempts
        |FROM documents WHERE doc_id < 100""".stripMargin)),

    // Typed warehouse: batch-ingest the same inbox, load the done uploads
    // into the warehouse WITH schema inference, and aggregate the numeric
    // columns of the resulting table — proving CSV strings became typed
    // parquet columns whose sums match the source-of-truth documents.
    QueryDef("wh_typed_agg",
      (s, d) => {
        val inbox = writeInbox(s, d)
        val tmp = Files.createTempDirectory("graft-wh-").toString
        val store = new LedgerStore(s, s"$tmp/ledger")
        new IngestPipeline(s, store, s"$tmp/dlq").runOnce(inbox)
        val wh = new CsvWarehouse(s, s"$tmp/warehouse", inferTypes = true)
        wh.loadDone(store)
        // all done uploads share the k,v header → exactly one table
        cleanupAfter(inbox, tmp) {
          wh.table(wh.tables().head)
            .agg(count(lit(1)).cast("long").as("n_rows"),
              sum(col("k")).cast("long").as("sum_k"),
              sum(col("v")).cast("long").as("sum_v"))
        }
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_k,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_v
        |FROM documents WHERE doc_id < 100 AND doc_id % 7 <> 0""".stripMargin)),

    // Streaming corpus admission (StreamingDedup): replay `documents` as
    // three deterministic micro-batches (batch = doc_id % 3) against a
    // fresh signature index, then REDELIVER the middle batch — at-least-
    // once delivery over the idempotent partition-overwrite admission.
    // A document is admitted iff it is the min doc_id of its content
    // within the FIRST batch that carries that content; the redelivery
    // must not change the set. The oracle replays exactly that rule
    // declaratively (batch order 0,1,2 — not global min: a content whose
    // lowest doc_id arrives in a LATER batch is still represented by its
    // first-batch copy). `documents` carries no exact-duplicate text, so
    // the corpus is augmented with deterministic copies — +30000 keeps
    // the batch (within-batch dup: the original wins as min), +10000
    // shifts batch by one (cross-batch dup; for b=2 originals the COPY
    // arrives first in batch 0 and wins despite the higher doc_id).
    QueryDef("st_dedup_admission",
      (s, d) => {
        val tmp = Files.createTempDirectory("graft-sdd-").toString
        val src = table(s, d, "documents").select(col("doc_id"), col("text"))
        val docs = src
          .unionAll(src.filter(col("doc_id") % 5 === 0)
            .withColumn("doc_id", col("doc_id") + 30000))
          .unionAll(src.filter(col("doc_id") % 7 === 0)
            .withColumn("doc_id", col("doc_id") + 10000))
        val wave = (b: Long) => docs.filter(col("doc_id") % 3 === b)
        (0L to 2L).foreach(b =>
          graft.streaming.StreamingDedup.processBatch(
            s, wave(b), b, s"$tmp/index", s"$tmp/out"))
        // worst-case redelivery: batch 1 re-presented in full
        graft.streaming.StreamingDedup.processBatch(
          s, wave(1L), 1L, s"$tmp/index", s"$tmp/out")
        cleanupAfter(tmp) {
          s.read.parquet(s"$tmp/out").select(col("doc_id"),
            col("ingest_batch").cast("long").as("ingest_batch"))
        }
      },
      Some("""WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 30000, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id % 7 = 0),
        |t AS (SELECT doc_id, text, doc_id % 3 AS b FROM aug),
        |f AS (SELECT text, min(b) AS b FROM t GROUP BY text)
        |SELECT min(t.doc_id) AS doc_id, CAST(t.b AS BIGINT) AS ingest_batch
        |FROM t JOIN f USING (text, b) GROUP BY t.text, t.b""".stripMargin)),

    // NEAR-dup streaming admission (StreamingDedup.processBatchNearDup):
    // the same 3-batch replay + middle-batch redelivery, with a MinHash
    // band index as additional rejection evidence — a document is
    // rejected if its content digest OR any LSH band collides with an
    // ALREADY-ADMITTED document of an earlier batch. The fixed point is
    // stable under redelivery because rejected documents leave no
    // evidence (their hashes/bands never enter the index), which is
    // exactly why the oracle can unroll the three batches sequentially
    // with admitted-only evidence sets and still match the engine's
    // redelivered run bit-for-bit.
    QueryDef("st_dedup_admission_near",
      (s, d) => {
        val tmp = Files.createTempDirectory("graft-sddn-").toString
        val docs = table(s, d, "documents").select(col("doc_id"), col("text"))
        val wave = (b: Long) => docs.filter(col("doc_id") % 3 === b)
        (0L to 2L).foreach(b =>
          graft.streaming.StreamingDedup.processBatchNearDup(
            s, wave(b), b, s"$tmp/index", s"$tmp/bands", s"$tmp/out"))
        graft.streaming.StreamingDedup.processBatchNearDup(
          s, wave(1L), 1L, s"$tmp/index", s"$tmp/bands", s"$tmp/out")
        cleanupAfter(tmp) {
          s.read.parquet(s"$tmp/out").select(col("doc_id"),
            col("ingest_batch").cast("long").as("ingest_batch"))
        }
      },
      Some(s"""${DedupQueries.MinhashBandsSql},
        |tt AS (SELECT doc_id, doc_id % 3 AS b, sha256(text) AS h
        |  FROM documents),
        |r0 AS (SELECT h, min(doc_id) AS doc_id FROM tt WHERE b = 0 GROUP BY h),
        |a0 AS (SELECT doc_id FROM r0),
        |e0h AS (SELECT tt.h FROM tt JOIN a0 USING (doc_id)),
        |e0b AS (SELECT band, bv FROM bands JOIN a0 USING (doc_id)),
        |r1 AS (SELECT h, min(doc_id) AS doc_id FROM tt WHERE b = 1 GROUP BY h),
        |a1 AS (SELECT r1.doc_id FROM r1
        |  WHERE NOT EXISTS (SELECT 1 FROM e0h WHERE e0h.h = r1.h)
        |    AND NOT EXISTS (SELECT 1 FROM bands bb JOIN e0b
        |      ON bb.band = e0b.band AND bb.bv = e0b.bv
        |      WHERE bb.doc_id = r1.doc_id)),
        |e1h AS (SELECT h FROM e0h
        |  UNION ALL SELECT tt.h FROM tt JOIN a1 USING (doc_id)),
        |e1b AS (SELECT band, bv FROM e0b
        |  UNION ALL SELECT band, bv FROM bands JOIN a1 USING (doc_id)),
        |r2 AS (SELECT h, min(doc_id) AS doc_id FROM tt WHERE b = 2 GROUP BY h),
        |a2 AS (SELECT r2.doc_id FROM r2
        |  WHERE NOT EXISTS (SELECT 1 FROM e1h WHERE e1h.h = r2.h)
        |    AND NOT EXISTS (SELECT 1 FROM bands bb JOIN e1b
        |      ON bb.band = e1b.band AND bb.bv = e1b.bv
        |      WHERE bb.doc_id = r2.doc_id))
        |SELECT doc_id, CAST(0 AS BIGINT) AS ingest_batch FROM a0
        |UNION ALL SELECT doc_id, CAST(1 AS BIGINT) FROM a1
        |UNION ALL SELECT doc_id, CAST(2 AS BIGINT) FROM a2""".stripMargin)),

    // SEMANTIC streaming admission (StreamingDedup.processBatchSemantic):
    // the embedding form of the two admissions above — vectors arrive in
    // batches and are admitted unless semantically redundant: rejected if
    // a lower-id SAME-batch vector in the same coarse IVF list is within
    // cosine 0.4 (the one-pass rule `dedup_semantic` uses — a pure
    // function of the batch), or if any already-admitted earlier-batch
    // vector in the list is. The list assignment comes from the
    // offline-trained shared codebook (the production shape: streaming
    // ANN admits against a pretrained index), so similarity is evaluated
    // list-bounded, never corpus-wide. Same exactly-once discipline: all
    // outputs partitioned by ingest_batch, dynamic overwrite, own batch
    // excluded as evidence — the 3-batch replay plus a full middle-batch
    // redelivery converges because an admitted later vector is by
    // construction dissimilar from every earlier admitted one, so the
    // oracle can unroll the batches sequentially.
    QueryDef("st_dedup_admission_semantic",
      (s, d) => {
        val tmp = Files.createTempDirectory("graft-sds-").toString
        // materialized ONCE: the four admission passes (3 batches + the
        // redelivery) each filter this frame, and without the memo every
        // pass re-scanned embeddings and re-ran the assignment join
        val vecs = cached(s, d, "sds_vecs") {
          table(s, d, "embeddings")
            .select(col("vec_id"), col("embedding"))
            .join(SimilarityQueries.sharedAssignment(s, d), "vec_id")
        }
        val wave = (b: Long) => vecs.filter(col("vec_id") % 3 === b)
        (0L to 2L).foreach(b =>
          graft.streaming.StreamingDedup.processBatchSemantic(
            s, wave(b), b, s"$tmp/vindex", s"$tmp/out", 0.4))
        graft.streaming.StreamingDedup.processBatchSemantic(
          s, wave(1L), 1L, s"$tmp/vindex", s"$tmp/out", 0.4) // redelivery
        cleanupAfter(tmp) {
          s.read.parquet(s"$tmp/out").select(col("vec_id"),
            col("list_id").cast("long").as("list_id"),
            col("ingest_batch").cast("long").as("ingest_batch"))
        }
      },
      Some(s"""WITH ${SimilarityQueries.AssignCtesSql},
        |qv AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qe
        |  FROM embeddings),
        |qn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS n2 FROM qv),
        |tv AS (SELECT qn.vec_id, assign.list_id, qn.qe, qn.n2,
        |    qn.vec_id % 3 AS bt
        |  FROM qn JOIN assign ON qn.vec_id = assign.vec_id),
        |sim AS (SELECT x.vec_id AS va, x.bt AS ba, y.vec_id AS vb,
        |    y.bt AS bb,
        |    CAST(CAST(list_sum(list_transform(range(1, len(x.qe) + 1),
        |      i -> x.qe[i] * y.qe[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))) AS sm
        |  FROM tv x JOIN tv y
        |    ON x.list_id = y.list_id AND x.vec_id <> y.vec_id),
        |wd AS (SELECT DISTINCT vb AS vec_id FROM sim
        |  WHERE ba = bb AND va < vb AND sm >= 0.4),
        |aa0 AS (SELECT vec_id FROM tv WHERE bt = 0
        |  AND vec_id NOT IN (SELECT vec_id FROM wd)),
        |h1 AS (SELECT DISTINCT vb AS vec_id FROM sim JOIN aa0
        |    ON sim.va = aa0.vec_id
        |  WHERE bb = 1 AND sm >= 0.4),
        |aa1 AS (SELECT vec_id FROM tv WHERE bt = 1
        |  AND vec_id NOT IN (SELECT vec_id FROM wd)
        |  AND vec_id NOT IN (SELECT vec_id FROM h1)),
        |h2 AS (SELECT DISTINCT vb AS vec_id FROM sim
        |  WHERE bb = 2 AND sm >= 0.4
        |    AND va IN (SELECT vec_id FROM aa0
        |               UNION ALL SELECT vec_id FROM aa1)),
        |aa2 AS (SELECT vec_id FROM tv WHERE bt = 2
        |  AND vec_id NOT IN (SELECT vec_id FROM wd)
        |  AND vec_id NOT IN (SELECT vec_id FROM h2)),
        |adm AS (SELECT vec_id FROM aa0
        |  UNION ALL SELECT vec_id FROM aa1
        |  UNION ALL SELECT vec_id FROM aa2)
        |SELECT t.vec_id, CAST(t.list_id AS BIGINT) AS list_id,
        |  CAST(t.bt AS BIGINT) AS ingest_batch
        |FROM tv t JOIN adm ON t.vec_id = adm.vec_id""".stripMargin)),

    // QUANTIZER-LIFECYCLE streaming admission (graft.streaming
    // .SemanticAdmitter): the refresh form of the semantic admission
    // above — no offline codebook; the v0 quantizer bootstraps on the
    // first batch (k = MinK = 16 for a 125-row batch), every batch pays
    // its own assignment, and the staleness trigger retrains + swaps the
    // index MID-RUN. The parameters pin the lifecycle so the oracle can
    // unroll it statically at every scale: 500 vectors (present in all
    // fixtures) in 4 batches of 125; kCap=18 with bound=1.2 fires the
    // one-and-only swap after batch 2 (trigger at n ≥ ceil(1.2·16²) =
    // 308 admitted, reachable only once three batches landed; k' =
    // clampK(n ≥ 308) = 18 is cap-pinned for every n ≥ 290, so the
    // retrained k is a constant, not data; after the swap k cannot grow
    // past the cap, so the k-unchanged guard makes further refreshes
    // impossible). Batches 0-2 are therefore decided under v0 and batch
    // 3 under v1 — including the full-index reassignment between them —
    // and the engine REQUIREs exactly that shape, so a fixture where the
    // rejection rate broke the pinned unroll fails loudly instead of
    // hash-mismatching. The DuckDB oracle replays both Lloyd trainings
    // (v0 on batch 0, v1 on the admitted index, both at sampleEvery=1,
    // 2 iterations, k-lowest-member seeds), both assignments, and the
    // sequential admission unroll per quantizer version. Redelivery of a
    // pre-swap batch after the swap must be a marker-ledger replay —
    // the exactly-once-across-swaps discipline, now on the oracled
    // surface.
    QueryDef("st_dedup_admission_refresh",
      (s, d) => {
        val tmp = Files.createTempDirectory("graft-sdr-").toString
        val vecs = table(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .filter(col("vec_id") < 500)
        val adm = new graft.streaming.SemanticAdmitter(s, tmp,
          simThreshold = 0.4, kCap = 18, stalenessBound = 1.2,
          lloydIters = 1, trainSampleEvery = 1)
        val wave = (b: Long) => vecs.filter(col("vec_id") % 4 === b)
        val outs = (0L to 3L).map(b => adm.admit(wave(b), b))
        val swapAt = outs.zipWithIndex.collect {
          case (o, i) if o.refreshed.nonEmpty => i
        }
        require(swapAt == Seq(2),
          s"oracle unrolls one swap after batch 2, engine swapped at " +
            s"$swapAt (admitted per batch: ${outs.map(_.admitted)})")
        require(adm.currentVersion == 1 && adm.currentK == 18,
          s"post-swap state v=${adm.currentVersion} k=${adm.currentK}")
        // redelivery ACROSS the swap: batch 1 was decided under a
        // quantizer that no longer exists — the completion marker makes
        // it a replay no-op, which is the whole exactly-once mechanism
        require(adm.admit(wave(1L), 1L).replayed,
          "pre-swap batch must replay via its marker after the swap")
        cleanupAfter(tmp) {
          s.read.parquet(s"$tmp/out").select(col("vec_id"),
            col("list_id").cast("long").as("list_id"),
            col("ingest_batch").cast("long").as("ingest_batch"))
        }
      },
      Some(refreshAdmissionOracleSql))
  )

  // ---- st_dedup_admission_refresh oracle ------------------------------

  /** Deterministic-Lloyd training replay over an arbitrary (vec_id, dim,
    * qx) component relation `src` — the generic form of the fixed-corpus
    * `lloydCtesFor` in [[SimilarityQueries]]: the seed is the `k`
    * LOWEST-RANKED member vec_ids (the engine's `SemanticAdmitter.seedFor`
    * — a `vec_id < k` filter would be wrong for residue-class batches and
    * hole-punched admitted sets), the sample is the full relation
    * (sampleEvery=1, what the admitter uses for both trainings here), and
    * every CTE is MATERIALIZED (DuckDB inlines plain CTEs and re-executes
    * the whole chain per reference — the round-9 gate-zeroing lesson).
    * Ends with `<pfx>c<iters>` = the trained (cent_id, dim, cs) codebook.
    */
  private def sdrLloyd(pfx: String, src: String, k: Int,
      iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""${pfx}ids AS MATERIALIZED (SELECT vec_id,
        |    row_number() OVER (ORDER BY vec_id) AS rk
        |  FROM (SELECT DISTINCT vec_id FROM $src)),
        |${pfx}n AS MATERIALIZED (SELECT vec_id, CAST(sum(qx * qx) AS BIGINT) AS n2
        |  FROM $src GROUP BY 1),
        |${pfx}c0 AS MATERIALIZED (SELECT c.vec_id AS cent_id, c.dim, c.qx AS cs
        |  FROM $src c JOIN ${pfx}ids r USING (vec_id) WHERE r.rk <= $k)"""
        .stripMargin)
    for (t <- 0 until iters) {
      sb.append(s""",
        |${pfx}cn$t AS MATERIALIZED (SELECT cent_id, CAST(sum(cs * cs) AS BIGINT) AS cn2
        |  FROM ${pfx}c$t GROUP BY 1),
        |${pfx}d$t AS MATERIALIZED (SELECT vec_id, cent_id, CAST(sum(qx * cs) AS BIGINT) AS dot
        |  FROM $src JOIN ${pfx}c$t USING (dim) GROUP BY 1, 2),
        |${pfx}a$t AS MATERIALIZED (SELECT vec_id, cent_id AS list_id FROM (
        |  SELECT d.vec_id, d.cent_id, row_number() OVER (
        |      PARTITION BY d.vec_id ORDER BY
        |      CAST(dot AS DOUBLE) / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(cc.cn2 AS DOUBLE))) DESC,
        |      d.cent_id) AS rn
        |    FROM ${pfx}d$t d JOIN ${pfx}n n ON d.vec_id = n.vec_id
        |    JOIN ${pfx}cn$t cc ON d.cent_id = cc.cent_id) WHERE rn = 1),
        |${pfx}m${t + 1} AS MATERIALIZED (SELECT list_id AS cent_id, dim,
        |    CAST(sum(qx) AS BIGINT) AS cs_new
        |  FROM $src JOIN ${pfx}a$t USING (vec_id) GROUP BY 1, 2),
        |${pfx}c${t + 1} AS MATERIALIZED (SELECT ${pfx}c$t.cent_id, ${pfx}c$t.dim,
        |    coalesce(${pfx}m${t + 1}.cs_new, ${pfx}c$t.cs) AS cs
        |  FROM ${pfx}c$t LEFT JOIN ${pfx}m${t + 1}
        |    ON ${pfx}c$t.cent_id = ${pfx}m${t + 1}.cent_id
        |   AND ${pfx}c$t.dim = ${pfx}m${t + 1}.dim)""".stripMargin)
    }
    sb.toString
  }

  /** Serving assignment of `target` (a component relation with norms in
    * `normsRel`) against codebook `cb`: argmax with the family's
    * (sim DESC, cent_id) tiebreak, ending in `<pfx>(vec_id, list_id)`. */
  private def sdrAssign(pfx: String, cb: String, target: String,
      normsRel: String): String =
    s"""${pfx}cn AS MATERIALIZED (SELECT cent_id, CAST(sum(cs * cs) AS BIGINT) AS cn2
      |  FROM $cb GROUP BY 1),
      |${pfx}d AS MATERIALIZED (SELECT vec_id, cent_id, CAST(sum(qx * cs) AS BIGINT) AS dot
      |  FROM $target JOIN $cb USING (dim) GROUP BY 1, 2),
      |$pfx AS MATERIALIZED (SELECT vec_id, cent_id AS list_id FROM (
      |  SELECT d.vec_id, d.cent_id, row_number() OVER (
      |      PARTITION BY d.vec_id ORDER BY
      |      CAST(dot AS DOUBLE) / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(cc.cn2 AS DOUBLE))) DESC,
      |      d.cent_id) AS rn
      |    FROM ${pfx}d d JOIN $normsRel n ON d.vec_id = n.vec_id
      |    JOIN ${pfx}cn cc ON d.cent_id = cc.cent_id) WHERE rn = 1)"""
      .stripMargin

  /** The full lifecycle replay: v0 Lloyd on batch 0 (k=16) → v0
    * assignment → batches 0-2 unrolled with within-batch lower-id and
    * admitted-evidence rejection (list-bounded quantized cosine ≥ 0.4) →
    * v1 Lloyd on the admitted index (k=18) → v1 reassignment → batch 3
    * unrolled under v1 — the exact sequence the engine's staleness
    * trigger and pinned parameters produce (see the QueryDef comment). */
  private lazy val refreshAdmissionOracleSql: String = {
    val th = 0.4
    val simRel = (name: String, asg: String, members: String) =>
      s"""$name AS MATERIALIZED (SELECT x.vec_id AS va, bx.bt AS ba,
        |    y.vec_id AS vb, by_.bt AS bb,
        |    CAST(CAST(list_sum(list_transform(range(1, len(x.qe) + 1),
        |      i -> x.qe[i] * y.qe[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(nx.n2 AS DOUBLE)) * sqrt(CAST(ny.n2 AS DOUBLE))) AS sm
        |  FROM $members x JOIN $asg ax ON x.vec_id = ax.vec_id
        |  JOIN $members y ON x.vec_id <> y.vec_id
        |  JOIN $asg ay ON y.vec_id = ay.vec_id AND ax.list_id = ay.list_id
        |  JOIN sdrn nx ON nx.vec_id = x.vec_id
        |  JOIN sdrn ny ON ny.vec_id = y.vec_id
        |  JOIN sdrb bx ON bx.vec_id = x.vec_id
        |  JOIN sdrb by_ ON by_.vec_id = y.vec_id)""".stripMargin
    s"""WITH sdrq AS MATERIALIZED (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qe
      |  FROM embeddings WHERE vec_id < 500),
      |sdrc AS MATERIALIZED (SELECT vec_id,
      |    unnest(range(1, len(qe) + 1)) AS dim, unnest(qe) AS qx
      |  FROM sdrq),
      |sdrn AS MATERIALIZED (SELECT vec_id, CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS n2
      |  FROM sdrq),
      |sdrb AS MATERIALIZED (SELECT vec_id, vec_id % 4 AS bt FROM sdrq),
      |sdr0src AS MATERIALIZED (SELECT c.* FROM sdrc c JOIN sdrb b USING (vec_id)
      |  WHERE b.bt = 0),
      |${sdrLloyd("v0", "sdr0src", 16, 1)},
      |${sdrAssign("asg0", "v0c1", "sdrc", "sdrn")},
      |${simRel("sim0", "asg0", "sdrq")},
      |wd0 AS MATERIALIZED (SELECT DISTINCT vb AS vec_id FROM sim0
      |  WHERE ba = bb AND va < vb AND sm >= $th),
      |aa0 AS MATERIALIZED (SELECT vec_id FROM sdrb WHERE bt = 0
      |  AND vec_id NOT IN (SELECT vec_id FROM wd0)),
      |h1 AS (SELECT DISTINCT vb AS vec_id FROM sim0 JOIN aa0
      |    ON sim0.va = aa0.vec_id WHERE bb = 1 AND sm >= $th),
      |aa1 AS MATERIALIZED (SELECT vec_id FROM sdrb WHERE bt = 1
      |  AND vec_id NOT IN (SELECT vec_id FROM wd0)
      |  AND vec_id NOT IN (SELECT vec_id FROM h1)),
      |h2 AS (SELECT DISTINCT vb AS vec_id FROM sim0
      |  WHERE bb = 2 AND sm >= $th
      |    AND va IN (SELECT vec_id FROM aa0 UNION ALL SELECT vec_id FROM aa1)),
      |aa2 AS MATERIALIZED (SELECT vec_id FROM sdrb WHERE bt = 2
      |  AND vec_id NOT IN (SELECT vec_id FROM wd0)
      |  AND vec_id NOT IN (SELECT vec_id FROM h2)),
      |idx2 AS MATERIALIZED (SELECT vec_id FROM aa0
      |  UNION ALL SELECT vec_id FROM aa1
      |  UNION ALL SELECT vec_id FROM aa2),
      |sdr1src AS MATERIALIZED (SELECT c.* FROM sdrc c JOIN idx2 USING (vec_id)),
      |${sdrLloyd("v1", "sdr1src", 18, 1)},
      |sdr1tgt AS MATERIALIZED (SELECT c.* FROM sdrc c
      |  JOIN sdrb b USING (vec_id)
      |  WHERE b.bt = 3 OR c.vec_id IN (SELECT vec_id FROM idx2)),
      |${sdrAssign("asg1", "v1c1", "sdr1tgt", "sdrn")},
      |sdr1mem AS MATERIALIZED (SELECT q.* FROM sdrq q JOIN sdrb b USING (vec_id)
      |  WHERE b.bt = 3 OR q.vec_id IN (SELECT vec_id FROM idx2)),
      |${simRel("sim1", "asg1", "sdr1mem")},
      |wd3 AS MATERIALIZED (SELECT DISTINCT vb AS vec_id FROM sim1
      |  WHERE ba = 3 AND bb = 3 AND va < vb AND sm >= $th),
      |h3 AS (SELECT DISTINCT vb AS vec_id FROM sim1
      |  WHERE bb = 3 AND sm >= $th
      |    AND va IN (SELECT vec_id FROM idx2)),
      |aa3 AS MATERIALIZED (SELECT vec_id FROM sdrb WHERE bt = 3
      |  AND vec_id NOT IN (SELECT vec_id FROM wd3)
      |  AND vec_id NOT IN (SELECT vec_id FROM h3))
      |SELECT b.vec_id, CAST(a.list_id AS BIGINT) AS list_id,
      |  CAST(b.bt AS BIGINT) AS ingest_batch
      |FROM sdrb b JOIN idx2 USING (vec_id) JOIN asg0 a USING (vec_id)
      |UNION ALL
      |SELECT b.vec_id, CAST(a.list_id AS BIGINT) AS list_id,
      |  CAST(3 AS BIGINT) AS ingest_batch
      |FROM sdrb b JOIN aa3 USING (vec_id) JOIN asg1 a USING (vec_id)"""
      .stripMargin
  }
}
