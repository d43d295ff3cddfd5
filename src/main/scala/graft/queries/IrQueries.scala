package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Information-retrieval operators over `documents` — the search side of a
  * training-data pipeline (reference scope: the docs call out "transform
  * data / connect to a warehouse" as the intended extension point,
  * `/root/reference/README.md:159-163`): TF-IDF keyword extraction, BM25
  * ranked retrieval, and an inverted index with a document-frequency guard,
  * plus a deterministic stratified sampler over `events`.
  *
  * Scale shape shared by all four:
  *  - tokenization is a per-row lambda over the codegen'd `split` — no UDF,
  *    no shuffle until the first groupBy;
  *  - every per-term statistics table (df, idf) is vocabulary-sized, so it
  *    is always the BROADCAST side of its join — the corpus-sized token
  *    stream is never shuffled twice;
  *  - posting-list materialization is bounded BEFORE collect_list by the
  *    df-guard (the stop-list discipline: a term appearing in half the
  *    corpus has a useless, unboundedly large posting list — record its df,
  *    never its postings);
  *  - the sampler uses the native [[graft.plans.GroupTopK]] bounded-heap
  *    operator: O(n log k) per partition with partial top-k before the
  *    shuffle never materializes a per-stratum sort of the full corpus.
  *
  * Determinism (oracle hash-matches): `ln` is transcendental and Java
  * `Math.log` vs DuckDB `ln` differ in the last ulp on ~0.06% of inputs
  * (measured), so every score that crosses the oracle boundary is
  * quantized to integer milli-units — `CAST(round(score * 1000) AS
  * BIGINT)` — where a 1-ulp input wobble (~1e-13 relative) cannot flip the
  * rounded value. Rankings order by the quantized score with a term/doc_id
  * tiebreak, never by the raw double.
  */
object IrQueries {
  import Q._

  /** Non-empty whitespace tokens: (doc_id, term). */
  private def tokens(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), x -> x <> '')")).as("term"))

  private val TokSql =
    """tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
      |    x -> x <> '')) AS term
      |  FROM documents)""".stripMargin

  /** Adjacent-token bigrams: (doc_id, term). */
  private def bigrams(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x <> '')").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))"))
          .as("term"))
      // no bigram is ever null (indices stay in bounds), but Catalyst
      // can't prove it: the downstream equi-join would push its own
      // isnotnull(term) into ONE branch, de-identifying the aggregate
      // subtrees and blocking exchange reuse — filter here so every
      // branch shares the same subtree
      .filter(col("term").isNotNull)

  private val BigramSql =
    """raw AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents),
      |bg AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS term
      |  FROM raw WHERE len(t) >= 2)""".stripMargin

  /** BM25 query terms (fixed, present in the corpus vocabulary) and
    * standard parameters k1=1.2, b=0.75 — folded into the expression as
    * literals so both dialects parse identical doubles.
    */
  private val BmTerms = Seq("merge", "scan", "filter")

  /** Per-(doc, term) BM25 partial score quantized to integer milli,
    * persisted once per (session, dataset) — shared by the query-
    * expansion pipeline (all three of its stages) and the retrieval
    * eval. Quantizing BEFORE any cross-term sum keeps every downstream
    * total an order-free long. */
  private def bm25Milli(s: SparkSession, d: String): DataFrame =
    cached(s, d, "ir_bm25_milli") {
      val tok = tokens(s, d)
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(sum("dl").as("sum_dl"),
        count(lit(1)).as("n_docs"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfT = tf.filter(col("tf") >= 1)
        .groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(dfT, "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("n_docs"),
          expr("""CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
            |((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 *
            |  (dl / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
            |* 1000) AS BIGINT)""".stripMargin).as("milli"))
    }

  val defs: Seq[QueryDef] = Seq(

    // Top-3 TF-IDF keywords per document. tf is one hash-shuffle of the
    // token stream on (doc_id, term); df is vocabulary-sized and
    // broadcast; the per-doc ranking runs over <= |vocab| rows per doc.
    // idf = ln((N+1)/(df+1)) quantized to milli-units (see object doc).
    QueryDef("text_tfidf_topk",
      (s, d) => {
        val tok = tokens(s, d)
        val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // df derives FROM tf (one row per (doc, term) already), so the
        // token stream is tokenized and shuffled exactly once. The
        // always-true filter is load-bearing: it forces the rollup branch
        // to consume tf's count column, keeping both branches' aggregate
        // subtrees IDENTICAL — otherwise column pruning specializes them
        // and exchange reuse can't kick in (two full corpus scans).
        val dfT = tf.filter(col("tf") >= 1)
          .groupBy("term").agg(count(lit(1)).as("df"))
        val n = table(s, d, "documents").agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score_milli").desc, col("term"))
        tf.join(broadcast(dfT), "term")
          .crossJoin(broadcast(n))
          .withColumn("score_milli",
            expr("CAST(round(tf * ln((n_docs + 1.0) / (df + 1.0)) * 1000) AS BIGINT)"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("doc_id", "term", "tf", "score_milli", "rnk")
      },
      Some(s"""WITH $TokSql,
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, term, tf,
        |    CAST(round(tf * ln((n_docs + 1.0) / (df + 1.0)) * 1000) AS BIGINT) AS score_milli
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |rk AS (SELECT doc_id, term, tf, score_milli,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score_milli DESC, term) AS BIGINT) AS rnk
        |  FROM sc)
        |SELECT doc_id, term, tf, score_milli, rnk FROM rk WHERE rnk <= 3""".stripMargin)),

    // BM25 ranked retrieval for a fixed 3-term query: score each document
    // holding at least one query term, return the top 20. The per-term
    // partial scores are pivoted into columns and added in FIXED operand
    // order (s1 + s2 + s3) — never summed as an aggregate over doubles,
    // which would be partition-order-dependent. dl/avgdl come from exact
    // integer token counts; the only transcendental is the idf ln,
    // quantized after the fixed-order sum.
    QueryDef("text_bm25_search",
      (s, d) => {
        val tok = tokens(s, d)
        val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(sum("dl").as("sum_dl"), count(lit(1)).as("n_docs"))
        val qtok = tok.filter(col("term").isin(BmTerms: _*))
        val tf = qtok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // tf-consuming no-op filter: same exchange-reuse trick as tfidf
        val dfT = tf.filter(col("tf") >= 1)
          .groupBy("term").agg(count(lit(1)).as("df"))
        val scored = tf.join(broadcast(dfT), "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("score", expr(
            """ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
              |((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 *
              |  (dl / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))"""
              .stripMargin))
        val parts = BmTerms.zipWithIndex.map { case (t, i) =>
          coalesce(max(when(col("term") === t, col("score"))), lit(0.0))
            .as(s"s$i")
        }
        val pivoted = scored.groupBy("doc_id").agg(parts.head, parts.tail: _*)
        // top-20 via orderBy+limit, which plans as TakeOrdered (each
        // partition keeps 20, one bounded merge) — a global row_number
        // window here would funnel every matched doc through a single
        // partition, the exact cliff TotalOrder/GroupTopK exist to avoid.
        // The rank window then runs over the 20 survivors only.
        val w = Window.orderBy(col("score_milli").desc, col("doc_id"))
        pivoted
          .withColumn("score_milli",
            expr("CAST(round((s0 + s1 + s2) * 1000) AS BIGINT)"))
          .orderBy(col("score_milli").desc, col("doc_id"))
          .limit(20)
          .withColumn("rnk", row_number().over(w).cast("long"))
          .select("doc_id", "score_milli", "rnk")
      },
      Some(s"""WITH $TokSql,
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        |st AS (SELECT sum(dl) AS sum_dl, count(*) AS n_docs FROM dl),
        |qt AS (SELECT * FROM tok WHERE term IN ('merge', 'scan', 'filter')),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM qt GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM qt GROUP BY 1),
        |sc AS (SELECT doc_id, term,
        |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |    ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 *
        |      (dl / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS score
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |pv AS (SELECT doc_id,
        |    coalesce(max(CASE WHEN term = 'merge' THEN score END), 0.0) AS s0,
        |    coalesce(max(CASE WHEN term = 'scan' THEN score END), 0.0) AS s1,
        |    coalesce(max(CASE WHEN term = 'filter' THEN score END), 0.0) AS s2
        |  FROM sc GROUP BY 1),
        |rk AS (SELECT doc_id,
        |    CAST(round((s0 + s1 + s2) * 1000) AS BIGINT) AS score_milli,
        |    CAST(row_number() OVER (ORDER BY
        |      CAST(round((s0 + s1 + s2) * 1000) AS BIGINT) DESC, doc_id)
        |      AS BIGINT) AS rnk
        |  FROM pv)
        |SELECT doc_id, score_milli, rnk FROM rk WHERE rnk <= 20""".stripMargin)),

    // Inverted index over word BIGRAMS with a df-guard: every term records
    // its document frequency and total occurrences; only terms with
    // df <= 40 materialize a posting list (sorted doc_ids, comma-joined).
    // The guard runs BEFORE collect_list — the unbounded-group skew risk
    // (a stopword-grade term's postings) is filtered out by a broadcast
    // semi-join on the vocabulary-sized df table, so no aggregation buffer
    // ever exceeds 40 entries per key.
    QueryDef("text_inverted_index",
      (s, d) => {
        val bg = bigrams(s, d)
        // one shuffle of the bigram stream on (term, doc); df and
        // n_total are term-level rollups of that aggregate (reused
        // exchange), never a second pass over the corpus
        val perDoc = bg.groupBy("term", "doc_id")
          .agg(count(lit(1)).as("occ"))
        val stats = perDoc.groupBy("term").agg(
          count(lit(1)).as("df"), sum(col("occ")).as("n_total"))
        // occ-consuming no-op filter keeps this branch's aggregate
        // subtree identical to stats' input, so the (term, doc) exchange
        // is computed once and reused
        val small = perDoc.filter(col("occ") >= 1)
          .join(broadcast(stats.filter(col("df") <= 40).select("term")), "term")
          .groupBy("term")
          .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
          .select(col("term"),
            expr("array_join(transform(docs, x -> CAST(x AS STRING)), ',')")
              .as("postings"))
        stats.join(small, Seq("term"), "left")
          .select("term", "df", "n_total", "postings")
      },
      Some(s"""WITH $BigramSql,
        |st AS (SELECT term, count(*) AS n_total,
        |    count(DISTINCT doc_id) AS df FROM bg GROUP BY 1),
        |pd AS (SELECT DISTINCT term, doc_id FROM bg),
        |sm AS (SELECT term,
        |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |  FROM pd JOIN st USING (term) WHERE df <= 40 GROUP BY term)
        |SELECT term, df, n_total, postings
        |FROM st LEFT JOIN sm USING (term)""".stripMargin)),

    // PSEUDO-RELEVANCE FEEDBACK (Rocchio-style query expansion), the
    // classic two-pass retrieval composition: BM25 with the fixed seed
    // query → top-10 feedback docs → top-3 expansion terms by TF-IDF
    // weight inside the feedback set (seeds excluded; no df stop-guard
    // is needed here — the candidate pool is bounded by |feedback| x
    // terms-per-doc regardless, and the idf factor already down-weights
    // corpus-common terms in the ranking) →
    // re-retrieve with the expanded query. Everything is ONE declarative
    // plan — no driver loop: the per-(doc, term) BM25 score quantizes to
    // integer MILLI before any cross-term sum, so the dynamic-term
    // totals are order-free LONG sums (the fixed-operand pivot trick
    // text_bm25_search uses cannot work here — the expansion terms are
    // data-dependent). The scored (doc, term) table is persisted once
    // and read by all three stages; feedback/expansion sets are ≤10/≤3
    // rows and broadcast; both top-k's are TakeOrdered.
    QueryDef("ir_query_expansion",
      (s, d) => {
        import s.implicits._
        val bm = bm25Milli(s, d)
        val fb = bm.filter(col("term").isin(BmTerms: _*))
          .groupBy("doc_id").agg(sum("milli").as("s1"))
          .orderBy(col("s1").desc, col("doc_id")).limit(10)
          .select("doc_id")
        val cand = bm.join(broadcast(fb), "doc_id")
          .filter(!col("term").isin(BmTerms: _*))
          .groupBy("term")
          .agg(sum(expr(
            "CAST(round(tf * ln((n_docs + 1.0) / (df + 1.0)) * 1000) AS BIGINT)"))
            .as("w"))
        val wR = Window.orderBy(col("w").desc, col("term"))
        val exp3 = cand.orderBy(col("w").desc, col("term")).limit(3)
          .withColumn("rnk", row_number().over(wR).cast("long"))
        val es = exp3.agg(concat_ws(",",
          max(when(col("rnk") === 1, col("term"))),
          max(when(col("rnk") === 2, col("term"))),
          max(when(col("rnk") === 3, col("term")))).as("expansion"))
        val finalTerms = BmTerms.toDF("term").union(exp3.select("term"))
        val wF = Window.orderBy(col("score_milli").desc, col("doc_id"))
        bm.join(broadcast(finalTerms), "term")
          .groupBy("doc_id").agg(sum("milli").as("score_milli"))
          .orderBy(col("score_milli").desc, col("doc_id")).limit(20)
          .withColumn("rnk", row_number().over(wF).cast("long"))
          .crossJoin(broadcast(es))
          .select("doc_id", "score_milli", "rnk", "expansion")
      },
      Some(s"""WITH $TokSql,
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        |st AS (SELECT sum(dl) AS sum_dl, count(*) AS n_docs FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |bm AS (SELECT doc_id, term, tf, df, n_docs,
        |    CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |    ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 *
        |      (dl / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |    * 1000) AS BIGINT) AS milli
        |  FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |fb AS (SELECT doc_id FROM (
        |    SELECT doc_id, CAST(sum(milli) AS BIGINT) AS s1 FROM bm
        |    WHERE term IN ('merge', 'scan', 'filter') GROUP BY 1
        |    ORDER BY s1 DESC, doc_id LIMIT 10)),
        |cand AS (SELECT term, CAST(sum(
        |      CAST(round(tf * ln((n_docs + 1.0) / (df + 1.0)) * 1000) AS BIGINT)
        |    ) AS BIGINT) AS w
        |  FROM bm JOIN fb USING (doc_id)
        |  WHERE term NOT IN ('merge', 'scan', 'filter')
        |  GROUP BY 1),
        |exp3 AS (SELECT term, CAST(row_number() OVER (ORDER BY w DESC, term)
        |      AS BIGINT) AS rnk
        |  FROM (SELECT term, w FROM cand ORDER BY w DESC, term LIMIT 3)),
        |es AS (SELECT concat_ws(',',
        |    max(CASE WHEN rnk = 1 THEN term END),
        |    max(CASE WHEN rnk = 2 THEN term END),
        |    max(CASE WHEN rnk = 3 THEN term END)) AS expansion FROM exp3),
        |fin AS (SELECT doc_id, CAST(sum(milli) AS BIGINT) AS score_milli
        |  FROM bm
        |  WHERE term IN ('merge', 'scan', 'filter')
        |     OR term IN (SELECT term FROM exp3)
        |  GROUP BY 1),
        |top AS (SELECT doc_id, score_milli FROM fin
        |  ORDER BY score_milli DESC, doc_id LIMIT 20)
        |SELECT doc_id, score_milli,
        |  CAST(row_number() OVER (ORDER BY score_milli DESC, doc_id)
        |    AS BIGINT) AS rnk,
        |  expansion
        |FROM top CROSS JOIN es""".stripMargin)),

    // Deterministic stratified sample: 5 events per event_type, selected
    // by md5 of the key (a uniform, reproducible pseudo-order — no RNG
    // state, identical on re-run and in the oracle). Runs through the
    // native GroupTopK bounded-heap operator: each input partition keeps
    // only its 5 best rows per stratum before any shuffle, so the
    // full-corpus per-stratum sort a window row_number would plan never
    // happens. The tiny survivor set (strata x 5) then gets its rank from
    // an ordinary window.
    QueryDef("q_stratified_sample",
      (s, d) => {
        val base = table(s, d, "events")
          .select(col("event_id"), col("event_type"),
            concat(md5(col("event_id").cast("string")),
              lpad(col("event_id").cast("string"), 10, "0")).as("skey"))
        val top = graft.plans.GroupTopK(
          base, Seq("event_type"), "skey", k = 5, descending = false)
        val w = Window.partitionBy("event_type").orderBy("skey")
        top.withColumn("rnk", row_number().over(w).cast("long"))
          .select("event_id", "event_type", "rnk")
      },
      Some("""SELECT event_id, event_type, rnk FROM (
        |  SELECT event_id, event_type,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY md5(CAST(event_id AS VARCHAR)) ||
        |        lpad(CAST(event_id AS VARCHAR), 10, '0')) AS BIGINT) AS rnk
        |  FROM events) z
        |WHERE rnk <= 5""".stripMargin)),

    // RETRIEVAL-QUALITY EVAL — the IR twin of ann_recall_audit and
    // dedup_recall_audit (the silent-collapse guard applied to search):
    // with relevance defined by construction (a document is relevant iff
    // it contains ALL three seed terms), score the BM25 ranking by
    // reciprocal rank of the first relevant hit and recall@10/@20, all
    // in integer ppm. A ranking change that silently tanks retrieval
    // moves a measured number instead of passing unnoticed. Reuses the
    // set's persisted per-(doc, term) milli-score table; the relevant
    // set and the 20 survivors are bounded and broadcast; output is ONE
    // row regardless of corpus size.
    QueryDef("ir_bm25_eval",
      (s, d) => {
        val bm = bm25Milli(s, d)
        val rel = bm.filter(col("term").isin(BmTerms: _*))
          .groupBy("doc_id")
          .agg(countDistinct(col("term")).as("nt"))
          .filter(col("nt") === BmTerms.length)
          .select("doc_id")
        val wF = Window.orderBy(col("score_milli").desc, col("doc_id"))
        val top = bm.filter(col("term").isin(BmTerms: _*))
          .groupBy("doc_id").agg(sum("milli").as("score_milli"))
          .orderBy(col("score_milli").desc, col("doc_id")).limit(20)
          .withColumn("rnk", row_number().over(wF).cast("long"))
        // broadcast the 20-row top-k side (bounded by the LIMIT), not the
        // relevant set, whose size is corpus-dependent
        val hits = rel.join(broadcast(top.select("doc_id", "rnk")), "doc_id")
        val nRel = rel.agg(count(lit(1)).as("n_relevant"))
        hits.agg(
            min(col("rnk")).as("first_rank"),
            sum(when(col("rnk") <= 10, 1L).otherwise(0L)).as("h10"),
            count(lit(1)).as("h20"))
          .crossJoin(broadcast(nRel))
          .select(col("n_relevant"),
            coalesce(col("first_rank"), lit(0L)).as("first_rank"),
            coalesce(expr("1000000 DIV first_rank"), lit(0L)).as("rr_ppm"),
            // nullif guards the n_relevant = 0 corpus: Spark's non-ANSI
            // DIV 0 yields NULL while DuckDB's // 0 errors — nullif makes
            // both engines produce the same 0 row instead of diverging
            expr("coalesce(coalesce(h10, 0) * 1000000 DIV nullif(n_relevant, 0), 0)")
              .as("recall10_ppm"),
            expr("coalesce(coalesce(h20, 0) * 1000000 DIV nullif(n_relevant, 0), 0)")
              .as("recall20_ppm"))
      },
      Some(s"""WITH $TokSql,
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        |st AS (SELECT sum(dl) AS sum_dl, count(*) AS n_docs FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |bm AS (SELECT doc_id, term,
        |    CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |    ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 *
        |      (dl / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |    * 1000) AS BIGINT) AS milli
        |  FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |rel AS (SELECT doc_id FROM bm
        |  WHERE term IN ('merge', 'scan', 'filter')
        |  GROUP BY doc_id HAVING count(DISTINCT term) = 3),
        |topk AS (SELECT doc_id, CAST(row_number() OVER (
        |      ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rnk
        |  FROM (SELECT doc_id, CAST(sum(milli) AS BIGINT) AS score_milli
        |    FROM bm WHERE term IN ('merge', 'scan', 'filter')
        |    GROUP BY 1 ORDER BY score_milli DESC, doc_id LIMIT 20)),
        |nr AS (SELECT CAST(count(*) AS BIGINT) AS n_relevant FROM rel),
        |h AS (SELECT min(rnk) AS first_rank,
        |    CAST(sum(CASE WHEN rnk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS h10,
        |    CAST(count(*) AS BIGINT) AS h20
        |  FROM topk JOIN rel USING (doc_id))
        |SELECT n_relevant,
        |  CAST(coalesce(first_rank, 0) AS BIGINT) AS first_rank,
        |  CAST(coalesce(1000000 // first_rank, 0) AS BIGINT) AS rr_ppm,
        |  coalesce(coalesce(h10, 0) * 1000000 // nullif(n_relevant, 0), 0)
        |    AS recall10_ppm,
        |  coalesce(coalesce(h20, 0) * 1000000 // nullif(n_relevant, 0), 0)
        |    AS recall20_ppm
        |FROM h, nr""".stripMargin)))
}
