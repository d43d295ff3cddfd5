package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan invariants for the registered queries — the properties
  * that make these plans survive a 100× scale-up. Regressions here (a lost
  * pushdown, a join that stops broadcasting, an accidental cartesian) are
  * performance bugs even when results stay correct, so they're tested like
  * correctness.
  */
class PlanQualitySpec extends SparkSpec {

  // Default: the smallest standard fixture (plan shape is data-independent
  // for everything asserted here, so the cheap fixture suffices). The
  // measured-scaling harness overrides this to a generated 10x/30x corpus
  // (graft.ScaleGen output) to prove the SAME invariants hold when the
  // optimizer sees large files — a stats-driven broadcast that silently
  // degrades to a shuffle join at scale would fail here by name.
  private val dir =
    sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/root/testdata/sf0.001")

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("GLOBAL: no cartesian product and no Scala UDF in ANY registered query plan") {
    // the standing guarantee behind the per-query spot checks: every
    // cross-shaped join in the engine is a broadcast attach
    // (BroadcastNestedLoopJoin over a bounded side), never a
    // CartesianProduct, and every scalar extension is a native codegen
    // Expression, never a ScalaUDF. Sweeps all registered queries at
    // sf0.001 — a future query that regresses either invariant fails
    // here by name.
    val offenders = SparkEntry.all.map(_.name).flatMap { name =>
      val p = plan(name)
      val bad = Seq(
        "CartesianProduct" -> p.contains("CartesianProduct"),
        "ScalaUDF" -> p.contains("ScalaUDF"))
        .collect { case (tag, true) => tag }
      if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"plan invariant violations:\n${offenders.mkString("\n")}")
  }

  test("count-min build hashes each key once (single sha2 in the plan)") {
    // the d row-buckets derive arithmetically from ONE 48-bit sha prefix
    // (double hashing); a regression back to per-row sha2("j:key") would
    // show d=4 sha2 calls in the sketch-build projection
    val p = plan("q_cms_heavy")
    val shaCalls = p.split("sha2\\(").length - 1
    // one in the sketch build + one in the (10-row) estimate probe side
    assert(shaCalls <= 2, s"expected at most 2 sha2 sites, found $shaCalls:\n$p")
  }

  test("mp4 indexing is pure partition-local work (no body exchange)") {
    // write → box-walk → slice happens inside one mapPartitions; the only
    // acceptable Exchange is the driver-contract output sort (one node,
    // which formatted explain prints twice: tree + detail). Any third
    // occurrence means the indexing itself started shuffling.
    val p = plan("multimodal_mp4_index")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 2,
      s"mp4 indexing must not shuffle beyond the contract sort:\n$p")
  }

  test("contrastive mining broadcasts the anchor batch, never the corpus") {
    val p = plan("corpus_contrastive_pairs")
    assert(p.contains("BroadcastHashJoin"),
      s"anchor batch must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian in contrastive mining:\n$p")
    // the probe-bounded variant generates candidates through an EQUI-join
    // on list_id (probe table broadcast into the partitioned assignment)
    // — a non-equi theta join against the corpus would mean the bound
    // regressed to a full scan
    val pp = plan("corpus_contrastive_probe")
    assert(pp.contains("BroadcastHashJoin"),
      s"probe tables must broadcast:\n$pp")
    assert(!pp.contains("CartesianProduct") &&
      !pp.contains("BroadcastNestedLoopJoin"),
      s"probe candidate generation must stay an equi-join:\n$pp")
  }

  test("filters reach the parquet scan (predicate pushdown)") {
    val q1 = plan("q1_pricing_summary")
    assert(q1.contains("LessThanOrEqual(l_shipdate"), "q1 shipdate filter must push down")
    val s1 = plan("s1_source_scan")
    assert(s1.contains("EqualTo(event_type,click)"), "s1 event_type filter must push down")
  }

  test("scans read only the needed columns (pruning)") {
    val q1 = plan("q1_pricing_summary")
    // 7 of 11 lineitem columns are needed; the scan schema must not
    // mention the partkey/suppkey/linenumber family at all
    assert(!q1.contains("l_partkey") && !q1.contains("l_suppkey"),
      "q1 must prune unused lineitem columns")
    val s5 = plan("s5_envelope_decode")
    assert(!s5.contains("event_type") && !s5.contains("user_id"),
      "s5 must prune all but event_id/props")
  }

  test("small sides broadcast; anti-join stays broadcast") {
    assert(plan("f4_d1_idempotent_skip").contains("BroadcastHashJoin"),
      "idempotency anti-join must broadcast the done-keys side")
    assert(plan("q3_top_orders").contains("BroadcastHashJoin"),
      "q3 customer dimension must broadcast")
    assert(plan("q5_region_revenue").contains("BroadcastHashJoin"),
      "q5 dimensions must broadcast")
  }

  test("no unintended cartesian products") {
    Seq("dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_embedding_lsh",
      "q_sessionize", "s6_merge_coalesce").foreach { q =>
      assert(!plan(q).contains("CartesianProduct"),
        s"$q must not plan a cartesian product")
    }
    // the brute-force ANN pair join is intentionally non-equi but must be
    // a BROADCAST nested loop (q side is tiny), never a full cartesian
    val ann = plan("ann_cosine_topk")
    assert(ann.contains("BroadcastNestedLoopJoin") && !ann.contains("CartesianProduct"),
      "ann brute force must broadcast the query vectors")
  }

  test("no registered query plans an unbounded all-pairs join") {
    // every non-equi join in the contract must broadcast a BOUNDED side —
    // O(c·n), linear in the corpus; a plain CartesianProduct or a
    // nested-loop over two corpus-sized sides is the 100 TB anti-pattern
    SparkEntry.queries.keys.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q plans a CartesianProduct:\n$p")
    }
    // the exact embedding-dedup fixture must bound+broadcast its probe side
    val ded = plan("dedup_embedding_cosine")
    assert(ded.contains("BroadcastNestedLoopJoin"),
      "dedup_embedding_cosine must broadcast its bounded probe side")
    assert(ded.contains("LessThan(vec_id,128)") || ded.contains("vec_id < 128")
      || ded.contains("(vec_id#"), // pushed filter rendering differs by version
      s"dedup_embedding_cosine must bound the probe side:\n$ded")
  }

  test("ngram-jaccard join input is document-frequency bounded") {
    // the gram self-join must consume the df-filtered gram set: without
    // the bound, one hot gram makes the join quadratic in its frequency
    val p = plan("dedup_ngram_jaccard")
    assert(p.contains(s"<= ${graft.queries.DedupQueries.MaxGramDf}"),
      s"gram df-bound filter missing from plan:\n$p")
  }

  test("corpus ops keep their scale shape: broadcast probe, pruned scan") {
    // decontamination must stream the corpus through a BROADCAST join
    // against the (bounded) eval gram set — a shuffled join would move
    // the whole corpus gram explosion
    val deco = plan("corpus_decontaminate")
    assert(deco.contains("BroadcastHashJoin"),
      "corpus_decontaminate must broadcast the eval gram set")
    // the mix sample reads doc_id/lang/source only — scanning `text`
    // for a sampling decision would read the whole corpus body
    val mix = plan("corpus_mix_sample")
    assert(!mix.contains("text"),
      "corpus_mix_sample must not scan the text column")
    // repetition is per-row array work: no Exchange anywhere before the
    // contract ORDER BY (one shuffle-free pass over the corpus)
    // formatted explain mentions each node twice (tree + detail), so one
    // physical Exchange — the final contract sort — appears twice
    val rep = plan("text_repetition")
    val bodyExchanges = rep.split("Exchange").length - 1
    assert(bodyExchanges <= 2,
      s"text_repetition should be shuffle-free up to the sort:\n$rep")
  }

  test("incremental dedup broadcasts the batch side, never the corpus") {
    val p = plan("dedup_incremental")
    assert(p.contains("BroadcastHashJoin"),
      s"batch-signature joins must broadcast the small batch side:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("session windows prune the events scan to user_id + ts") {
    val p = plan("st_session_window")
    assert(!p.contains("event_type") && !p.contains("props"),
      s"st_session_window must not scan unused event columns:\n$p")
  }

  test("aggregates are partial (map-side combine) before the shuffle") {
    val q1 = plan("q1_pricing_summary")
    assert(q1.contains("partial_sum") || q1.contains("Partial"),
      "q1 must partial-aggregate before exchanging")
  }

  test("top-k order+limit plans as TakeOrdered, not a global sort") {
    val q3 = plan("q3_top_orders")
    assert(q3.contains("TakeOrderedAndProject"),
      "q3's ORDER BY + LIMIT 10 must plan as TakeOrderedAndProject")
  }

  test("q6 is a pure pushed-down scan-aggregate (no join, no wide shuffle)") {
    val q6 = plan("q6_forecast_revenue")
    assert(q6.contains("GreaterThanOrEqual(l_shipdate") &&
      q6.contains("LessThan(l_quantity"),
      "q6 range + quantity filters must reach the parquet scan")
    assert(!q6.contains("Join"), "q6 must not plan any join")
    assert(!q6.contains("l_orderkey") && !q6.contains("l_tax"),
      "q6 must prune all but shipdate/discount/quantity/extendedprice")
  }

  test("q10 broadcasts nation and plans deterministic top-20") {
    val q10 = plan("q10_returned_revenue")
    assert(q10.contains("BroadcastHashJoin"), "q10 nation must broadcast")
    assert(q10.contains("TakeOrderedAndProject"),
      "q10 top-20 must not be a global sort")
    assert(q10.contains("EqualTo(l_returnflag,R)"),
      "q10 returnflag filter must push down")
  }

  test("q22's scalar threshold broadcasts; idle filter stays anti-join") {
    val q22 = plan("q22_idle_customers")
    assert(!q22.contains("CartesianProduct"),
      "the 1-row threshold join must broadcast, not cartesian")
    assert(q22.contains("LeftAnti"), "no-recent-orders must be an anti-join")
    assert(q22.contains("GreaterThanOrEqual(o_orderdate"),
      "the recent-orders date filter must push down")
  }

  test("q16 distinct-agg is two-phase; exclusion stays a broadcast anti-join") {
    val q16 = plan("q16_supplier_diversity")
    assert(q16.contains("BroadcastHashJoin") &&
      q16.contains("LeftAnti"),
      "supplier exclusion must broadcast as an anti-join")
    assert(q16.contains("GreaterThanOrEqual(p_size,20)"),
      "part size filter must push to the part scan")
    // count(DISTINCT) after a join: partial aggregation must appear below
    // the final aggregate (two-phase distinct, not row-level distinct)
    assert(q16.contains("partial_count") || q16.contains("Partial"),
      "distinct count must partial-aggregate")
  }

  test("q19 OR-of-ANDs: CNF extraction pushes both per-side disjunctions") {
    val q19 = plan("q19_or_brands")
    // the part-only disjunction (brand/size) must reach the part scan and
    // the lineitem-only disjunction (quantity bands) the lineitem scan —
    // without CNF conversion every part row survives to the join
    assert(q19.contains("EqualTo(p_brand,Brand#12)"),
      "part-side OR branches must push to the part scan")
    assert(q19.contains("LessThanOrEqual(l_quantity,11.0)"),
      "lineitem-side quantity bands must push to the lineitem scan")
    assert(q19.contains("BroadcastHashJoin"),
      "the pre-filtered part side must broadcast")
  }

  test("q21 EXISTS/NOT-EXISTS pair plans as semi + anti joins") {
    val q21 = plan("q21_waiting_supplier")
    assert(q21.contains("LeftSemi"), "EXISTS must become a left-semi join")
    assert(q21.contains("LeftAnti"), "NOT EXISTS must become a left-anti join")
    assert(q21.contains("EqualTo(o_orderstatus,F)"),
      "order status filter must push to the orders scan")
  }

  test("q2 window-min computes the candidate set once") {
    val q2 = plan("q2_min_supplier")
    // the correlated-subquery form would inline the candidate CTE twice
    // (two part⋈lineitem⋈supplier subtrees); the window form must keep a
    // single part scan with the size filter pushed
    assert(q2.contains("GreaterThanOrEqual(p_size,45)"),
      "part size filter must push down")
    assert("GreaterThanOrEqual\\(p_size,45\\)".r.findAllIn(q2).size == 1,
      "candidate set must be computed once, not per subquery branch")
  }

  test("stream-stream join shape: equi key with range residual, not a loop") {
    val ssj = plan("st_stream_join")
    assert(ssj.contains("SortMergeJoin") || ssj.contains("ShuffledHashJoin") ||
      ssj.contains("BroadcastHashJoin"),
      "attribution join must hash/merge on user_id, never nested-loop")
    assert(ssj.contains("EqualTo(event_type,view)") ||
      ssj.contains("EqualTo(event_type,purchase)"),
      "event_type filters must push to the events scan")
  }

  test("IR queries tokenize and shuffle the corpus once (reused exchange)") {
    // df/n_total statistics roll up FROM the (doc, term) aggregate; a
    // second tokenize+shuffle of the corpus would show as a second full
    // Exchange subtree instead of a ReusedExchange. AQE performs the
    // reuse at stage materialization, so execute first and read the
    // final adaptive plan.
    Seq("text_tfidf_topk", "text_inverted_index").foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("ReusedExchange"),
        s"$q must reuse the token-stream exchange for its term rollup")
    }
    // bm25's corpus-sized top-20 must plan as TakeOrdered (per-partition
    // top-k + bounded merge), never a global row_number window
    assert(plan("text_bm25_search").contains("TakeOrdered"),
      "bm25 must select its top-20 via TakeOrdered, not a global window")
  }

  test("skew profile ranks group sizes without a global window") {
    val p = plan("dq_skew_profile")
    assert(!p.contains("Window"),
      "the group-size ranking must use the distributed total-order rank, " +
        "never a row_number window over all keys")
  }

  test("streaming state operators plan their state shape") {
    // batch-planned flatMapGroupsWithState lowers to MapGroups; the
    // streaming form is StreamingAnalyticsSpec's job
    assert(plan("st_heavy_hitters").contains("MapGroups"),
      "streaming heavy hitters must plan through the grouped-state path")
    val soj = plan("st_stream_join_outer")
    assert(soj.contains("LeftOuter"),
      "outer attribution join must keep its left-outer type")
  }

  test("zorder profile: one corpus pass, broadcast scalar sides") {
    val p = plan("q_zorder_buckets")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row max side must broadcast")
    assert(!p.contains("CartesianProduct"),
      "scalar cross join must not plan a shuffled cartesian")
  }

  test("scd2 build shares one user_id exchange across both windows") {
    val p = plan("q_scd2_dim")
    // change-filter window and interval/version window have identical
    // partitioning + ordering: Catalyst must plan a single user_id hash
    // Exchange (the orderBy wrapper in the driver contract adds the final
    // range exchange; no second hash exchange may appear). Formatted
    // explain puts partitionings on Arguments: lines, so count the
    // partitioning spellings themselves, not 'Exchange <partitioning>'.
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1,
      s"expected exactly one hash exchange:\n$p")
    assert("rangepartitioning\\(".r.findAllIn(p).size <= 1,
      s"expected at most the output-sort range exchange:\n$p")
    assert(p.contains("hashpartitioning(user_id"),
      "scd2 windows must partition by user_id")
  }

  test("anomaly flags broadcast the per-type stats back onto hours") {
    val p = plan("q_anomaly_hours")
    assert(p.contains("BroadcastHashJoin"),
      "the 5-row per-type stats side must broadcast")
    // the hourly rollup must combine map-side before its shuffle
    assert(p.contains("partial_count") || p.contains("Partial"),
      "hourly rollup must be a partial aggregate")
  }

  test("rolling window pre-aggregates days before the frame scan") {
    val p = plan("q_rolling_window")
    // the RANGE frame must consume the daily rollup, not raw events: a
    // partial-aggregated daily series, window keyed on user_id, and the
    // purchase filter pushed to the scan. Exactly two hash exchanges —
    // the (user_id, day) rollup of raw events and the daily series'
    // re-shuffle to user_id (see the query comment for why that beats
    // a single raw-event shuffle)
    // the rollup exchange keys (user_id, day) — day may print as an
    // aliased _groupingexpression — and the window exchange keys user_id
    // alone: tell them apart by key count (trailing arg is numPartitions)
    val hashParts = "hashpartitioning\\([^)]*\\)".r.findAllIn(p).toSeq
    assert(hashParts.size == 2 &&
      hashParts.count(_.count(_ == ',') == 2) == 1 &&
      hashParts.count(_.count(_ == ',') == 1) == 1,
      s"expected the rollup + window exchanges, got $hashParts")
    assert(p.contains("Window") && (p.contains("partial_sum") || p.contains("Partial")),
      "window frame must read a pre-aggregated daily series")
    assert(p.contains("EqualTo(event_type,purchase)"),
      "purchase filter must push down to the events scan")
  }

  test("gap fill generates the spine distributed and joins without cartesian") {
    val p = plan("q_gap_fill")
    assert(p.contains("Generate"),
      "the hour spine must come from a distributed sequence+explode")
    assert(!p.contains("CartesianProduct"))
  }

  test("semantic dedup joins within lists and keeps the verdict broadcast") {
    val p = plan("dedup_semantic")
    // the within-list pair join is an equi-join on list_id; the dropped
    // set (bounded by near-dup count) must come back as a broadcast join
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "list pair search must be an equi-join")
    assert(!p.contains("CartesianProduct"))
  }

  test("bloom decontamination ships positions, not gram strings") {
    val p = plan("corpus_decontaminate_bloom")
    // the fixed-size filter side must broadcast; membership is a
    // broadcast hash join on (j, pos) — never a shuffle of corpus grams
    // against the benchmark side
    assert(p.contains("BroadcastHashJoin"),
      s"bloom membership must be a broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("graph-ANN search broadcasts frontiers; the corpus never re-shuffles") {
    val p = plan("ann_graph_topk")
    // every per-hop join (frontier x adjacency, candidates x corpus,
    // candidates x queries) keeps the tiny side broadcast
    assert(p.contains("BroadcastHashJoin"),
      s"beam search joins must broadcast the frontier side:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("bpe training returns the bounded merge table — no corpus in the result plan") {
    // each round's corpus work happens in its own bounded job (one
    // map-side-combined pair aggregation + a 1-row argmax collect); the
    // REGISTERED result must be the ≤8-row merge table the driver built
    // from those single rows, never a plan that re-reads the corpus
    val p = plan("text_bpe_train")
    assert(p.contains("LocalTableScan"),
      s"bpe result must be the driver-held merge rows:\n$p")
    assert(!p.contains("Scan parquet"),
      s"bpe result plan must not re-read the corpus:\n$p")
  }

  test("quality pruning: histogram rollup feeds the windows, thresholds broadcast back") {
    val p = plan("corpus_quality_prune")
    // the quantile windows run over the bounded (lang, score) HISTOGRAM —
    // the histogram aggregate must map-side combine below them, and the
    // per-language thresholds must come back onto the corpus as a
    // broadcast join, never a shuffle of the scored corpus
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"histogram must partial-aggregate before the quantile walk:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"thresholds must broadcast back onto the corpus:\n$p")
    // exactly one corpus-side hash exchange (the histogram rollup):
    // a second one would mean the scored corpus itself is shuffling
    val hashParts = "hashpartitioning\\(".r.findAllIn(p).size
    assert(hashParts <= 2,
      s"expected only the histogram (+ window) exchanges, got $hashParts:\n$p")
  }

  test("packing and sharding read the one shared prefix-sum table") {
    // both queries derive bins from the memoized (doc_id, n_tokens, cum)
    // packing table: their plans must consume the in-memory relation, and
    // only corpus_shard_text may add a text-side scan for the re-attach
    val pack = plan("corpus_pack_bins")
    assert(pack.contains("InMemoryTableScan") ||
      pack.contains("Scan In-memory"),
      s"pack must read the shared packing table:\n$pack")
    assert(!pack.contains("Scan parquet"),
      s"pack needs no parquet beyond the cached table:\n$pack")
    val shard = plan("corpus_shard_text")
    assert(shard.contains("InMemoryTableScan") ||
      shard.contains("Scan In-memory"),
      s"shard must read the shared packing table:\n$shard")
  }

  test("bloom join pruning: three broadcast semi-joins, then prunes rows") {
    val p = plan("q_bloom_join_prune")
    // the bloom probe must be map-side: broadcast LeftSemi per hash row,
    // never a shuffle of the fact table against the filter side
    val semis = "BroadcastHashJoin LeftSemi BuildRight".r.findAllIn(p).size
    assert(semis >= 3,
      s"expected 3 broadcast semi-join bloom probes, found $semis:\n$p")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoop"),
      s"no real cartesian allowed:\n$p")
    // and the bloom genuinely prunes: candidates << fact rows, with the
    // audit columns proving no false negatives (n_exact rows all joined)
    val row = SparkEntry.queries("q_bloom_join_prune")(spark, dir)
      .select("n_bloom_pass", "n_exact").head()
    val factRows = spark.read
      .parquet(s"$dir/lineitem.parquet").count()
    assert(row.getLong(0) < factRows / 5,
      s"bloom should prune most of $factRows rows, kept ${row.getLong(0)}")
    assert(row.getLong(1) <= row.getLong(0),
      "exact matches can never exceed bloom candidates")
  }

  test("substring dedup shuffles gram hashes, windows stay doc-partitioned") {
    val p = plan("dedup_exact_substring")
    // the dup-gram shuffle key is the xxhash64 LONG, never the gram text
    assert(p.contains("xxhash64"),
      s"grams must shuffle as 64-bit hashes:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian in substring dedup:\n$p")
    // the gaps-and-islands window is partitioned by doc_id — a global
    // (SinglePartition) window would serialize the corpus on one core
    assert(!p.contains("SinglePartition"),
      s"span windows must partition by doc_id:\n$p")
  }

  test("bpe encode: merges apply to the dictionary, corpus joins broadcast") {
    val p = plan("text_bpe_encode")
    // the encoded dictionary (vocab-bounded) broadcasts; the corpus is
    // read once and never shuffles for the dictionary lookup
    assert(p.contains("BroadcastHashJoin"),
      s"encoded dictionary must broadcast:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"dictionary side must come from the cached vocab table:\n$p")
    // at most one parquet scan in the OUTER plan — the formatted explain
    // also prints the cached relation's one-time build plan, so count
    // only above the first InMemoryRelation marker
    val outer = p.substring(0, p.indexOf("InMemoryRelation"))
    val scans = "Scan parquet".r.findAllIn(outer).size
    assert(scans <= 1,
      s"corpus must be read at most once (dictionary side is cached):\n$p")
  }

  test("quality classifier returns the bounded weight table — no corpus in the result plan") {
    // each gradient round is its own bounded job (one map-side-combined
    // aggregation + a 1-row collect); the REGISTERED result must be the
    // 17 driver-held weight rows, same discipline as bpe training
    val p = plan("corpus_quality_classifier")
    assert(p.contains("LocalTableScan"),
      s"classifier result must be the driver-held weight rows:\n$p")
    assert(!p.contains("Scan parquet"),
      s"classifier result plan must not re-read the corpus:\n$p")
  }

  test("pca power iteration returns the bounded loading table — no corpus in the result plan") {
    // each round's corpus pass is its own bounded job (one map-side-
    // combined 64-column aggregation + a 1-row collect); the REGISTERED
    // result must be the 64 driver-held loading rows
    val p = plan("embedding_pca_power")
    assert(p.contains("LocalTableScan"),
      s"pca result must be the driver-held loadings:\n$p")
    assert(!p.contains("Scan parquet"),
      s"pca result plan must not re-read the corpus:\n$p")
  }

  test("source profile: ONE corpus scan; the total windows the reduced aggregate") {
    val p = plan("corpus_source_profile")
    // formatted explain prints each node in the tree AND a detail
    // section, so one physical scan appears twice
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      s"profile must scan the corpus exactly once:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian in the total attach:\n$p")
  }

  test("pca projection is a pure map over one scan (loadings are literals)") {
    val p = plan("embedding_pca_project")
    assert("Scan parquet".r.findAllIn(p).size <= 2, // tree + detail
      s"projection must be one corpus pass:\n$p")
    assert(!p.contains("Join"), s"no join — loadings travel as literals:\n$p")
  }

  test("query expansion: scored table cached once, feedback sets broadcast, top-k heaps") {
    val p = plan("ir_query_expansion")
    assert(p.contains("InMemoryTableScan"),
      s"the (doc, term) BM25-milli table must be persisted and reused:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"final top-20 must be per-partition heaps:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the expanded term set must broadcast into the scored table:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only broadcast attaches allowed:\n$p")
  }

  test("dsir sampling broadcasts the bucket table and takes top-k without a global sort") {
    val p = plan("corpus_dsir_sample")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"the 256-row bucket-score table must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-50 must be per-partition heaps, not a global sort:\n$p")
  }

  test("paragraph dedup is one hash-keyed shuffle family — no window") {
    // first-occurrence selection is a segment-hash min aggregation and the
    // verdict join rides the same hash key; a window over (hash) or a
    // corpus-wide row_number would regress the shape
    val p = plan("dedup_paragraph")
    assert(!p.contains("Window"),
      s"paragraph dedup must not plan a window:\n$p")
    assert(p.contains("HashAggregate"),
      s"first-occurrence winner must be a hash aggregation:\n$p")
  }

  test("k-anonymity audit is two hash aggregations — no window, no join") {
    val p = plan("dq_k_anonymity")
    assert(!p.contains("Window"), s"no window in the k-anonymity plan:\n$p")
    assert(!p.contains("Join"), s"no join in the k-anonymity plan:\n$p")
  }

  test("incremental join terms all stay equi-joins; the day split is a broadcast attach") {
    val p = plan("q_incr_join")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian in the delta-term union:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"the max-day scalar must broadcast:\n$p")
  }

  test("late-data ledger is one scan plus a broadcast watermark attach — no window") {
    val p = plan("st_late_data")
    assert(!p.contains("Window"), s"no window in the late-data plan:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the watermark scalar must broadcast:\n$p")
  }

  test("walk mining broadcasts frontiers into the rank-indexed adjacency") {
    val p = plan("corpus_walk_pairs")
    assert(p.contains("BroadcastHashJoin"),
      s"per-step frontiers must broadcast:\n$p")
    assert(!p.contains("SinglePartition"),
      s"the per-node rank window must stay src-partitioned:\n$p")
  }

  test("negative table: vocab aggregation, broadcast normalizer, TakeOrdered top-50") {
    val p = plan("corpus_negative_table")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-50 must be per-partition heaps, not a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the normalizer scalar must broadcast:\n$p")
  }

  test("seasonality and transitions keep their bounded-attach shapes") {
    val p = plan("q_seasonality")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"per-type totals must broadcast:\n$p")
    assert(!p.contains("Window"), s"no window in the seasonality plan:\n$p")
    val t = plan("q_event_transitions")
    assert(!t.contains("SinglePartition"),
      s"the lag window must stay user-partitioned:\n$t")
  }

  test("join-cardinality pre-flight joins histograms, never rows") {
    val p = plan("dq_join_cardinality")
    // both sides must aggregate BEFORE the join: the join's children are
    // aggregates, so the plan has exactly the two per-key HashAggregates
    // plus the final rollup — no row-level join of the base tables
    assert(p.contains("HashAggregate"), s"histogram aggs missing:\n$p")
    assert(!p.contains("Window"), s"no window needed:\n$p")
  }

  test("lift, fertility, eval and the jsonl ledger avoid cartesians and global windows") {
    for (q <- Seq("q_cooccurrence_lift", "text_tokenizer_fertility",
        "ir_bm25_eval", "embedding_matryoshka_audit")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("Window, ["), s"$q plans a window:\n$p")
    }
  }

  test("the window-topk idiom queries actually plan through the rewrite") {
    // row_number multi-key twin AND the rank() WITH-TIES twin
    for (q <- Seq("q_window_topk_rewritten", "q_window_rank_ties_rewritten")) {
      val p = plan(q)
      assert(p.contains("GroupTopK"),
        s"$q: the optimizer rewrite must replace the window:\n$p")
      assert(!p.contains("Window, ["),
        s"$q: no window may survive the rewrite (beyond the contract sort):\n$p")
    }
  }

  test("pagerank rounds shuffle contributions; the readout avoids a global window") {
    val p = plan("graph_pagerank")
    assert(!p.contains("Window, [") && !p.contains("SinglePartition"),
      s"pagerank must rank through the distributed prefix-sum ranker:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian in the pagerank rounds:\n$p")
  }
}
