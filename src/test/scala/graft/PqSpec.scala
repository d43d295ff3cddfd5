package graft

import org.apache.spark.sql.functions._

/** Product quantization: the compressed representation must be complete
  * (one code per vector per subspace), the codebooks must carry real
  * information (codes spread, not collapsed onto one centroid), and the
  * ADC-shortlist → exact-re-rank search must recover most of the true
  * brute-force neighbors — measured, not assumed, the same discipline as
  * the LSH/MinHash recall audits.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("every vector gets exactly one code per subspace") {
    val balance = SparkEntry.queries("pq_code_balance")(spark, dir).collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // 4 subspaces, each partitioning the full corpus
    val byM = balance.groupBy(_.getAs[Long]("m"))
      .view.mapValues(_.map(_.getAs[Long]("n_vecs")).sum).toMap
    assert(byM.keySet == Set(0L, 1L, 2L, 3L))
    byM.foreach { case (m, n) => assert(n == nVecs, s"subspace $m covers $n/$nVecs") }
  }

  test("codebooks carry information: no subspace collapses onto one code") {
    val balance = SparkEntry.queries("pq_code_balance")(spark, dir).collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    balance.groupBy(_.getAs[Long]("m")).foreach { case (m, rows) =>
      // at least 8 of 16 codes in use, and no code holding > 60% of the
      // corpus — a degenerate subspace carries ~0 bits and ADC scores
      // stop discriminating
      assert(rows.length >= 8, s"subspace $m uses only ${rows.length} codes")
      val maxShare = rows.map(_.getAs[Long]("n_vecs")).max.toDouble / nVecs
      assert(maxShare <= 0.6, s"subspace $m code share $maxShare")
    }
  }

  test("ADC shortlist + exact re-rank recovers most true neighbors") {
    val pq = SparkEntry.queries("ann_pq_topk")(spark, dir).collect()
    val exact = SparkEntry.queries("ann_cosine_topk")(spark, dir).collect()
    assert(pq.length == 50) // 5 queries × top-10
    val pqSet = pq.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exactSet = exact.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (pqSet & exactSet).size.toDouble / exactSet.size
    info(s"PQ recall@10 vs brute force: $recall")
    // a 4×16 codebook over 64 dims is a coarse quantizer, but the top-50
    // shortlist re-ranked exactly must still recover well over half of
    // the true top-10 — below that the ADC scores aren't discriminating
    assert(recall >= 0.5, s"PQ recall collapsed: $recall")
    // and every reported cosine is the EXACT cosine (the re-rank
    // contract): spot-check against the brute-force values for shared
    // pairs
    val exactCos = exact.map(r => ((r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id")), r.getAs[Double]("cosine"))).toMap
    pq.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exactCos.get(k).foreach(c => assert(r.getAs[Double]("cosine") == c))
    }
  }

  test("IVF-PQ: pruned ADC search still recovers most true neighbors") {
    val ivfpq = SparkEntry.queries("ann_ivfpq_topk")(spark, dir).collect()
    val exact = SparkEntry.queries("ann_cosine_topk")(spark, dir).collect()
    assert(ivfpq.length == 50)
    val got = ivfpq.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val truth = exact.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (got & truth).size.toDouble / truth.size
    info(s"IVF-PQ recall@10 vs brute force: $recall")
    // the coarse quantizer prunes to nprobe=4 of 16 lists BEFORE the PQ
    // codes score anything, so recall compounds both quantizers' loss;
    // it must still clear the useful-index bar
    assert(recall >= 0.4, s"IVF-PQ recall collapsed: $recall")
    // re-rank contract: reported cosines are exact
    val exactCos = exact.map(r => ((r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id")), r.getAs[Double]("cosine"))).toMap
    ivfpq.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exactCos.get(k).foreach(c => assert(r.getAs[Double]("cosine") == c))
    }
  }

  test("IVF-PQ neighbors all live in the query's probed coarse lists") {
    val dirTables = dir
    val ivfpq = SparkEntry.queries("ann_ivfpq_topk")(spark, dirTables).collect()
    // recompute the probe sets and the corpus assignment the query used
    // (same memoized objects), then assert every returned neighbor's home
    // list is one of its query's nprobe=4 probed lists — i.e. the coarse
    // pruning REALLY bounded the ADC scan, nothing leaked in from outside
    val assign = graft.queries.SimilarityQueries
      .corpusAssignmentForTest(spark, dirTables)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("list_id")).toMap
    val probes = graft.queries.SimilarityQueries
      .probeListsForTest(spark, dirTables, nprobe = 4)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("list_id")).toSet).toMap
    ivfpq.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(probes(q).contains(assign(n)),
        s"neighbor $n of query $q is outside the probed lists")
    }
  }

  test("codes are deterministic under repartitioning") {
    val a = SparkEntry.queries("pq_code_balance")(spark, dir)
      .orderBy("m", "code").collect().toSeq
    graft.queries.Q.release(spark) // drop the memoized codes/codebooks
    val b = SparkEntry.queries("pq_code_balance")(spark, dir)
      .orderBy("m", "code").collect().toSeq
    assert(a == b)
    graft.queries.Q.release(spark)
  }
}
