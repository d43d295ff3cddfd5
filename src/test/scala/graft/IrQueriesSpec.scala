package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IR queries: TF-IDF, BM25, inverted index, stratified sampling.
  * Oracle hash-matching runs in the driver gate; these tests pin the
  * invariants and the plan shapes that make the queries scale.
  */
class IrQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("tfidf: <=3 keywords per doc, contiguous ranks, ordered scores") {
    val rows = run("text_tfidf_topk")
      .select("doc_id", "rnk", "score_milli")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"doc $doc ranks not contiguous")
      assert(sorted.length <= 3)
      // rank order must follow quantized-score order
      assert(sorted.map(-_._3).toSeq == sorted.map(-_._3).sortBy(identity).toSeq,
        s"doc $doc scores not non-increasing in rank")
    }
  }

  test("bm25: top-20, ranked by quantized score, only matching docs") {
    val rows = run("text_bm25_search")
      .select("doc_id", "score_milli", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length <= 20 && rows.nonEmpty)
    val sorted = rows.sortBy(_._3)
    assert(sorted.map(_._3).toSeq == (1L to sorted.length).toSeq)
    assert(sorted.map(-_._2).toSeq == sorted.map(-_._2).sortBy(identity).toSeq)
    // every hit really contains a query term
    val hitIds = rows.map(_._1).toSet
    val matching = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").rlike("(^| )(merge|scan|filter)( |$)"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(matching))
  }

  test("inverted index: df-guard bounds posting lists") {
    val rows = run("text_inverted_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(r.fieldIndex("df"))
      val postings = Option(r.getString(r.fieldIndex("postings")))
      if (df > 40) assert(postings.isEmpty, s"guard leaked for df=$df")
      else {
        assert(postings.nonEmpty, s"missing postings for df=$df")
        val ids = postings.get.split(",").map(_.toLong).toSeq
        assert(ids.length == df, "postings length != df")
        assert(ids == ids.sorted, "postings not sorted")
        assert(ids.distinct.length == ids.length, "duplicate postings")
      }
    }
  }

  test("stratified sample: native GroupTopK equals the window shape") {
    val out = run("q_stratified_sample")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"),
      "sampler must plan through the native bounded-heap operator")
    // the operator preserves its child's clustering, so the downstream
    // window rank must NOT re-shuffle: exactly one hash Exchange on
    // event_type in the whole plan
    assert("hashpartitioning\\(event_type".r.findAllIn(plan).length == 1,
      s"expected a single hash exchange on event_type:\n$plan")
    val got = out.select("event_id", "event_type", "rnk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // reference shape: plain window row_number over the same pseudo-order
    val w = Window.partitionBy("event_type")
      .orderBy(concat(md5(col("event_id").cast("string")),
        lpad(col("event_id").cast("string"), 10, "0")))
    val want = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select("event_id", "event_type", "rnk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    got.groupBy(_._2).foreach { case (_, g) => assert(g.size <= 5) }
  }

  test("bm25 eval is consistent with the ranking it scores") {
    import spark.implicits._
    val Seq((nRel, firstRank, rr, r10, r20)) =
      run("ir_bm25_eval")
        .select("n_relevant", "first_rank", "rr_ppm", "recall10_ppm",
          "recall20_ppm")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(nRel > 0, "fixture must contain all-terms-relevant docs")
    // collapse guard: a working ranking puts SOME relevant doc in top-20
    assert(firstRank >= 1 && firstRank <= 20 && rr == 1000000L / firstRank)
    assert(r20 >= r10 && r20 <= 1000000L)
    // cross-check first_rank against the independently ranked bm25 query
    val topDocs = run("text_bm25_search")
      .select("doc_id", "rnk").as[(Long, Long)].collect().sortBy(_._2)
    val relSet = graft.queries.Q.table(spark, sf, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS ws")
      .filter(expr(
        """array_contains(ws, 'merge') AND array_contains(ws, 'scan')
          |AND array_contains(ws, 'filter')""".stripMargin))
      .select("doc_id").as[Long].collect().toSet
    val wantFirst = topDocs.collectFirst {
      case (doc, rnk) if relSet.contains(doc) => rnk
    }.getOrElse(0L)
    assert(firstRank == wantFirst,
      s"eval first_rank $firstRank vs ranking's $wantFirst")
  }

  test("tfidf and bm25 broadcast their vocabulary-sized df side") {
    for (q <- Seq("text_tfidf_topk", "text_bm25_search")) {
      val plan = run(q).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: df join should broadcast the vocabulary-sized side")
    }
  }
}
