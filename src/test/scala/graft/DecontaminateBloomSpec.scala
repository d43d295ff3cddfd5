package graft

import org.apache.spark.sql.functions._

/** Bloom-sketch decontamination vs the exact gram join: the filter must
  * never miss a truly contaminated gram (zero false negatives — Bloom's
  * one-sided guarantee), so per document the sketch count is an upper
  * bound of the exact count, and at the test corpus's fill ratio the two
  * should in fact coincide almost everywhere.
  */
class DecontaminateBloomSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bloom flags are a superset of exact contamination, per document") {
    val exact = SparkEntry.queries("corpus_decontaminate")(spark, dir)
      .select(col("doc_id"), col("n_contam"))
      .as[(Long, Long)].collect().toMap
    val bloom = SparkEntry.queries("corpus_decontaminate_bloom")(spark, dir)
      .select(col("doc_id"), col("n_flagged"))
      .as[(Long, Long)].collect().toMap
    // no false negatives: every exactly-contaminated doc is flagged, with
    // at least its exact gram count
    exact.foreach { case (doc, n) =>
      assert(bloom.getOrElse(doc, 0L) >= n,
        s"doc $doc: bloom ${bloom.get(doc)} < exact $n — a Bloom filter " +
          "can never under-count")
    }
    // the sketch is a *filter*, not a firehose: flagged docs stay within
    // a small multiple of the truly contaminated set (fill ratio ~9%,
    // k=3 → per-gram FP ~7e-4)
    assert(bloom.size <= math.max(4L, 4L * math.max(exact.size, 1)),
      s"bloom flagged ${bloom.size} docs vs ${exact.size} exact — FP blowup")
  }
}
