package graft

import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection: the sign matrix must carry
  * real entropy (md5-parity signs near balance — a degenerate all-plus
  * matrix would just sum components), and the distance-preservation
  * guarantee is MEASURED against the exact pairwise distances, the same
  * discipline as the LSH/MinHash/PQ recall audits.
  */
class ProjectionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("projection output is complete and the sign matrix is balanced") {
    val p = SparkEntry.queries("embedding_project")(spark, dir).collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(p.length == nVecs * 16, "16 projected components per vector")
    // recover the sign balance from the oracle-shared derivation
    val signs = for (j <- 0 until 16; d <- 1 to 64) yield {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${j}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      1 - 2 * (hex.charAt(0).toInt % 2)
    }
    val plus = signs.count(_ == 1).toDouble / signs.size
    assert(plus > 0.38 && plus < 0.62, s"sign balance degenerate: $plus")
  }

  test("measured JL preservation: most pairs within ±50% of k·d2") {
    val r = SparkEntry.queries("embedding_project_audit")(spark, dir)
      .collect().head
    val nPairs = r.getAs[Long]("n_pairs")
    val nPreserved = r.getAs[Long]("n_preserved")
    assert(nPairs == 50L * 49 / 2)
    val rate = nPreserved.toDouble / nPairs
    info(s"JL preservation rate at k=16: $rate")
    // k=16 has ~sqrt(2/16)=35% relative std, so ±50% should capture the
    // bulk; below 0.7 the projection stopped behaving like a JL matrix
    assert(rate >= 0.7, s"preservation collapsed: $rate")
  }

  test("matryoshka audit: complete pair set, consistent ppm, sane rate") {
    val Seq((n, p, ppm)) = SparkEntry
      .queries("embedding_matryoshka_audit")(spark, "/root/testdata/sf0.001")
      .select("n_pairs", "n_preserved", "preserved_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(n == 50L * 49 / 2, s"expected all sample pairs, got $n")
    assert(p >= 0 && p <= n && ppm == p * 1000000L / n)
    // a 16-dim prefix of a 64-dim isotropic-ish embedding should keep
    // the bulk of pairs within ±50% of the 4x-scaled distance; a
    // collapse here means prefix truncation is broken for this space
    assert(ppm >= 500000L, s"matryoshka preservation collapsed: $ppm ppm")
  }

  test("mmr rerank: greedy picks are distinct, monotone, relevance-anchored") {
    val dir = "/root/testdata/sf0.001"
    val picks = SparkEntry.queries("ann_mmr_rerank")(spark, dir)
      .select("rank", "vec_id", "mmr_milli")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(picks.map(_._1).toSeq == (1L to 5L) &&
      picks.map(_._2).distinct.length == 5)
    // the first pick has no diversity penalty: it must be the plain
    // cosine top-1 (rank-1 of ann_cosine_topk for query 0)
    val top1 = SparkEntry.queries("ann_cosine_topk")(spark, dir)
      .filter(org.apache.spark.sql.functions.expr("query_id = 0 AND rank = 1"))
      .select("neighbor_id").collect().head.getLong(0)
    assert(picks.head._2 == top1,
      s"first MMR pick ${picks.head._2} must equal cosine top-1 $top1")
    // each later round maximizes over a shrunk set with weakly larger
    // penalties, so the picked scores can only go down
    val scores = picks.map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"picked MMR scores must be non-increasing: ${scores.toList}")
  }
}
