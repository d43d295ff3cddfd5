package graft

import graft.operators.{Kmv, KmvSketch}
import org.apache.spark.sql.functions._

/** KMV k-minimum-values sketch: the aggregator's set semantics (distinct
  * minima, partition-order independence), the theta-union identity the
  * Jaccard query rests on, and the estimator's accuracy on a universe
  * whose true cardinality is known.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def hash48(v: Long): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(v.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16)
  }

  test("sketch holds the k smallest DISTINCT values, any partitioning") {
    val k = 16
    val values = (1L to 500L).map(v => v % 100) // heavy duplication
    val expected = values.distinct.sorted.take(k)
    for (parts <- Seq(1, 3, 8)) {
      val got = values.toDF("v").repartition(parts)
        .agg(Kmv.minValues(k)(col("v")).as("sk"))
        .select("sk").as[Seq[Long]].head()
      assert(got == expected, s"parts=$parts")
    }
  }

  test("reduce/merge unit semantics: reject, dedup, cap") {
    val sk = new KmvSketch(4)
    var b = sk.zero
    Seq(5L, 3L, 9L, 1L, 7L, 3L, 0L).foreach(v => b = sk.reduce(b, v))
    assert(b.toSeq == Seq(0L, 1L, 3L, 5L)) // capped, sorted, distinct
    // full sketch rejects anything >= max without allocation
    assert(sk.reduce(b, 100L) eq b)
    assert(sk.reduce(b, 5L) eq b)
    // merge of overlapping sketches keeps each shared value once
    val other = sk.reduce(sk.reduce(sk.zero, 1L), 2L)
    assert(sk.merge(b, other).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(sk.merge(sk.zero, b).toSeq == b.toSeq)
    assert(sk.merge(b, sk.zero).toSeq == b.toSeq)
  }

  test("theta-union identity: k smallest of A∪B from the two sketches") {
    val k = 8
    val sk = new KmvSketch(k)
    val a = (1L to 60L).map(_ * 3) // multiples of 3
    val b = (1L to 60L).map(_ * 2) // multiples of 2, overlap at 6s
    def build(xs: Seq[Long]) = xs.foldLeft(sk.zero)(sk.reduce)
    val union = sk.merge(build(a), build(b)).toSeq
    val truth = (a ++ b).distinct.sorted.take(k)
    assert(union == truth)
  }

  test("estimator is within the KMV error bound on a known universe") {
    val k = 64
    val n = 5000
    val hashes = (1 to n).map(v => hash48(v.toLong))
    assert(hashes.distinct.size == n) // no 48-bit collisions here
    val sorted = hashes.sorted
    val kth = sorted(k - 1)
    val est = (k - 1).toLong * (1L << 48) / kth
    // standard KMV relative error ~ 1/sqrt(k-2) ≈ 12.7% at k=64; allow 3σ
    assert(math.abs(est - n).toDouble / n < 0.4,
      s"est=$est for true n=$n")
  }

  test("registered queries: estimate brackets truth; jaccard row shape") {
    val d = "/root/testdata/sf0.001"
    val dist = SparkEntry.queries("q_kmv_distinct")(spark, d).collect()
    assert(dist.nonEmpty)
    dist.foreach { r =>
      val est = r.getAs[Long]("est_distinct")
      val truth = r.getAs[Long]("n_true")
      // exact when the sketch never filled; bounded error otherwise
      if (r.getAs[Long]("n_sketch") < 64) assert(est == truth)
      else assert(math.abs(est - truth).toDouble / truth < 0.5,
        s"est=$est truth=$truth")
    }
    val jac = SparkEntry.queries("q_kmv_jaccard")(spark, d).collect()
    jac.foreach { r =>
      val nU = r.getAs[Long]("n_union")
      val nM = r.getAs[Long]("n_match")
      assert(nU > 0 && nM >= 0 && nM <= nU)
      assert(r.getAs[Long]("jaccard_pct") == 100 * nM / nU)
    }
  }
}
