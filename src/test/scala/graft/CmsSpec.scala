package graft

import graft.operators.CountMin
import org.apache.spark.sql.functions._

/** Count-Min sketch relation: the overestimate guarantee (never under),
  * partition-order independence, exactness when buckets don't collide,
  * and the union+sum mergeability that makes the relation form a real
  * cross-batch sketch.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val d = 3
  private val w = 64

  test("estimates never undercount, any partitioning") {
    val rows = (1 to 400).map(i => (i % 37).toLong) // 37 keys, skewed mass
    val truth = rows.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong
    }
    for (parts <- Seq(1, 4, 16)) {
      val df = rows.toDF("k").repartition(parts)
      val sk = CountMin.sketch(df, col("k"), d, w)
      val keys = truth.keys.toSeq.toDF("k")
      val est = CountMin.estimate(sk, keys, "k", d, w)
        .as[(Long, Long)].collect().toMap
      truth.foreach { case (k, n) =>
        assert(est(k) >= n, s"undercount for $k at parts=$parts")
      }
    }
  }

  test("no-collision regime is exact; unseen keys estimate 0 or residue") {
    // 8 distinct keys into 3x256 buckets: collision odds ~ 8^2/256 per
    // row, and the MIN over 3 independent rows makes a collision in all
    // three vanishingly unlikely — with this fixed hash, exactness holds
    // (asserted, so a hash change that breaks it fails loudly)
    val wBig = 256
    val rows = (1 to 200).map(i => (i % 8).toLong)
    val df = rows.toDF("k")
    val sk = CountMin.sketch(df, col("k"), d, wBig)
    val est = CountMin.estimate(sk, (0L to 9L).toDF("k"), "k", d, wBig)
      .as[(Long, Long)].collect().toMap
    (0L to 7L).foreach(k => assert(est(k) == 25L, s"k=$k got ${est(k)}"))
    // unseen keys (8, 9) may only pick up collision residue, never less
    // than zero — and with these buckets, exactly zero
    assert(est(8L) == 0L && est(9L) == 0L)
  }

  test("sketches merge by union + sum, identical to sketching the union") {
    val a = (1 to 150).map(i => (i % 11).toLong).toDF("k")
    val b = (1 to 90).map(i => (i % 7).toLong).toDF("k")
    val skA = CountMin.sketch(a, col("k"), d, w)
    val skB = CountMin.sketch(b, col("k"), d, w)
    val merged = skA.unionAll(skB)
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    val direct = CountMin.sketch(a.unionAll(b), col("k"), d, w)
    val m = merged.as[(Int, Long, Long)].collect().toSet
    val dd = direct.as[(Int, Long, Long)].collect().toSet
    assert(m == dd)
  }

  test("sketch relation is bounded by d*w cells") {
    val big = (1 to 5000).map(_.toLong).toDF("k") // 5000 distinct keys
    val sk = CountMin.sketch(big, col("k"), d, w)
    assert(sk.count() <= d.toLong * w)
  }

  test("non-power-of-two width is rejected: the odd stride is only coprime with 2^k") {
    val df = Seq(1L, 2L).toDF("k")
    intercept[IllegalArgumentException] {
      CountMin.sketch(df, col("k"), d, 100)
    }
    intercept[IllegalArgumentException] {
      CountMin.estimate(CountMin.sketch(df, col("k"), d, w),
        df, "k", d, 100)
    }
  }
}
