package graft

import org.apache.spark.sql.functions._

/** Hot-band star-linking: a duplicate GROUP larger than MinhashBandCap
  * shares every band value, so every one of its band buckets goes hot.
  * The pre-round-9 cap DROPPED hot buckets outright, which silently
  * erased exactly the largest (highest-value) duplicate clusters from the
  * near-dup surface. Star-linking bounds a hot bucket to O(bucket) pairs
  * through its min-doc representative instead, so the transitive closure
  * still recovers the whole group. These tests plant a group ABOVE the
  * cap and pin both properties: the group survives intact (recall) and
  * its pair count is linear, not quadratic (the work bound).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val cap = graft.queries.DedupQueries.MinhashBandCap
  private val groupN = cap + 36 // comfortably above the cap
  private val groupIds = (1000L until (1000L + groupN)).toSet

  /** Corpus: `groupN` near-identical docs (identical 200-char prefix, so
    * identical MinHash signatures — every band bucket holds groupN > cap
    * docs — but per-doc distinct tails, so exact dedup canNOT collapse
    * them) plus 30 mutually-distinct background docs.
    */
  private lazy val fixtureDir: String = {
    val base = (1 to 70).map(i => s"w$i").mkString(" ") // > 200 chars
    val group = (0 until groupN).map { i =>
      (1000L + i, s"$base tail${i}a tail${i}b")
    }
    val bg = (0 until 30).map { i =>
      (i.toLong, (1 to 40).map(j => s"bg${i}x$j").mkString(" "))
    }
    val dir = tmpDir("dedup-overcap")
    (group ++ bg).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("over-cap duplicate group: pair work is linear (star, not quadratic)") {
    val pairs = SparkEntry.queries("dedup_near_dup_pipeline")(spark, fixtureDir)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect()
    val inGroup = pairs.filter(p =>
      groupIds.contains(p._1) && groupIds.contains(p._2))
    // every band bucket of the group is hot, so the ONLY emitted pairs
    // are the star edges (rep=1000, member) — groupN-1 of them, never
    // the ~groupN²/2 a pairwise enumeration would produce
    assert(inGroup.length == groupN - 1,
      s"expected ${groupN - 1} star pairs, got ${inGroup.length}")
    assert(inGroup.forall(_._1 == 1000L), "star pairs must anchor at the rep")
    assert(inGroup.map(_._2).toSet == groupIds - 1000L)
    assert(inGroup.forall(_._3 >= 0.5), "star pairs still pass the verify")
    // background docs never enter the near-dup surface
    assert(pairs.forall(p =>
      groupIds.contains(p._1) && groupIds.contains(p._2)))
  }

  test("over-cap duplicate group: transitive closure recovers the full cluster") {
    val clusters = SparkEntry.queries("dedup_clusters")(spark, fixtureDir)
      .select($"doc_id", $"cluster_id", $"cluster_size")
      .as[(Long, Long, Long)].collect()
    val grp = clusters.filter(c => groupIds.contains(c._1))
    assert(grp.length == groupN, s"all $groupN members clustered, got ${grp.length}")
    assert(grp.forall(_._2 == 1000L), "one cluster, anchored at the min doc_id")
    assert(grp.forall(_._3 == groupN.toLong))
  }

  test("over-cap duplicate group: clustered curation keeps exactly one representative") {
    val kept = SparkEntry.queries("corpus_curation_clustered")(spark, fixtureDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.intersect(groupIds) == Set(1000L),
      "exactly the representative survives curation")
    assert((0L until 30L).forall(kept.contains), "background docs all survive")
  }

  test("over-cap embedding cluster: LSH bucket star-links, stays linear, stays connected") {
    val lshCap = graft.queries.SimilarityQueries.LshBucketCap
    val clusterN = lshCap + 28
    val clusterIds = (1000L until (1000L + clusterN)).toSet
    // one tight cluster ABOVE the bucket cap (identical direction ⇒
    // identical signatures in every table ⇒ all four buckets hot) plus
    // 40 mutually-orthogonal background vectors
    val cluster = (0 until clusterN).map { i =>
      (1000L + i, Array.tabulate(64)(j => if (j == 0) 0.8f else 0.01f))
    }
    val bg = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(64)(j => if (j == i + 24) 1.0f else 0.0f))
    }
    val dir = tmpDir("lsh-overcap")
    (cluster ++ bg).toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val pairs = SparkEntry.queries("dedup_embedding_lsh")(spark, dir)
      .select($"vec_a", $"vec_b", $"cosine")
      .as[(Long, Long, Double)].collect()
    val inCluster = pairs.filter(p =>
      clusterIds.contains(p._1) && clusterIds.contains(p._2))
    // every bucket of the cluster is hot ⇒ only the star edges are
    // emitted: clusterN-1 pairs, never the ~clusterN²/2 of a pairwise
    // enumeration — and the cluster stays fully connected through them
    assert(inCluster.length == clusterN - 1,
      s"expected ${clusterN - 1} star pairs, got ${inCluster.length}")
    assert(inCluster.forall(_._1 == 1000L), "star pairs anchor at the rep")
    assert(inCluster.map(_._2).toSet == clusterIds - 1000L)
    assert(inCluster.forall(_._3 >= 0.99), "identical vectors, cosine ≈ 1")
    // orthogonal background vectors never pass the 0.4 verify
    assert(pairs.forall(p =>
      clusterIds.contains(p._1) && clusterIds.contains(p._2)))
    graft.queries.Q.release(spark, dir)
  }

  test("simhash table dial: corpus-size derivation is inert until saturation") {
    import graft.queries.DedupQueries.simhashTables
    // every current scale — standard fixtures through the x30 sweep and
    // well beyond — stays on one table
    for (n <- Seq(500L, 5000L, 150000L, 1000000L, 20L << 16))
      assert(simhashTables(n) == 1, s"n=$n")
    // one extra table per further 4x of corpus, capped at the sha256
    // digest's 4 blocks
    assert(simhashTables((20L << 16) + 1) == 2)
    assert(simhashTables(4 * (20L << 16)) == 2)
    assert(simhashTables(4 * (20L << 16) + 1) == 3)
    assert(simhashTables(16 * (20L << 16) + 1) == 4)
    assert(simhashTables(1L << 40) == 4)
  }

  test("simhash block signatures: block 0 is canonical, blocks are independent") {
    import graft.functions.SimhashBits
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq("the quick brown fox", "a b c d e f",
      "one two  three", "solo")
    for (t <- texts; w <- Seq(4, 8, 16)) {
      val u = UTF8String.fromString(t)
      assert(SimhashBits.compute(u, w, 0) == SimhashBits.compute(u, w),
        s"block 0 must equal the 2-arg form ($t, $w)")
      // independent reference model for block b: votes over nibbles
      // [16b, 16b + w) of each word's sha256 hex digest
      for (b <- 0 to 3) {
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val votes = new Array[Int](w * 4)
        t.split(" ").filter(_.nonEmpty).foreach { word =>
          val hex = md.digest(word.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          for (bit <- 0 until w * 4) {
            val nibble = Integer.parseInt(
              hex.charAt(16 * b + bit / 4).toString, 16)
            votes(bit) += 2 * ((nibble >> (3 - bit % 4)) & 1) - 1
          }
        }
        val want = (0 until w * 4).foldLeft(0L)((acc, bit) =>
          if (votes(bit) > 0) acc | (1L << bit) else acc)
        assert(SimhashBits.compute(u, w, b) == want, s"($t, $w, block $b)")
      }
      // distinct blocks give distinct signatures for multi-word text
      // (independent hash bits; equality would be a 2^-16 coincidence)
      if (t.split(" ").count(_.nonEmpty) > 1)
        assert(SimhashBits.compute(u, 16, 0) != SimhashBits.compute(u, 16, 1))
    }
  }

  test("simhash extra tables are purely additive recall") {
    val dir = "/root/testdata/sf0.001"
    val base = SparkEntry.queries("dedup_simhash_pairs")(spark, dir)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Long)].collect().toSet
    val two = graft.queries.DedupQueries.simhashPairs(spark, dir, nTables = 2)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Long)].collect().toSet
    // block-0 bands (and their caps) are untouched by extra tables, so
    // the single-table pairs all survive; anything new still passed the
    // canonical hamming <= 3 verify
    assert(base.subsetOf(two),
      s"missing ${(base -- two).take(5)} from the 2-table surface")
    assert(two.forall(_._3 <= 3))
  }

  override protected def afterAll(): Unit = {
    graft.queries.Q.release(spark, fixtureDir)
    super.afterAll()
  }
}
