package graft

import graft.functions.IngestFunctions._
import graft.ledger.LedgerStore
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY.md §5 item 3): engine behavior vs a
  * directly-computed model over generated inputs. Inputs are drawn from
  * ScalaCheck generators with a fixed seed and evaluated in one DataFrame
  * per property (one Spark job, many cases).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  test("property: pySplitLineCount == Python str.split('\\n') length") {
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const('\n'), 1 -> Gen.const(' ')))
      .map(_.mkString)
    val cases = "" :: "\n" :: "a\nb\n" :: samples(strGen, 300)
    // model: Python s.split('\n') length == Java split with -1 limit
    val expected = cases.map(s => s.split("\n", -1).length)
    val got = cases.toDF("s")
      .select(pySplitLineCount($"s")).as[Int].collect().toList
    assert(got == expected)
  }

  test("property: uploadId == sha256(f\"{b}-{n}-{s}-{c}\")[:16] model") {
    val part = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const('-'), 1 -> Gen.const('.')))
      .map(_.mkString)
    val cases = samples(Gen.zip(part, part, Gen.chooseNum(0L, 1L << 40), part), 200)
    def model(b: String, n: String, sz: Long, c: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$b-$n-$sz-$c".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    val expected = cases.map { case (b, n, sz, c) => model(b, n, sz, c) }
    val got = cases.toDF("b", "n", "sz", "c")
      .select(uploadId($"b", $"n", $"sz", $"c")).as[String].collect().toList
    assert(got == expected)
  }

  test("property: ledger merge is per-column coalesce(new, old)") {
    val store = new LedgerStore(spark, tmpDir("prop-ledger"))
    val statusGen = Gen.oneOf("pending", "processing", "done", "failed")
    val optLong = Gen.option(Gen.chooseNum(0L, 9999L))
    val ids = (0 until 60).map(i => f"id$i%04d")
    val oldRows = ids.take(40).map(id =>
      (id, Some("b"), Some(s"f-$id"), samples(optLong, 1).head,
        Some(samples(statusGen, 1).head)))
    val newRows = ids.drop(20).map(id =>
      (id, None: Option[String], Some(s"g-$id"), samples(optLong, 1).head,
        Some(samples(statusGen, 1).head)))
    def df(rows: Seq[(String, Option[String], Option[String], Option[Long], Option[String])]) =
      rows.toDF("upload_id", "bucket_name", "file_name", "file_size", "status")
    store.merge(df(oldRows))
    store.merge(df(newRows))
    val got = store.read()
      .select("upload_id", "bucket_name", "file_name", "file_size", "status")
      .as[(String, Option[String], Option[String], Option[Long], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    val oldM = oldRows.map(r => r._1 -> r).toMap
    val newM = newRows.map(r => r._1 -> r).toMap
    ids.foreach { id =>
      val o = oldM.get(id); val n = newM.get(id)
      val exp = (id,
        n.flatMap(_._2).orElse(o.flatMap(_._2)),
        n.flatMap(_._3).orElse(o.flatMap(_._3)),
        n.flatMap(_._4).orElse(o.flatMap(_._4)),
        n.flatMap(_._5).orElse(o.flatMap(_._5)))
      assert(got(id) == exp, s"merge mismatch for $id")
    }
  }

  test("property: HLL approx distinct within its error bound") {
    val r = SparkEntry.queries("q_approx_distinct")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val approx = row.getAs[Long]("approx_users").toDouble
      val exact = row.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10, // 5× the 2% rsd
        s"approx $approx too far from exact $exact")
    }
  }

  test("property: salted join equals the plain join for any salt count") {
    val keyGen = Gen.frequency(5 -> Gen.const(3L), 1 -> Gen.chooseNum(0L, 19L))
    val facts = samples(Gen.zip(keyGen, Gen.chooseNum(1L, 100L)), 400)
      .toDF("k", "v")
    val dims = (0L to 19L).map(k => (k, s"d$k")).toDF("dk", "attr")
    val expected = facts.join(dims, $"k" === $"dk")
      .groupBy("attr").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .orderBy("attr").collect().toSeq
    for (salts <- Seq(1, 2, 7, 16)) {
      val got = graft.operators.SkewTools.saltedJoin(facts, dims, "k", "dk", salts)
        .groupBy("attr").agg(sum($"v").as("s"), count(lit(1)).as("n"))
        .orderBy("attr").collect().toSeq
      assert(got == expected, s"salts=$salts diverged from the plain join")
    }
  }

  test("property: streaming admission matches the first-batch-wins model") {
    import graft.streaming.StreamingDedup
    // random docs over a SMALL text alphabet (forces within- and
    // cross-batch duplicates), random batch assignment, random redelivery
    val docGen = Gen.zip(Gen.chooseNum(0L, 299L),
      Gen.oneOf("wa", "wb", "wc", "wd", "we", "wf"), Gen.chooseNum(0, 2))
    val docs = samples(docGen, 80).distinctBy(_._1)
    val idx = tmpDir("prop-sdd") + "/index"
    val out = tmpDir("prop-sdd") + "/out"
    for (b <- 0 to 2)
      StreamingDedup.processBatch(spark,
        docs.filter(_._3 == b).map(t => (t._1, t._2)).toDF("doc_id", "text"),
        b.toLong, idx, out)
    // redeliver a random batch (retry), must not change the outcome
    StreamingDedup.processBatch(spark,
      docs.filter(_._3 == 1).map(t => (t._1, t._2)).toDF("doc_id", "text"),
      1L, idx, out)
    // model: per text, the min doc_id within the first batch carrying it
    val model = docs.groupBy(_._2).values.map { ds =>
      val firstBatch = ds.map(_._3).min
      ds.filter(_._3 == firstBatch).map(_._1).min
    }.toSet
    val got = spark.read.parquet(out).select("doc_id").as[Long]
      .collect().toSet
    assert(got == model)
  }

  test("property: substring dedup matches the brute-force span model") {
    // small-vocabulary corpora force repeated 8-grams; the model computes
    // duplicated positions and maximal spans (gap >= 8 breaks) directly
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val docGen = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, wordGen))
    val corpusGen = Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, docGen))
    samples(corpusGen, 6).zipWithIndex.foreach { case (corpus, ci) =>
      val docs = corpus.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" "))
      }
      val dir = tmpDir(s"prop-substr-$ci")
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("dedup_exact_substring")(spark, dir)
        .select("doc_id", "n_spans", "n_dup_grams", "n_dup_words",
          "max_span_words")
        .as[(Long, Long, Long, Long, Long)].collect().toList.sortBy(_._1)
      // model
      val grams = docs.flatMap { case (id, t) =>
        val ws = t.split(" ", -1)
        (0 to ws.length - 8).map(i => (id, i + 1, ws.slice(i, i + 8).mkString(" ")))
      }
      val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val want = grams.filter(g => counts(g._3) > 1).groupBy(_._1)
        .map { case (id, hs) =>
          val ps = hs.map(_._2).sorted
          val spans = scala.collection.mutable.ListBuffer
            .empty[scala.collection.mutable.ListBuffer[Int]]
          ps.foreach { i =>
            if (spans.nonEmpty && i - spans.last.last < 8) spans.last += i
            else spans += scala.collection.mutable.ListBuffer(i)
          }
          val words = spans.map(s => (s.last + 7 - s.head + 1).toLong)
          (id, spans.size.toLong, ps.size.toLong, words.sum, words.max)
        }.toList.sortBy(_._1)
      assert(got == want, s"case $ci corpus=$docs got=$got want=$want")
      graft.queries.Q.release(spark, dir)
    }
  }

  test("property: paragraph dedup matches the first-occurrence segment model") {
    // corpora built FROM a 5-segment pool (forcing exact 16-word-block
    // duplicates, which random words never produce) plus short random
    // tails that exercise partial trailing segments and cross-doc tail
    // collisions
    val segPool = (0 until 5).map(s =>
      (1 to 16).map(i => s"w${s}_$i").mkString(" "))
    val docGen = for {
      n <- Gen.chooseNum(0, 4)
      segs <- Gen.listOfN(n, Gen.chooseNum(0, 4))
      tailLen <- Gen.chooseNum(0, 15)
      tail <- Gen.listOfN(tailLen, Gen.oneOf("x", "y", "z"))
    } yield (segs.map(segPool) ++
      (if (tail.isEmpty) Nil else Seq(tail.mkString(" ")))).mkString(" ")
    val corpusGen = Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, docGen))
    samples(corpusGen, 6).zipWithIndex.foreach { case (corpus, ci) =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val dir = tmpDir(s"prop-para-$ci")
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("dedup_paragraph")(spark, dir)
        .select("doc_id", "n_segs", "n_kept", "n_removed", "kept_words")
        .as[(Long, Long, Long, Long, Long)].collect().toList.sortBy(_._1)
      // model: 16-word segmentation, global first occurrence by encoded
      // (doc_id, seg_idx) position
      val all = docs.flatMap { case (id, t) =>
        val ws = t.split(" ", -1)
        (0 until (ws.length + 15) / 16).map { i =>
          val seg = ws.slice(i * 16, i * 16 + 16)
          (id, i, seg.mkString(" "), seg.length.toLong)
        }
      }
      val firstK = all.groupBy(_._3).view
        .mapValues(_.map(x => x._1 * 2147483648L + x._2).min).toMap
      val want = all.groupBy(_._1).map { case (id, ss) =>
        val kept = ss.filter(x => x._1 * 2147483648L + x._2 == firstK(x._3))
        (id, ss.size.toLong, kept.size.toLong,
          (ss.size - kept.size).toLong, kept.map(_._4).sum)
      }.toList.sortBy(_._1)
      assert(got == want, s"case $ci corpus=$docs got=$got want=$want")
      graft.queries.Q.release(spark, dir)
    }
  }

  test("property: quality classifier separates randomized planted clusters") {
    // the single-case separation test generalized: random cluster sizes,
    // disjoint random vocabularies, random doc lengths — the trained
    // 4-round model must separate ANY corpus whose planted label
    // structure (long stopword-bearing vs short) is learnable from the
    // hashed word-bucket features
    val caseGen = for {
      nGood <- Gen.chooseNum(20, 40)
      nBad <- Gen.chooseNum(20, 40)
      gw <- Gen.chooseNum(0, 1000)       // good-vocab offset
      bw <- Gen.chooseNum(2000, 3000)    // bad-vocab offset (disjoint)
      rep <- Gen.chooseNum(11, 16)       // good length: >= 30 words
      badLen <- Gen.chooseNum(3, 8)
    } yield (nGood, nBad, gw, bw, rep, badLen)
    def bucket(word: String): Int = {
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(word.getBytes("UTF-8"))
      (dg(0) >> 4) & 0xf
    }
    samples(caseGen, 4).zipWithIndex.foreach {
      case ((ng, nb, gw, bw, rep, badLen), ci) =>
        val good = (0 until ng).map(i => (i.toLong,
          (s"g${gw + i} the apple ") * rep + "end"))
        val bad = (0 until nb).map(i => ((1000 + i).toLong,
          (0 until badLen).map(k => s"b${bw + i}x$k").mkString(" ")))
        val dir = tmpDir(s"prop-clf-$ci")
        (good ++ bad).toDF("doc_id", "text")
          .write.parquet(s"$dir/documents.parquet")
        val w = SparkEntry.queries("corpus_quality_classifier")(spark, dir)
          .as[(Long, Long)].collect().toMap
        assert(w.size == 17 && w.values.exists(_ != 0L),
          s"case $ci: training must move the weights")
        def p(text: String): Double = {
          val z = text.split(" ", -1).map(t => w(bucket(t).toLong)).sum +
            w(16L)
          math.min(math.max(z / 4000000.0 + 0.5, 0.0), 1.0)
        }
        val pGood = good.map(g => p(g._2)).sum / ng
        val pBad = bad.map(b => p(b._2)).sum / nb
        assert(pGood > pBad + 0.15,
          s"case $ci ($ng/$nb docs): pGood=$pGood pBad=$pBad")
        graft.queries.Q.release(spark, dir)
    }
  }

  test("property: pca power iteration recovers randomized planted directions") {
    // the single planted-direction case generalized: random direction,
    // random corpus size, random noise amplitude (kept below the
    // eigengap) — 8 quantized rounds must align with the planted axis
    val caseGen = for {
      seedI <- Gen.chooseNum(1, 10000)
      amp <- Gen.chooseNum(1, 3)      // noise = amp * +-0.01
      n <- Gen.chooseNum(150, 300)
    } yield (seedI, amp, n)
    samples(caseGen, 4).zipWithIndex.foreach { case ((seedI, amp, n), ci) =>
      val u0 = (0 until 64).map(j =>
        math.sin(seedI * 0.7 + j * 1.3) + 0.3 * math.cos(seedI + j * 0.41))
        .toArray
      val un = math.sqrt(u0.map(t => t * t).sum)
      val u = u0.map(_ / un)
      def noise(i: Int, j: Int): Double =
        amp * ((((i * 31 + j * 17 + seedI) % 97) - 48) / 4800.0)
      val planted = (0 until n).map { i =>
        val scale = 1.0 + (i % 5) * 0.1
        (i.toLong, (0 until 64).map(j => (scale * u(j) + noise(i, j)).toFloat), 0)
      }
      val dir = tmpDir(s"prop-pca-$ci")
      planted.toDF("vec_id", "embedding", "label")
        .write.parquet(s"$dir/embeddings.parquet")
      val v = SparkEntry.queries("embedding_pca_power")(spark, dir)
        .as[(Long, Double)].collect().sortBy(_._1).map(_._2)
      val cos = math.abs(v.zip(u).map { case (x, y) => x * y }.sum)
      assert(cos > 0.95,
        s"case $ci (seed=$seedI amp=$amp n=$n): cos(v, planted)=$cos")
      graft.queries.Q.release(spark, dir)
    }
  }

  /** Sequential reference BPE: word counts → per-round pair argmax
    * (support desc, l asc, r asc) → `String.replace` merge — the exact
    * semantics the distributed rounds and the unrolled oracle share,
    * including the early stop when the pair inventory runs dry. */
  private def refBpe(words: Map[String, Long],
      rounds: Int): List[(Long, String, String, String, Long)] = {
    var dict = words.toList.map { case (w, c) =>
      ("|" + w.map(_.toString).mkString("|") + "|", c)
    }
    val out = List.newBuilder[(Long, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (sym, wc) =>
        val ps = sym.split("\\|").filter(_.nonEmpty)
        var i = 0
        while (i < ps.length - 1) {
          val k = (ps(i), ps(i + 1))
          pairs(k) = pairs.getOrElse(k, 0L) + wc
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, rr), sup) = pairs.toList
          .minBy { case ((pl, pr), s) => (-s, pl, pr) }
        out += ((r.toLong, l, rr, l + rr, sup))
        dict = dict.map { case (sym, wc) =>
          (sym.replace(s"|$l|$rr|", s"|$l$rr|"), wc)
        }
      }
      r += 1
    }
    out.result()
  }

  test("property: BPE training matches the sequential model when the pair inventory exhausts at any k < 8") {
    // tiny {a,b} vocabularies run dry after a few merges: every case must
    // produce IDENTICAL merge tables from the distributed rounds and the
    // sequential reference — same argmax, same tiebreak, same early stop
    // at whatever round k the pairs are gone
    val wordGen = Gen.chooseNum(2, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    val corpusGen = Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.zip(wordGen, Gen.chooseNum(1, 3))))
    val cases = samples(corpusGen, 8)
    var exhaustionRounds = Set.empty[Int]
    cases.zipWithIndex.foreach { case (corpus, i) =>
      val text = corpus.flatMap { case (w, c) => List.fill(c)(w) }
        .mkString(" ")
      val dir = tmpDir(s"prop-bpe-$i")
      Seq((0L, text)).toDF("doc_id", "text")
        .write.parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("text_bpe_train")(spark, dir)
        .select("merge_rank", "lhs", "rhs", "merged", "support")
        .as[(Long, String, String, String, Long)].collect().toList
      val want = refBpe(
        text.split(" ").filter(_.matches("^[a-z]{2,}$"))
          .groupBy(identity).map { case (w, g) => w -> g.size.toLong },
        rounds = 8)
      assert(got == want, s"case $i corpus=$corpus got=$got want=$want")
      if (want.size < 8) exhaustionRounds += want.size
      graft.queries.Q.release(spark, dir)
    }
    assert(exhaustionRounds.nonEmpty,
      "generator must cover at least one early-exhaustion corpus")
  }
}
