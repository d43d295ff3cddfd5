package graft

import org.apache.spark.sql.functions._

/** Round-7 training-data operators: exact-substring dedup, BPE encode,
  * the learned quality classifier, and DSIR importance resampling — each
  * verified against an independent in-test witness on a controlled
  * corpus (the DuckDB oracle covers the fixture corpora; these specs pin
  * the SEMANTICS on inputs where the right answer is known by
  * construction).
  */
class TrainingDataOpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")

  test("substring dedup finds exactly the planted duplicated spans") {
    // doc 0 and doc 1 share one 12-word run (distinct vocabularies
    // otherwise); doc 2 is all-unique; doc 3 repeats its own 8-word run
    // twice with a 3-word gap (two disjoint spans in ONE document)
    val shared = (1 to 12).map(i => s"shr$i").mkString(" ")
    val self = (1 to 8).map(i => s"slf$i").mkString(" ")
    val dir = tmpDir("substr")
    writeDocs(dir, Seq(
      (0L, (1 to 5).map(i => s"a$i").mkString(" ") + " " + shared + " " +
        (1 to 5).map(i => s"b$i").mkString(" "), "s"),
      (1L, (1 to 3).map(i => s"c$i").mkString(" ") + " " + shared, "s"),
      (2L, (1 to 20).map(i => s"u$i").mkString(" "), "s"),
      (3L, self + " gap1 gap2 gap3 " + self, "s")))
    val out = SparkEntry.queries("dedup_exact_substring")(spark, dir)
      .select("doc_id", "n_spans", "n_dup_grams", "n_dup_words",
        "max_span_words")
      .as[(Long, Long, Long, Long, Long)].collect().toList.sortBy(_._1)
    // 12 shared words → 5 dup 8-gram positions → one span of 12 words
    // in each of docs 0 and 1; doc 3's two copies are 11 positions apart
    // (≥ 8) → two spans of 8; doc 2 absent
    assert(out == List(
      (0L, 1L, 5L, 12L, 12L),
      (1L, 1L, 5L, 12L, 12L),
      (3L, 2L, 2L, 16L, 8L)), s"got $out")
  }

  test("paragraph dedup keeps exactly the first occurrence of each segment") {
    // doc 0: 32 words = segments A,B. doc 1: repeats segment A then 16
    // fresh words C (A must be dropped, C kept). doc 2: exact copy of
    // doc 0 (both segments dropped). doc 3: 8 words (one short unique
    // segment, kept whole).
    val segA = (1 to 16).map(i => s"a$i").mkString(" ")
    val segB = (1 to 16).map(i => s"b$i").mkString(" ")
    val segC = (1 to 16).map(i => s"c$i").mkString(" ")
    val short = (1 to 8).map(i => s"s$i").mkString(" ")
    val dir = tmpDir("paradedup")
    writeDocs(dir, Seq(
      (0L, segA + " " + segB, "s"),
      (1L, segA + " " + segC, "s"),
      (2L, segA + " " + segB, "s"),
      (3L, short, "s")))
    val out = SparkEntry.queries("dedup_paragraph")(spark, dir)
      .select("doc_id", "n_segs", "n_kept", "n_removed", "kept_words")
      .as[(Long, Long, Long, Long, Long)].collect().toList.sortBy(_._1)
    assert(out == List(
      (0L, 2L, 2L, 0L, 32L),
      (1L, 2L, 1L, 1L, 16L),
      (2L, 2L, 0L, 2L, 0L),
      (3L, 1L, 1L, 0L, 8L)), s"got $out")
  }

  test("paragraph rewrite rebuilds exactly the surviving text") {
    val segA = (1 to 16).map(i => s"a$i").mkString(" ")
    val segB = (1 to 16).map(i => s"b$i").mkString(" ")
    val segC = (1 to 16).map(i => s"c$i").mkString(" ")
    val dir = tmpDir("pararw")
    writeDocs(dir, Seq(
      (0L, segA + " " + segB, "s"),
      (1L, segA + " " + segC, "s"),
      (2L, segA + " " + segB, "s")))
    def m(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = SparkEntry.queries("dedup_paragraph_rewrite")(spark, dir)
      .select("doc_id", "n_kept", "rebuilt_words", "rebuilt_digest")
      .as[(Long, Long, Long, String)].collect().toList.sortBy(_._1)
    assert(out == List(
      (0L, 2L, 32L, m(segA + " " + segB)), // first occurrence: intact
      (1L, 1L, 16L, m(segC)),              // segA deduped away
      (2L, 0L, 0L, m(""))), s"got $out")   // full duplicate: empty
  }

  test("paragraph dedup invariants hold on the fixture corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dedup_paragraph")(spark, dir)
    val rows = out.select("doc_id", "n_segs", "n_kept", "n_removed")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 500) // every document reports
    assert(rows.forall { case (_, s, k, r) => s == k + r && k >= 0 && r >= 0 })
    // total kept = number of distinct segment hashes in the corpus
    val distinctSegs = graft.queries.Q.table(spark, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS ws")
      .selectExpr("explode(sequence(0, (size(ws) + 15) div 16 - 1)) AS i",
        "ws")
      .selectExpr("md5(array_join(slice(ws, i * 16 + 1, 16), ' ')) AS h")
      .distinct().count()
    assert(rows.map(_._3).sum == distinctSegs)
  }

  test("negative-sampling table follows the unigram^0.75 law exactly") {
    // counts 16 vs 1: mass ratio must be 16^0.75 = 8 (computed via the
    // same sqrt∘sqrt chain, so the check is exact in milli-units)
    val dir = tmpDir("negtab")
    writeDocs(dir, Seq(
      (0L, Array.fill(16)("aa").mkString(" "), "s"),
      (1L, "bb", "s")))
    val out = SparkEntry.queries("corpus_negative_table")(spark, dir)
      .select("term", "cnt", "p_ppm")
      .as[(String, Long, Long)].collect().toList.sortBy(_._1)
    assert(out.map(t => (t._1, t._2)) == List(("aa", 16L), ("bb", 1L)))
    val Seq(pa, pb) = out.map(_._3)
    // weights: 8000 and 1000 milli-units → ppm = 888888 and 111111
    assert(pa == 888888L && pb == 111111L, s"got $pa / $pb")
    // full-corpus sanity: masses are positive, bounded, monotone in cnt
    val fix = SparkEntry.queries("corpus_negative_table")(
        spark, "/root/testdata/sf0.001")
      .select("cnt", "p_ppm").as[(Long, Long)].collect()
    assert(fix.forall { case (_, p) => p > 0 && p < 1000000 })
    assert(fix.map(_._2).sum <= 1000000)
    val sorted = fix.sortBy(-_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
      "sampling mass must be monotone in word count")
  }

  test("tokenizer fertility reconciles with per-document encode totals") {
    val dir = "/root/testdata/sf0.001"
    val fert = SparkEntry.queries("text_tokenizer_fertility")(spark, dir)
      .select("lang", "n_words", "n_tokens", "fertility_ppm")
      .as[(String, Long, Long, Long)].collect()
    assert(fert.length == 5)
    // a word encodes to >= 1 piece, so fertility is always >= 1.0
    assert(fert.forall { case (_, w, t, f) =>
      t >= w && f >= 1000000L && f == t * 1000000L / w })
    // language totals must add up to the per-document encode totals
    val enc = SparkEntry.queries("text_bpe_encode")(spark, dir)
      .agg(sum("n_words"), sum("n_tokens"))
      .as[(Long, Long)].head()
    assert((fert.map(_._2).sum, fert.map(_._3).sum) == enc)
  }

  /** Sequential reference BPE trainer — the same semantics as
    * PropertiesSpec.refBpe (argmax by support desc / l asc / r asc,
    * String.replace merge, early stop on exhaustion). */
  private def refMerges(words: Map[String, Long],
      rounds: Int): List[(String, String)] = {
    var dict = words.toList.map { case (w, c) =>
      ("|" + w.map(_.toString).mkString("|") + "|", c)
    }
    val out = List.newBuilder[(String, String)]
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
        val ((l, rr), _) = pairs.toList
          .minBy { case ((pl, pr), s) => (-s, pl, pr) }
        out += ((l, rr))
        dict = dict.map { case (sym, wc) =>
          (sym.replace(s"|$l|$rr|", s"|$l$rr|"), wc)
        }
      }
      r += 1
    }
    out.result()
  }

  test("bpe encode matches the sequential reference tokenizer") {
    val texts = Seq(
      (0L, "the cat sat on the mat with the cat", "s"),
      (1L, "catalog of cats 42 !! a", "s"),
      (2L, "mat mat mat the the catalog", "s"))
    val dir = tmpDir("bpe-enc")
    writeDocs(dir, texts)
    val got = SparkEntry.queries("text_bpe_encode")(spark, dir)
      .select("doc_id", "n_words", "n_tokens")
      .as[(Long, Long, Long)].collect().toList.sortBy(_._1)
    val wordCounts = texts.flatMap(_._2.split(" "))
      .filter(_.matches("^[a-z]{2,}$"))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val merges = refMerges(wordCounts, rounds = 8)
    def encode(w: String): Long =
      if (!w.matches("^[a-z]{2,}$")) w.length.toLong
      else {
        var sym = "|" + w.map(_.toString).mkString("|") + "|"
        merges.foreach { case (l, r) =>
          sym = sym.replace(s"|$l|$r|", s"|$l$r|")
        }
        sym.split("\\|").count(_.nonEmpty).toLong
      }
    val want = texts.map { case (id, t, _) =>
      val ws = t.split(" ", -1)
      (id, ws.length.toLong, ws.map(encode).sum)
    }.toList.sortBy(_._1)
    assert(got == want, s"got $got want $want")
    // the learned vocabulary genuinely compresses: the most frequent
    // words merge into fewer pieces than characters
    assert(got.map(_._3).sum < texts.map(_._2.count(_ != ' ')).sum,
      "trained merges must reduce the token count below character level")
  }

  test("quality classifier separates the planted label clusters") {
    // 30 long stopword-bearing docs (label 1) vs 30 five-word docs
    // (label 0): after 4 fixed-point gradient rounds the learned linear
    // model must score the two clusters apart
    val good = (0 until 30).map(i => (i.toLong,
      ("w" + i + " the apple ") * 13 + "end", "s"))
    val bad = (0 until 30).map(i => ((100 + i).toLong,
      s"tiny doc number $i here", "s"))
    val dir = tmpDir("clf")
    writeDocs(dir, good ++ bad)
    val w = SparkEntry.queries("corpus_quality_classifier")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(w.size == 17)
    assert(w.values.exists(_ != 0L), "training must move the weights")
    // independent scorer: same md5-bucket features, same hard sigmoid
    def bucket(word: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(word.getBytes("UTF-8"))
      (d(0) >> 4) & 0xf
    }
    def p(text: String): Double = {
      val z = text.split(" ", -1).map(w0 => w(bucket(w0).toLong)).sum +
        w(16L)
      math.min(math.max(z / 4000000.0 + 0.5, 0.0), 1.0)
    }
    val pGood = good.map(g => p(g._2)).sum / good.size
    val pBad = bad.map(b => p(b._2)).sum / bad.size
    assert(pGood > pBad + 0.2,
      s"classifier must separate clusters: pGood=$pGood pBad=$pBad")
  }

  test("pca power iteration converges to the dominant eigendirection") {
    // independent witness: plain double-precision power iteration (no
    // quantization, 25 rounds) on the collected sf0.001 embeddings — the
    // engine's 3 quantized rounds must already align with the dominant
    // eigendirection of XᵀX
    val dir = "/root/testdata/sf0.001"
    val v = SparkEntry.queries("embedding_pca_power")(spark, dir)
      .as[(Long, Double)].collect().sortBy(_._1).map(_._2)
    assert(v.length == 64)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9, s"loadings must be unit-norm: $norm")
    val xs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    def powerIter(rounds: Int): Array[Double] = {
      var ref = Array.fill(64)(1.0)
      for (_ <- 1 to rounds) {
        val nxt = Array.fill(64)(0.0)
        xs.foreach { x =>
          var s = 0.0
          var j = 0
          while (j < 64) { s += x(j) * ref(j); j += 1 }
          j = 0
          while (j < 64) { nxt(j) += x(j) * s; j += 1 }
        }
        val n = math.sqrt(nxt.map(t => t * t).sum)
        ref = nxt.map(_ / n)
      }
      ref
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      math.abs(a.zip(b).map { case (x, y) => x * y }.sum)
    // faithfulness: the distributed quantized rounds implement the same
    // iteration — micro-quantization must not bend the direction. (The
    // fixture's random embeddings have a near-degenerate spectrum, so
    // CONVERGENCE isn't assertable there — that's what the planted
    // corpus below is for.)
    assert(cos(v, powerIter(8)) > 0.999,
      "quantized rounds must match the same-round reference")
    // convergence, on a corpus with a real eigengap: vectors lie along a
    // known direction u plus small deterministic noise — 8 rounds must
    // recover u
    val u0 = (0 until 64).map(j => math.sin(j + 1.0)).toArray
    val un = math.sqrt(u0.map(t => t * t).sum)
    val u = u0.map(_ / un)
    def noise(i: Int, j: Int): Double =
      (((i * 31 + j * 17) % 97) - 48) / 4800.0 // deterministic, ±0.01
    val planted = (0 until 200).map { i =>
      val scale = 1.0 + (i % 5) * 0.1
      (i.toLong,
        (0 until 64).map(j => (scale * u(j) + noise(i, j)).toFloat),
        0)
    }
    val pdir = tmpDir("pca-planted")
    planted.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$pdir/embeddings.parquet")
    val pv = SparkEntry.queries("embedding_pca_power")(spark, pdir)
      .as[(Long, Double)].collect().sortBy(_._1).map(_._2)
    assert(cos(pv, u) > 0.99,
      s"8 rounds must recover the planted direction: ${cos(pv, u)}")
  }

  test("curation funnel counts are monotone and agree with the standalone stages") {
    val dir = "/root/testdata/sf0.001"
    val f = SparkEntry.queries("corpus_curation_funnel")(spark, dir)
      .as[(Long, String, Long)].collect().toList.sortBy(_._1)
    assert(f.map(_._2) == List("raw", "quality", "exact_dedup",
      "near_dedup", "decontaminated"))
    val counts = f.map(_._3)
    assert(counts == counts.sorted.reverse, s"funnel must be monotone: $f")
    assert(counts.head ==
      spark.read.parquet(s"$dir/documents.parquet").count())
    // stage 4 must equal the standalone corpus_curation survivor count
    val curated = SparkEntry.queries("corpus_curation")(spark, dir).count()
    assert(counts(3) == curated)
    assert(counts.last >= 1)
  }

  test("pca projection applies the learned loadings row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val v = SparkEntry.queries("embedding_pca_power")(spark, dir)
      .as[(Long, Double)].collect().sortBy(_._1).map(_._2)
    val got = SparkEntry.queries("embedding_pca_project")(spark, dir)
      .as[(Long, Long)].collect().toMap
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    assert(got.size == emb.length)
    emb.take(50).foreach { case (id, x) =>
      // same fold order as the engine: ((0 + t1) + t2) + ... then *1e6
      var s = 0.0
      (0 until 64).foreach(j => s = s + x(j).toDouble * v(j))
      val want = new java.math.BigDecimal(s * 1000000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      assert(got(id) == want, s"vec $id: got ${got(id)} want $want")
    }
  }

  test("query expansion feeds back real feedback-set terms and re-ranks") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("ir_query_expansion")(spark, dir)
      .as[(Long, Long, Long, String)].collect().toList.sortBy(_._3)
    assert(rows.size == 20)
    assert(rows.map(_._3) == (1L to 20L).toList)
    // scores are ranked descending with the doc_id tiebreak
    assert(rows.map(_._2) == rows.map(_._2).sorted.reverse)
    val expansion = rows.head._4.split(",").toList
    assert(expansion.size == 3 && expansion.distinct.size == 3)
    val seeds = Set("merge", "scan", "filter")
    assert(expansion.forall(t => !seeds.contains(t)),
      s"expansion must exclude the seed terms: $expansion")
    // every expansion term genuinely occurs in the corpus
    val vocab = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").as[String].collect()
      .flatMap(_.split(" ")).toSet
    assert(expansion.forall(vocab.contains), s"unknown terms: $expansion")
    // the winning doc matches the expanded query
    val topDoc = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === rows.head._1)
      .select("text").as[String].head().split(" ").toSet
    assert((seeds ++ expansion).exists(topDoc.contains))
  }

  test("source profile shares are exact ppm fractions that cover the corpus") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("corpus_source_profile")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toList
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(rows.map(_._2).sum == docs.count())
    val tot = rows.map(_._3).sum
    rows.foreach { case (src, _, nTok, nLangs, ppm) =>
      assert(ppm == nTok * 1000000L / tot, s"$src share must be exact")
      assert(nLangs >= 1 && nLangs <= 5)
    }
    // ppm shares sum to ~1e6 (short only by the 20 truncations)
    val s = rows.map(_._5).sum
    assert(s > 1000000L - rows.size && s <= 1000000L, s"ppm sum $s")
  }

  test("dsir ranks target-vocabulary documents above the rest, regardless of source") {
    // vocab A defines the target domain (all of src0 plus 20 src1 docs
    // written in it); vocab B is everything else. Every A-vocab doc must
    // outscore every B-vocab doc — DSIR scores text similarity to the
    // target DISTRIBUTION, not source labels
    val aWords = (1 to 10).map(i => s"alpha$i")
    val bWords = (1 to 10).map(i => s"beta$i")
    def doc(words: Seq[String], seed: Int): String =
      (0 until 30).map(k => words((k * 7 + seed) % words.size))
        .mkString(" ")
    val dir = tmpDir("dsir")
    writeDocs(dir,
      (0 until 20).map(i => (i.toLong, doc(aWords, i), "src0")) ++
      (0 until 20).map(i => ((100 + i).toLong, doc(aWords, i), "src1")) ++
      (0 until 20).map(i => ((200 + i).toLong, doc(bWords, i), "src1")))
    val got = SparkEntry.queries("corpus_dsir_sample")(spark, dir)
      .as[(Long, Long)].collect().toList
    assert(got.size == 50)
    val aScores = got.filter(_._1 < 200).map(_._2)
    val bScores = got.filter(_._1 >= 200).map(_._2)
    assert(aScores.size == 40, "every A-vocab doc must make the sample")
    assert(aScores.min > bScores.max,
      s"A-vocab docs must outscore B-vocab docs: ${aScores.min} vs ${bScores.max}")
  }
}
