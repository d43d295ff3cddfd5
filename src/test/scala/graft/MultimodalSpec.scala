package graft

import graft.multimodal.{MediaRow, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary schema, partition-parallel decode batches,
  * chunk sampling — plus the REAL codecs (BMP/PNG/JPEG/GIF header +
  * payload, PCM WAV, Y4M video): round-trips, strict refusals, and the
  * synthetic corpus decoding end-to-end. Only true compressed-video
  * codecs (MP4/H.264) remain on the documented deterministic stub.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Multimodal.syntheticFromDocuments(spark,
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  test("binary media table: typed schema, deterministic payloads") {
    val m = corpus()
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.count() == 500)
    val types = m.select("media_type").distinct().as[String].collect().toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("feature extraction is partition-parallel and deterministic") {
    val m = corpus().repartition(8)
    val f1 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(m.repartition(3)).collect()
      .sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.toSeq == f2.toSeq) // partitioning must not change results
    assert(f1.forall(_.ok))
    assert(f1.forall(f => f.n_bytes > 0 && f.fingerprint.length == 16))
    // video decodes for real now: frame count from the Y4M walk
    val video = f1.filter(_.media_type == "video")
    assert(video.forall(f => f.n_frames == 2 + (f.media_id % 5).toInt))
  }

  test("BMP, PNG, JPEG, GIF, WAV and Y4M all decode for real") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", length($"text").as("len"))
      .as[(Long, Int)].collect().toMap
    val f = Multimodal.extractFeatures(corpus()).collect()
    f.filter(_.media_type == "image").foreach { r =>
      // dimensions must be exactly what the generator wrote to the header
      (r.media_id % 6) match {
        case 0 =>
          assert(r.width == 1 + (docs(r.media_id) % 64), s"bmp width: $r")
          assert(r.height == 1 + (r.media_id % 32).toInt, s"bmp height: $r")
        case 2 =>
          assert(r.width == 1 + (docs(r.media_id) % 128), s"png width: $r")
          assert(r.height == 1 + (r.media_id % 64).toInt, s"png height: $r")
        case 4 =>
          assert(r.width == 1 + (docs(r.media_id) % 256), s"jpeg width: $r")
          assert(r.height == 1 + (r.media_id % 48).toInt, s"jpeg height: $r")
        case _ =>
          assert(r.media_id % 6 == 5, s"unexpected image stratum: $r")
          assert(r.width == 1 + (docs(r.media_id) % 200), s"gif width: $r")
          assert(r.height == 1 + (r.media_id % 40).toInt, s"gif height: $r")
      }
      assert(r.n_frames == 1 && r.ok)
    }
    f.filter(_.media_type == "video").foreach { r =>
      assert(r.width == 1 + (docs(r.media_id) % 48), s"y4m width: $r")
      assert(r.height == 1 + (r.media_id % 32).toInt, s"y4m height: $r")
      assert(r.n_frames == 2 + (r.media_id % 5).toInt, s"y4m frames: $r")
      assert(r.ok)
    }
    f.filter(_.media_type == "audio").foreach { r =>
      val channels = 1 + (r.media_id % 2).toInt
      val rate = if (r.media_id % 8 == 1) 16000 else 8000
      assert(r.width == rate && r.height == channels, s"wav header: $r")
      // 16-bit PCM: payload bytes / (channels * 2) sample frames
      assert(r.n_frames == docs(r.media_id) / (channels * 2), s"wav frames: $r")
    }
    // malformed blobs of a decodable type degrade to the stub, not a crash
    val bad = Seq(MediaRow(99L, "image",
      "BMnot-actually-a-bitmap".getBytes, "s")).toDS()
    val br = Multimodal.extractFeatures(bad).collect().head
    assert(br.ok && br.width > 0 && br.height > 0 && br.n_frames == 1)
  }

  test("PNG payload round-trips through deflate + all five scanline filters") {
    // height ≥ 5 ⇒ the encoder's y%5 filter cycle exercises
    // None/Sub/Up/Average/Paeth; adversarial pixel content (every byte
    // value, plus structure that makes each predictor matter)
    for ((w, h) <- Seq((1, 7), (3, 5), (17, 11), (64, 6))) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 31 + i / 7) % 256).toByte)
      val png = Multimodal.pngRgb(w, h, rgb)
      val img = Multimodal.decodePngPixels(png)
        .getOrElse(fail(s"decode failed for ${w}x$h"))
      assert(img.width == w && img.height == h)
      assert(java.util.Arrays.equals(img.pixels, rgb), s"pixels diverge ${w}x$h")
    }
    // corruption is refused, not mis-decoded: a flipped IDAT byte breaks
    // that chunk's CRC
    val good = Multimodal.pngRgb(4, 5, Array.fill(60)(7.toByte))
    val corrupt = good.clone()
    corrupt(45) = (corrupt(45) ^ 0x01).toByte
    assert(Multimodal.decodePngPixels(corrupt).isEmpty)
    // truncation (IEND lost) is refused
    assert(Multimodal.decodePngPixels(good.dropRight(13)).isEmpty)
    // corpus PNG blobs carry real zlib pixel payloads: full decode works
    // on the synthetic media table itself, not just hand-built fixtures
    val m = corpus().filter(_.media_id % 6 == 2).head(1).head
    val dec = Multimodal.decodePngPixels(m.content)
    assert(dec.exists(img => img.pixels.length == img.width * img.height * 3))
  }

  test("GIF payload round-trips through variable-width LZW") {
    def roundTrip(w: Int, h: Int, idx: Array[Byte]): Unit = {
      val gif = Multimodal.gifIndexed(w, h, idx)
      val img = Multimodal.decodeGifPixels(gif)
        .getOrElse(fail(s"decode failed for ${w}x$h"))
      assert(img.width == w && img.height == h)
      assert(java.util.Arrays.equals(img.indices, idx), s"indices diverge ${w}x$h")
    }
    // small shapes + the corpus formula at its max corpus dimensions
    for ((w, h) <- Seq((1, 1), (7, 3), (200, 40)))
      roundTrip(w, h, Array.tabulate(w * h)(i => ((i % w + 5 * (i / w)) % 256).toByte))
    // a constant run: the decoder's KwKwK (code == next) case fires on
    // nearly every code
    roundTrip(64, 64, Array.fill(4096)(42.toByte))
    // EOI-width boundary: this shape's final data code is the decoder's
    // 2^9 - 1'th table add, so it widens BEFORE reading EOI — the encoder
    // must mirror that phantom add or EOI is written narrow (regression:
    // the sweep's original failure at id=5, w=77, h=6)
    roundTrip(77, 6, Array.tabulate(77 * 6) { i =>
      ((i % 77 + 5 * (i / 77) + 35) % 256).toByte
    })
    // high-entropy content large enough that the dictionary hits 4096
    // and the encoder emits a mid-stream Clear: exercises reset on both
    // sides plus every width step 9→10→11→12
    var seed = 12345L
    val noisy = Array.fill(160 * 160) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) & 0xff).toByte
    }
    roundTrip(160, 160, noisy)
    // truncation is refused, not mis-decoded: losing the tail drops the
    // block terminator / EOI
    val good = Multimodal.gifIndexed(9, 9, Array.tabulate(81)(_.toByte))
    assert(Multimodal.decodeGifPixels(good.dropRight(8)).isEmpty)
    assert(Multimodal.decodeGifPixels(good.take(12)).isEmpty)
    // corpus GIF blobs carry real LZW payloads that decode back to the
    // generator's closed-form indices — full fidelity, not just shape
    val doc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)]
      .filter(_._1 % 6 == 5).head(1).head
    val (id, text) = doc
    val m = corpus().filter(_.media_id == id).head(1).head
    val dec = Multimodal.decodeGifPixels(m.content)
      .getOrElse(fail("corpus GIF blob failed to decode"))
    val w = 1 + (text.length % 200); val h = 1 + (id % 40).toInt
    val expected = Array.tabulate(w * h) { i =>
      ((i % w + 5 * (i / w) + 7 * id) % 256).toByte
    }
    assert(dec.width == w && dec.height == h)
    assert(java.util.Arrays.equals(dec.indices, expected))
  }

  test("JPEG entropy layer round-trips arbitrary coefficient blocks") {
    // adversarial coefficients: max-magnitude positive/negative values,
    // isolated coefficients forcing long zero runs and ZRL, a fully
    // populated block, and DC prediction swinging across its full range
    val blocks = Array(
      Array.tabulate(64)(i => if (i == 0) 1016 else 0),             // max DC
      Array.tabulate(64)(i => if (i == 0) -1024 else 0),            // min DC (max diff)
      Array.tabulate(64)(i => if (i == 63) -1023 else 0),           // 62-zero run → ZRL×3
      Array.tabulate(64)(i => if (i % 7 == 0) (i - 32) * 13 else 0),// scattered
      Array.tabulate(64)(i => ((i * 37 + 11) % 2047) - 1023),       // dense
      Array.tabulate(64)(i => if (i == 1) 1 else 0))                // AC then EOB
    val jpeg = Multimodal.jpegEncodeGray(48, 8, blocks)
    val (w, h, got) = Multimodal.decodeJpegCoeffs(jpeg)
      .getOrElse(fail("coefficient decode failed"))
    assert(w == 48 && h == 8 && got.length == blocks.length)
    blocks.zip(got).zipWithIndex.foreach { case ((want, have), i) =>
      assert(java.util.Arrays.equals(want, have), s"block $i diverged")
    }
  }

  test("JPEG flat-block pixels decode bit-exactly, incl. MCU crop") {
    // non-multiple-of-8 dimensions: the decoder must crop the padded MCU
    // grid back to w×h; every pixel equals its block's constant value
    for ((w, h) <- Seq((1, 1), (8, 8), (13, 5), (100, 23), (256, 48))) {
      val f = (bx: Int, by: Int) => (7 * bx + 3 * by + 5) % 256
      val img = Multimodal.decodeJpegPixels(Multimodal.jpegGrayFlat(w, h, f))
        .getOrElse(fail(s"pixel decode failed for ${w}x$h"))
      assert(img.width == w && img.height == h)
      var i = 0
      while (i < img.gray.length) {
        val x = i % w; val y = i / w
        assert((img.gray(i) & 0xff) == f(x / 8, y / 8),
          s"pixel ($x,$y) diverged at ${w}x$h")
        i += 1
      }
    }

    // strict refusals: truncated entropy stream, corrupted marker, a
    // progressive frame (SOF2), and a missing Huffman table
    val good = Multimodal.jpegGrayFlat(32, 16, (a, b) => 128)
    assert(Multimodal.decodeJpegPixels(good.dropRight(20)).isEmpty)
    val sof2 = good.clone()
    // SOI(2) + DQT(69) puts the SOF0 marker byte at offset 72
    assert((sof2(72) & 0xff) == 0xc0, "fixture layout changed")
    sof2(72) = 0xc2.toByte
    assert(Multimodal.decodeJpegPixels(sof2).isEmpty)
    val noDht = good.take(84) ++ good.drop(84 + 212) // excise DHT segment
    assert(Multimodal.decodeJpegPixels(noDht).isEmpty)

    // corpus JPEG blobs carry real entropy-coded payloads: full decode
    // works on the synthetic media table itself
    val m = corpus().filter(_.media_id % 6 == 4).head(1).head
    val dec = Multimodal.decodeJpegPixels(m.content)
    assert(dec.exists(img => img.gray.length == img.width * img.height))
  }

  test("nearest-neighbor resize samples the floor mapping exactly") {
    val w = 7; val h = 5
    val px = Array.tabulate(w * h * 3)(i => (i % 251).toByte)
    val img = Multimodal.PngImage(w, h, px)
    // identity resize is a pixel-perfect copy
    val same = Multimodal.resizeNearest(img, w, h)
    assert(java.util.Arrays.equals(same.pixels, px))
    // downscale: target (x,y) reads source (⌊x·w/tw⌋, ⌊y·h/th⌋)
    val down = Multimodal.resizeNearest(img, 3, 2)
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3) {
      val sx = x * w / 3; val sy = y * h / 2
      assert(down.pixels((y * 3 + x) * 3 + c) == px((sy * w + sx) * 3 + c),
        s"down ($x,$y,$c)")
    }
    // upscale replicates source pixels, never reads out of bounds
    val up = Multimodal.resizeNearest(img, 15, 11)
    for (y <- 0 until 11; x <- 0 until 15; c <- 0 until 3) {
      val sx = x * w / 15; val sy = y * h / 11
      assert(up.pixels((y * 15 + x) * 3 + c) == px((sy * w + sx) * 3 + c),
        s"up ($x,$y,$c)")
    }
    // resized output re-encodes as a valid PNG and round-trips
    val re = Multimodal.decodePngPixels(
      Multimodal.pngRgb(down.width, down.height, down.pixels))
    assert(re.exists(r => java.util.Arrays.equals(r.pixels, down.pixels)))
  }

  test("WAV payload round-trips through the RIFF chunk walk as 16-bit PCM") {
    // canonical layout: every sample survives, sign-extended
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345, 256)
    val payload = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(payload.putShort)
    val wav = Multimodal.wavBytes(2, 16000, payload.array())
    val a = Multimodal.decodeWavSamples(wav).getOrElse(fail("decode failed"))
    assert(a.sampleRate == 16000 && a.channels == 2)
    assert(java.util.Arrays.equals(a.samples, samples))

    // a trailing partial frame is dropped: 2 channels × 16 bits = 4-byte
    // frames, so 7 payload bytes yield exactly one frame (2 samples)
    val odd = Multimodal.decodeWavSamples(
      Multimodal.wavBytes(2, 8000, Array.fill(7)(0x41.toByte)))
      .getOrElse(fail("odd-payload decode failed"))
    assert(odd.samples.length == 2)

    // the chunk walk is generic, not offset-44 arithmetic: an unknown
    // odd-length chunk (with RIFF pad byte) between fmt and data must be
    // skipped, and the data chunk still found
    val extra = {
      val data = Array[Byte](0x10, 0x20, 0x30, 0x40)
      val out = java.nio.ByteBuffer.allocate(12 + 24 + (8 + 3 + 1) + 8 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(24 + 12 + 12 + 4).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("LIST".getBytes).putInt(3).put("abc".getBytes).put(0.toByte)
        .put("data".getBytes).putInt(4).put(data)
      out.array()
    }
    val e = Multimodal.decodeWavSamples(extra).getOrElse(fail("chunk walk failed"))
    assert(e.samples.toSeq == Seq(0x2010.toShort, 0x4030.toShort))

    // strict refusals: non-PCM format code, 8-bit samples, overrunning
    // chunk length, truncated blob
    val nonPcm = Multimodal.wavBytes(1, 8000, Array.fill(4)(1.toByte))
    nonPcm(20) = 3 // format code 3 = IEEE float
    assert(Multimodal.decodeWavSamples(nonPcm).isEmpty)
    val eightBit = Multimodal.wavBytes(1, 8000, Array.fill(4)(1.toByte))
    eightBit(34) = 8
    assert(Multimodal.decodeWavSamples(eightBit).isEmpty)
    val overrun = Multimodal.wavBytes(1, 8000, Array.fill(4)(1.toByte))
    overrun(40) = 100 // data chunk claims more bytes than exist
    assert(Multimodal.decodeWavSamples(overrun).isEmpty)
    assert(Multimodal.decodeWavSamples(wav.take(30)).isEmpty)

    // and the corpus audio blobs decode end-to-end: samples are exactly
    // the document's ASCII bytes as little-endian int16 pairs
    val m = corpus().filter(_.media_id % 6 == 1).head(1).head
    val doc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" === m.media_id).select($"text").as[String].head()
    val got = Multimodal.decodeWavSamples(m.content).get
    val bytes = doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val want = (0 until got.samples.length).map(i =>
      ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort)
    assert(got.samples.toSeq == want)
  }

  test("Y4M video round-trips: header params, frame markers, luma planes") {
    val w = 5; val h = 3
    val frames = Array.tabulate(4)(f =>
      Array.tabulate(w * h)(i => ((i * 7 + f * 31) % 256).toByte))
    val v = Multimodal.decodeY4m(Multimodal.y4mBytes(w, h, frames))
      .getOrElse(fail("y4m decode failed"))
    assert(v.width == w && v.height == h && v.frames.length == 4)
    (0 until 4).foreach(f =>
      assert(java.util.Arrays.equals(v.frames(f), frames(f)), s"frame $f"))

    // header parsing is parameter-order-independent per spec: W/H/C
    // located by tag, unknown params (X metadata) skipped
    val reordered =
      ("YUV4MPEG2 F25:1 Cmono Xmeta H2 W3 A1:1 Ip\n" + "FRAME\n")
        .getBytes("US-ASCII") ++ Array.tabulate(6)(_.toByte)
    val r = Multimodal.decodeY4m(reordered).getOrElse(fail("reorder failed"))
    assert(r.width == 3 && r.height == 2 && r.frames.length == 1)
    // frame-local parameters after the FRAME tag are legal and skipped
    val frameParams =
      ("YUV4MPEG2 W2 H2 Cmono\n" + "FRAME Ip\n").getBytes("US-ASCII") ++
        Array[Byte](9, 8, 7, 6)
    val fp = Multimodal.decodeY4m(frameParams)
      .getOrElse(fail("frame-param decode failed"))
    assert(fp.frames.head.toSeq == Seq[Byte](9, 8, 7, 6))

    // strict refusals: bad magic, unsupported colorspace (the spec
    // default 420jpeg when C is absent), truncated final plane, and a
    // corrupt frame marker
    assert(Multimodal.decodeY4m("JUNK W2 H2\nFRAME\nxxxx".getBytes).isEmpty)
    assert(Multimodal.decodeY4m(
      ("YUV4MPEG2 W2 H2\nFRAME\n".getBytes("US-ASCII") ++
        Array[Byte](1, 2, 3, 4))).isEmpty)
    val good = Multimodal.y4mBytes(w, h, frames)
    assert(Multimodal.decodeY4m(good.dropRight(1)).isEmpty)
    val corrupt = good.clone()
    corrupt(good.indexOfSlice("FRAME".getBytes)) = 'G'
    assert(Multimodal.decodeY4m(corrupt).isEmpty)
  }

  test("audio features are integer-exact on a known signal") {
    // channel-0 of an interleaved stereo stream: [10, 0, 10, 0, 10]
    // (channel 1 is constant 7 and must not leak into the features)
    val ch0 = Array[Short](10, 0, 10, 0, 10)
    val payload = java.nio.ByteBuffer.allocate(ch0.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ch0.foreach { v => payload.putShort(v); payload.putShort(7.toShort) }
    val a = Multimodal.decodeWavSamples(
      Multimodal.wavBytes(2, 8000, payload.array())).get
    val n = a.samples.length / a.channels
    val s0 = (0 until n).map(i => a.samples(i * a.channels).toLong)
    assert(s0 == Seq(10L, 0L, 10L, 0L, 10L))
    val mean = s0.sum / n                       // 30/5 = 6
    assert(mean == 6L)
    val energy = s0.map(v => v * v).sum         // 3*100 = 300
    assert(energy == 300L)
    val zc = s0.sliding(2).count(p =>
      (p(0) - mean) * (p(1) - mean) < 0)        // every adjacent pair flips
    assert(zc == 4L)
    val tv = s0.sliding(2).map(p => math.abs(p(1) - p(0))).sum
    assert(tv == 40L)
  }

  test("mp4 index round-trips the sample tables exactly") {
    // 5 frames (odd → 2-sample chunks + a 1-sample tail chunk), distinct
    // sizes, so stsc expansion and intra-chunk offset accumulation are
    // both exercised
    val frames = Array.tabulate(5)(f =>
      Array.tabulate(10 + 3 * f)(i => ((i + 7 * f) % 256).toByte))
    val mp4 = Multimodal.mp4Bytes(32, 24, 1000, 40, frames)
    val ix = Multimodal.indexMp4(mp4).get
    assert(ix.width == 32 && ix.height == 24 && ix.timescale == 1000L)
    assert(ix.samples.length == 5)
    // offsets: mdat payload starts at 32 (ftyp 24 + header 8), frames
    // back to back
    val expOff = frames.scanLeft(32L)((o, f) => o + f.length).init
    assert(ix.samples.map(_.offset).toSeq == expOff.toSeq)
    assert(ix.samples.map(_.size).toSeq == frames.map(_.length).toSeq)
    assert(ix.samples.map(_.pts).toSeq == Seq(0L, 40L, 80L, 120L, 160L))
    assert(ix.samples.map(_.sync).toSeq ==
      Seq(true, false, false, true, false)) // every 3rd sample
    // the parsed offsets slice back the original payload bytes
    ix.samples.foreach { s =>
      val got = java.util.Arrays.copyOfRange(
        mp4, s.offset.toInt, s.offset.toInt + s.size)
      assert(got.toSeq == frames(s.idx).toSeq)
    }
  }

  test("mp4 single-frame and even-frame chunk layouts both index") {
    for (nf <- Seq(1, 2, 4, 6)) {
      val frames = Array.tabulate(nf)(f => Array.fill(20 + f)(f.toByte))
      val mp4 = Multimodal.mp4Bytes(8, 8, 600, 25, frames)
      val ix = Multimodal.indexMp4(mp4).get
      assert(ix.samples.length == nf, s"nf=$nf")
      assert(ix.samples.map(_.size).toSeq == frames.map(_.length).toSeq)
      // sizes differ per sample, so a mis-expanded chunk map would slice
      // the wrong bytes
      ix.samples.foreach { s =>
        val got = java.util.Arrays.copyOfRange(
          mp4, s.offset.toInt, s.offset.toInt + s.size)
        assert(got.toSeq == frames(s.idx).toSeq, s"nf=$nf idx=${s.idx}")
      }
    }
  }

  test("mp4 parser is strict on malformed input") {
    val frames = Array(Array.fill(30)(1.toByte))
    val good = Multimodal.mp4Bytes(8, 8, 1000, 40, frames)
    assert(Multimodal.indexMp4(good).isDefined)
    // truncation that cuts into moov: box walk must fail, not guess
    assert(Multimodal.indexMp4(
      java.util.Arrays.copyOfRange(good, 0, good.length - 20)).isEmpty)
    // garbage
    assert(Multimodal.indexMp4(Array.fill(64)(0x41.toByte)).isEmpty)
    assert(Multimodal.indexMp4(Array.emptyByteArray).isEmpty)
    // a corrupted stco offset pointing past EOF must be rejected
    val bad = good.clone()
    // find stco and stomp its first offset to a huge value
    val i = (0 until bad.length - 4).find(j =>
      bad(j) == 's' && bad(j + 1) == 't' && bad(j + 2) == 'c' &&
        bad(j + 3) == 'o').get
    bad(i + 8) = 0x7f.toByte // first offset's high byte → far past EOF
    assert(Multimodal.indexMp4(bad).isEmpty)

    // a 32-bit stsz size with bit 31 set truncates to a negative Int —
    // must be rejected, never walked backwards
    val negSz = good.clone()
    val iz = (0 until negSz.length - 4).find(j =>
      negSz(j) == 's' && negSz(j + 1) == 't' && negSz(j + 2) == 's' &&
        negSz(j + 3) == 'z').get
    // stsz payload: vf(4) uniform(4) count(4) sizes — first size's high
    // byte sits at tag+16
    negSz(iz + 16) = 0x80.toByte
    assert(Multimodal.indexMp4(negSz).isEmpty)

    // a non-video handler (first trak audio, the common in-the-wild
    // layout) must be rejected, not parsed as a VisualSampleEntry
    val soun = good.clone()
    val ih = (0 until soun.length - 4).find(j =>
      soun(j) == 'h' && soun(j + 1) == 'd' && soun(j + 2) == 'l' &&
        soun(j + 3) == 'r').get
    // handler_type sits at tag(4) + vf(4) + pre_defined(4)
    "soun".getBytes.zipWithIndex.foreach { case (c, k) =>
      soun(ih + 12 + k) = c
    }
    assert(Multimodal.indexMp4(soun).isEmpty)

    // uniform stsz (sample_size != 0) has no per-entry table to bound the
    // declared count — a crafted count of 0x7FFFFFFF must be rejected by
    // the file-can-justify-it check BEFORE sizing any allocation, not
    // OOM the parser
    val huge = good.clone()
    // stsz payload: vf(4) uniform(4) count(4) — uniform at tag+8,
    // count at tag+12
    huge(iz + 11) = 30.toByte        // uniform = 30 (the real frame size)
    huge(iz + 12) = 0x7f.toByte      // count = 0x7FFFFFFF
    huge(iz + 13) = 0xff.toByte
    huge(iz + 14) = 0xff.toByte
    huge(iz + 15) = 0xff.toByte
    assert(Multimodal.indexMp4(huge).isEmpty)

    // …while a LEGITIMATE uniform stsz (count unchanged, uniform = the
    // true constant size) must still index identically to the per-entry
    // form — the guard bounds, it doesn't over-reject
    val unif = good.clone()
    unif(iz + 11) = 30.toByte        // uniform = 30, count stays 1
    val ui = Multimodal.indexMp4(unif).get
    val gi = Multimodal.indexMp4(good).get
    assert(ui.samples.map(s => (s.offset, s.size, s.pts)).toSeq ==
      gi.samples.map(s => (s.offset, s.size, s.pts)).toSeq)
  }

  test("chunk sampling explodes strided fixed-size binary chunks") {
    val m = corpus().toDF()
    val chunks = Multimodal.sampleChunks(m, chunkBytes = 100, stride = 2)
    val one = chunks.filter($"media_id" === 1).orderBy("chunk_idx").collect()
    val nBytes = m.filter($"media_id" === 1)
      .select(length($"content")).as[Int].collect().head
    val nChunks = math.ceil(nBytes / 100.0).toInt
    val expectedIdx = (0 until nChunks by 2).toSeq
    assert(one.map(_.getAs[Int]("chunk_idx")).toSeq == expectedIdx)
    // every chunk but the last is exactly chunkBytes
    val sizes = one.map(r => r.getAs[Array[Byte]]("chunk").length)
    assert(sizes.init.forall(_ == 100))
  }

  test("perceptual hash: planted identical images collide, hamming-0 pairs surface") {
    import spark.implicits._
    // doc_ids 2 and 770 with identical text generate IDENTICAL PNG
    // pixels: the gradient formula is (px + 2·py + 3c + id) mod 256 and
    // 770 − 2 = 768 ≡ 0 (mod 256), both ids are ≡ 2 (mod 6) (the PNG
    // arm) and share h = id mod 64 = 2; doc 8 differs in size and id.
    val dir = tmpDir("phash")
    Seq((2L, "same words here", "s"),
        (770L, "same words here", "s"),
        (8L, "a very different and much longer text body entirely", "s"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("multimodal_phash")(spark, dir)
      .select("doc_id", "ph_hi", "ph_lo", "n_near")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(out.map(_._1) == List(2L, 8L, 770L))
    val byId = out.map(t => t._1 -> t).toMap
    assert((byId(2L)._2, byId(2L)._3) == (byId(770L)._2, byId(770L)._3),
      "identical images must produce identical dHashes")
    assert(byId(2L)._4 >= 1L && byId(770L)._4 >= 1L,
      "the hamming-0 pair must be found through the bands")
  }
}
