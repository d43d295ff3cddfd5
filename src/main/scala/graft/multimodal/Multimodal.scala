package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media blob: opaque bytes + typed metadata. The schema a 100 TB
  * multimodal corpus table uses — media is NEVER parsed at the relational
  * layer, only by the partition-local decode stage.
  */
case class MediaRow(
    media_id: Long,
    media_type: String, // "image" | "audio" | "video"
    content: Array[Byte],
    source: String)

/** Decoded per-blob features (the output of the decode/feature stage). */
case class MediaFeature(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    fingerprint: String,
    width: Int,
    height: Int,
    n_frames: Int,
    ok: Boolean)

/** Multimodal-column plumbing for a training-data pipeline.
  *
  * Real in this module: the binary-column schema, the partition-parallel
  * batch shape (`mapPartitions` — one decoder init per partition, the same
  * contract a Pandas-batch UDF gives PySpark), the feature schema, the
  * resize/frame-sample dataflow — and REAL decoders: header metadata for
  * BMP/PNG/JPEG/GIF/WAV (pure byte arithmetic: DIB header, IHDR, SOFn
  * marker walk, logical screen descriptor, RIFF layout), plus FULL
  * payload decode for five formats: PNG ([[decodePngPixels]]: chunk
  * CRCs, zlib IDAT via `java.util.zip.Inflater`, all five scanline
  * filters reversed), GIF ([[decodeGifPixels]]: variable-width LZW),
  * baseline JPEG ([[decodeJpegPixels]]: canonical Huffman entropy
  * decode, DC prediction, dequant, IDCT), PCM WAV
  * ([[decodeWavSamples]]: RIFF chunk walk, 16-bit samples), and Y4M
  * video ([[decodeY4m]]: YUV4MPEG2 stream header + FRAME-marker walk,
  * one luma plane per frame) — each with its matching encoder. For
  * audio the generic feature triple maps as width = sample rate,
  * height = channels, n_frames = PCM sample frames.
  *
  * MP4 (ISO BMFF) is handled at the CONTAINER level for real:
  * [[mp4Bytes]] writes valid ftyp/mdat/moov files and [[indexMp4]]
  * walks the sample tables (stts/stsc/stsz/stco/stss) into
  * file-absolute per-frame offsets — the locate-frames step a video
  * pipeline runs before any codec.
  *
  * STUBBED — clearly and deliberately: blobs whose PAYLOAD needs a
  * compressed-video codec stack this runtime cannot carry (H.264/VP9
  * etc. — no media libraries ship in this environment) fall back to
  * `decodeStub`, a deterministic function of the bytes, so tests stay
  * exact; swapping in a real codec changes ONE dispatch arm and nothing
  * about the dataflow.
  *
  * Scale notes: decode is embarrassingly parallel and pipelined per
  * partition (no shuffle); feature output is tiny vs input, so the stage is
  * I/O-bound on the media scan — exactly what you want at 100 TB. Blobs
  * larger than ~2 GB must be chunked upstream (parquet binary + JVM array
  * limits), the same constraint any engine has.
  */
object Multimodal {

  @inline private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  @inline private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  @inline private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
  @inline private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private val PngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** REAL PNG header decode: 8-byte signature + IHDR chunk → big-endian
    * width/height at offsets 16/20. Header-only — pixel data needs zlib,
    * which dimensions do not.
    */
  private[multimodal] def decodePng(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length >= 24 && b.take(8).sameElements(PngSignature) &&
        tag(b, 12) == "IHDR") {
      val w = be32(b, 16)
      val h = be32(b, 20)
      if (w > 0 && w <= (1 << 20) && h > 0 && h <= (1 << 20)) Some((w, h, 1))
      else None
    } else None

  /** A fully decoded 8-bit-truecolor PNG: dimensions + row-major RGB
    * bytes (3 per pixel), the output of [[decodePngPixels]]. */
  final case class PngImage(width: Int, height: Int, pixels: Array[Byte])

  @inline private def paeth(a: Int, b: Int, c: Int): Int = {
    // standard Paeth predictor (PNG spec §9.4): nearest of left/up/up-left
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunkCrc(tag: String, data: Array[Byte], off: Int,
      len: Int): Int = {
    val crc = new java.util.zip.CRC32
    crc.update(tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    crc.update(data, off, len)
    crc.getValue.toInt
  }

  /** REAL PNG encoder for 8-bit truecolor: signature + IHDR + one IDAT
    * (zlib-deflated filtered scanlines) + IEND, all chunk CRCs genuine.
    * Each scanline y uses filter type y % 5, so a round-trip exercises
    * every PNG filter (None/Sub/Up/Average/Paeth), not just the trivial
    * one. `rgb` is row-major, 3 bytes per pixel, length == w*h*3.
    */
  def pngRgb(width: Int, height: Int,
      rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val stride = width * 3
    val filtered = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val ft = y % 5
      val o = y * (stride + 1)
      filtered(o) = ft.toByte
      var i = 0
      while (i < stride) {
        val raw = rgb(y * stride + i) & 0xff
        val left = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val upLeft =
          if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xff else 0
        val enc = ft match {
          case 0 => raw
          case 1 => raw - left
          case 2 => raw - up
          case 3 => raw - ((left + up) >> 1)
          case _ => raw - paeth(left, up, upLeft)
        }
        filtered(o + 1 + i) = (enc & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater
    deflater.setInput(filtered)
    deflater.finish()
    val buf = new Array[Byte](8192)
    val idat = new java.io.ByteArrayOutputStream
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      idat.write(buf, 0, n)
    }
    deflater.end()
    val idatBytes = idat.toByteArray
    val out = java.nio.ByteBuffer
      .allocate(8 + 25 + 12 + idatBytes.length + 12)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte)
    out.put(PngSignature)
      .putInt(13).put("IHDR".getBytes)
      .put(ihdr.array())
      .putInt(chunkCrc("IHDR", ihdr.array(), 0, 13))
      .putInt(idatBytes.length).put("IDAT".getBytes).put(idatBytes)
      .putInt(chunkCrc("IDAT", idatBytes, 0, idatBytes.length))
      .putInt(0).put("IEND".getBytes)
      .putInt(chunkCrc("IEND", Array.emptyByteArray, 0, 0))
    out.array()
  }

  /** REAL PNG payload decode — the codec path the sandbox constraint does
    * NOT excuse, because IDAT is zlib (`java.util.zip.Inflater`) and
    * filters are byte arithmetic. Walks the chunk stream (verifying every
    * CRC), inflates the concatenated IDAT, and reverses the per-scanline
    * filter (all five types). Supports the 8-bit truecolor non-interlaced
    * layout ([[pngRgb]]'s output and the overwhelmingly common corpus
    * case); anything else — palette, alpha, 16-bit, Adam7 — returns None
    * and the caller falls back to header-only metadata.
    */
  def decodePngPixels(b: Array[Byte]): Option[PngImage] = {
    if (b.length < 45 || !b.take(8).sameElements(PngSignature)) return None
    var w = 0; var h = 0; var ok = true; var sawIhdr = false; var end = false
    val idat = new java.io.ByteArrayOutputStream
    var i = 8
    while (ok && !end && i + 8 <= b.length) {
      val len = be32(b, i)
      if (len < 0 || i + 12 + len > b.length) ok = false
      else {
        val t = tag(b, i + 4)
        if (be32(b, i + 8 + len) != chunkCrc(t, b, i + 8, len)) ok = false
        else t match {
          case "IHDR" =>
            if (len != 13) ok = false
            else {
              w = be32(b, i + 8); h = be32(b, i + 12)
              // bit depth 8, truecolor, deflate, no interlace
              ok = w > 0 && w <= (1 << 20) && h > 0 && h <= (1 << 20) &&
                b(i + 16) == 8 && b(i + 17) == 2 && b(i + 18) == 0 &&
                b(i + 19) == 0 && b(i + 20) == 0
              sawIhdr = ok
            }
          case "IDAT" => idat.write(b, i + 8, len)
          case "IEND" => end = true
          case _ => () // ancillary chunk: CRC checked, content skipped
        }
        i += 12 + len
      }
    }
    if (!ok || !sawIhdr || !end) return None
    val stride = w * 3
    val filtered = new Array[Byte]((stride + 1) * h)
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < filtered.length && !inflater.finished()) {
        val n = inflater.inflate(filtered, off, filtered.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        off += n
      }
      if (off != filtered.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = filtered(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      val o = y * (stride + 1) + 1
      var j = 0
      while (j < stride) {
        val enc = filtered(o + j) & 0xff
        val left = if (j >= 3) px(y * stride + j - 3) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + j) & 0xff else 0
        val upLeft =
          if (y > 0 && j >= 3) px((y - 1) * stride + j - 3) & 0xff else 0
        val raw = ft match {
          case 0 => enc
          case 1 => enc + left
          case 2 => enc + up
          case 3 => enc + ((left + up) >> 1)
          case _ => enc + paeth(left, up, upLeft)
        }
        px(y * stride + j) = (raw & 0xff).toByte
        j += 1
      }
      y += 1
    }
    Some(PngImage(w, h, px))
  }

  /** A fully decoded GIF frame: dimensions + row-major palette indices
    * (1 byte per pixel; with [[gifIndexed]]'s identity-grayscale palette
    * the index IS the gray value). */
  final case class GifImage(width: Int, height: Int, indices: Array[Byte])

  /** REAL GIF89a encoder for 8-bit indexed images: logical screen
    * descriptor, 256-entry identity-grayscale global color table, one
    * image descriptor, and the pixel indices LZW-compressed with the GIF
    * variable-code-width scheme (clear/EOI codes, LSB-first bit packing,
    * dictionary reset at 4096) in ≤255-byte sub-blocks.
    */
  def gifIndexed(width: Int, height: Int, idx: Array[Byte]): Array[Byte] = {
    require(idx.length == width * height, "idx must be w*h bytes")
    val out = new java.io.ByteArrayOutputStream
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    le16w(width); le16w(height)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    out.write(0x2c) // image descriptor
    le16w(0); le16w(0); le16w(width); le16w(height)
    out.write(0)    // no local color table, not interlaced
    out.write(8)    // LZW minimum code size
    // GIF-LZW: codes LSB-first, width grows at dictionary size 2^width
    val Clear = 256; val Eoi = 257
    val lzw = new java.io.ByteArrayOutputStream
    var bitBuf = 0L; var bitLen = 0; var codeWidth = 9
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitLen; bitLen += codeWidth
      while (bitLen >= 8) { lzw.write((bitBuf & 0xff).toInt); bitBuf >>= 8; bitLen -= 8 }
    }
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var next = 258
    emit(Clear)
    var prefix = -1
    var i = 0
    while (i < idx.length) {
      val k = idx(i) & 0xff
      if (prefix < 0) prefix = k
      else dict.get((prefix, k)) match {
        case Some(code) => prefix = code
        case None =>
          emit(prefix)
          dict((prefix, k)) = next; next += 1
          // width grows when the next code to assign no longer fits
          if (next == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          if (next == 4096) { // dictionary full: reset
            emit(Clear); dict = scala.collection.mutable.HashMap.empty
            next = 258; codeWidth = 9
          }
          prefix = k
      }
      i += 1
    }
    if (prefix >= 0) {
      emit(prefix)
      // the decoder performs one more dictionary add upon READING this
      // final code (it cannot know the stream ends), so its table is one
      // entry ahead of ours from here on; if that phantom add lands on
      // 2^w - 1 the decoder widens before reading EOI — mirror it, or EOI
      // is written narrow and the decoder runs dry
      next += 1
      if (next - 1 == (1 << codeWidth) - 1 && codeWidth < 12) codeWidth += 1
    }
    emit(Eoi)
    if (bitLen > 0) lzw.write((bitBuf & 0xff).toInt)
    val data = lzw.toByteArray
    var o = 0
    while (o < data.length) { // ≤255-byte sub-blocks
      val n = math.min(255, data.length - o)
      out.write(n); out.write(data, o, n); o += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** REAL GIF payload decode — the LZW entropy codec, dependency-free:
    * walks the block stream (screen descriptor, global color table,
    * extension blocks skipped by their sub-block lengths), concatenates
    * the image's LZW sub-blocks and decodes them with the canonical GIF
    * algorithm (LSB-first variable-width codes, clear/EOI, the KwKwK
    * first-char case, width growth at 2^width, reset at 4096). Supports
    * the non-interlaced single-frame layout [[gifIndexed]] writes and the
    * common corpus case; interlaced or local-palette frames return None
    * and the caller falls back to header metadata.
    */
  def decodeGifPixels(b: Array[Byte]): Option[GifImage] = {
    if (b.length < 14 || !(b(0) == 'G' && b(1) == 'I' && b(2) == 'F')) return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || w > (1 << 16) - 1 || h <= 0 || h > (1 << 16) - 1) return None
    var i = 13
    val flags = b(10) & 0xff
    if ((flags & 0x80) != 0) i += 3 * (2 << (flags & 7)) // global color table
    // walk blocks to the first image descriptor
    while (i < b.length && (b(i) & 0xff) == 0x21) { // extension
      i += 2 // introducer + label
      while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
      i += 1
    }
    if (i >= b.length || (b(i) & 0xff) != 0x2c) return None
    val iw = le16(b, i + 5); val ih = le16(b, i + 7)
    val iflags = b(i + 9) & 0xff
    if (iw != w || ih != h || (iflags & 0xc0) != 0) return None // LCT/interlace
    i += 10
    if (i >= b.length) return None
    val minCode = b(i) & 0xff
    if (minCode != 8) return None // [[gifIndexed]] layout: 8-bit indices
    i += 1
    val data = new java.io.ByteArrayOutputStream
    while (i < b.length && (b(i) & 0xff) != 0) {
      val n = b(i) & 0xff
      if (i + 1 + n > b.length) return None
      data.write(b, i + 1, n); i += 1 + n
    }
    if (i >= b.length) return None // missing block terminator
    val lzw = data.toByteArray
    val Clear = 256; val Eoi = 257
    val out = new Array[Byte](w * h)
    var outPos = 0
    // dictionary as prefix-link + last-byte tables (4096 entries)
    val prefixOf = new Array[Int](4096); val byteOf = new Array[Byte](4096)
    var next = 258; var codeWidth = 9
    var bitBuf = 0L; var bitLen = 0; var pos = 0
    var prev = -1
    val stack = new Array[Byte](4096); var sp = 0
    def firstByte(code0: Int): Byte = {
      var code = code0
      while (code >= 258) code = prefixOf(code)
      code.toByte
    }
    while (pos < lzw.length || bitLen >= codeWidth) {
      while (bitLen < codeWidth && pos < lzw.length) {
        bitBuf |= (lzw(pos) & 0xffL) << bitLen; bitLen += 8; pos += 1
      }
      if (bitLen < codeWidth) return None // truncated stream
      val code = (bitBuf & ((1 << codeWidth) - 1)).toInt
      bitBuf >>= codeWidth; bitLen -= codeWidth
      if (code == Clear) { next = 258; codeWidth = 9; prev = -1 }
      else if (code == Eoi) {
        return if (outPos == w * h) Some(GifImage(w, h, out)) else None
      } else {
        if (code > next || (code == next && prev < 0)) return None
        sp = 0
        if (code == next) { // KwKwK: prev + first(prev)
          var c = prev
          while (c >= 258) { stack(sp) = byteOf(c); sp += 1; c = prefixOf(c) }
          stack(sp) = c.toByte; sp += 1
          // emit prev's expansion then its first byte
          var j = sp - 1
          if (outPos + sp + 1 > out.length) return None
          while (j >= 0) { out(outPos) = stack(j); outPos += 1; j -= 1 }
          out(outPos) = firstByte(prev); outPos += 1
        } else {
          var c = code
          while (c >= 258) { stack(sp) = byteOf(c); sp += 1; c = prefixOf(c) }
          stack(sp) = c.toByte; sp += 1
          if (outPos + sp > out.length) return None
          var j = sp - 1
          while (j >= 0) { out(outPos) = stack(j); outPos += 1; j -= 1 }
        }
        if (prev >= 0 && next < 4096) {
          prefixOf(next) = prev
          byteOf(next) = firstByte(code)
          next += 1
          // one entry EARLIER than the encoder's bump: the decoder's
          // dictionary trails the encoder by exactly one entry when each
          // code is read, so its width must flip one add sooner (the
          // classic max_code-1 rule every GIF decoder carries)
          if (next == (1 << codeWidth) - 1 && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
    }
    None // ran out of data before EOI
  }

  /** REAL BMP decode: 'BM' magic + BITMAPINFOHEADER width/height (height
    * may be negative = top-down; dimensions sanity-bounded).
    */
  private[multimodal] def decodeBmp(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) {
      val w = le32(b, 18)
      val h = math.abs(le32(b, 22))
      if (w > 0 && w <= (1 << 20) && h > 0 && h <= (1 << 20)) Some((w, h, 1))
      else None
    } else None

  /** REAL canonical PCM WAV decode: RIFF/WAVE/fmt/data layout → (sample
    * rate, channels, PCM sample frames). Non-canonical chunk layouts fall
    * through to the stub.
    */
  private[multimodal] def decodeWav(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE" &&
        tag(b, 12) == "fmt " && tag(b, 36) == "data") {
      val channels = le16(b, 22)
      val rate = le32(b, 24)
      val bits = le16(b, 34)
      val dataLen = math.max(0, math.min(le32(b, 40), b.length - 44))
      val bytesPerFrame = channels * math.max(bits / 8, 1)
      if (channels > 0 && channels <= 16 && rate > 0 && bytesPerFrame > 0)
        Some((rate, channels, dataLen / bytesPerFrame))
      else None
    } else None

  /** REAL nearest-neighbor image resize over decoded RGB pixels: target
    * pixel (x, y) samples source (⌊x·w/tw⌋, ⌊y·h/th⌋) — the standard
    * floor mapping, closed-form enough for an exact oracle replay. Works
    * for both down- and up-scaling; a box/bilinear filter would drop in
    * here without changing the dataflow (decode → transform → encode,
    * partition-local, no shuffle).
    */
  def resizeNearest(img: PngImage, tw: Int, th: Int): PngImage = {
    require(tw > 0 && th > 0, "target dims must be positive")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * img.width / tw).toInt
        val so = (sy * img.width + sx) * 3
        val to = (y * tw + x) * 3
        out(to) = img.pixels(so)
        out(to + 1) = img.pixels(so + 1)
        out(to + 2) = img.pixels(so + 2)
        x += 1
      }
      y += 1
    }
    PngImage(tw, th, out)
  }

  /** A fully decoded PCM WAV: rate, channels, interleaved little-endian
    * 16-bit samples (complete frames only — a trailing partial frame is
    * not audio), the output of [[decodeWavSamples]]. */
  final case class WavAudio(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** REAL full-payload PCM WAV decode: a generic RIFF chunk walk (fmt
    * and data located by tag wherever they sit, unknown chunks skipped
    * via their self-described size with RIFF's odd-length pad byte), then
    * the data chunk parsed as interleaved sign-extended little-endian
    * 16-bit PCM, truncated to whole frames. Strict where it matters: a
    * chunk that overruns the blob, a non-PCM format code, or a missing
    * fmt/data chunk is a decode failure, not a guess.
    */
  def decodeWavSamples(b: Array[Byte]): Option[WavAudio] = {
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" ||
        tag(b, 8) != "WAVE") None
    else {
      var i = 12
      var rate = 0; var channels = 0; var bits = 0; var pcm = false
      var haveFmt = false
      var dataOff = -1; var dataLen = 0
      var bad = false
      while (!bad && i + 8 <= b.length) {
        val t = tag(b, i)
        val len = le32(b, i + 4)
        if (len < 0 || i + 8 + len > b.length) bad = true
        else {
          if (t == "fmt " && len >= 16) {
            haveFmt = true
            pcm = le16(b, i + 8) == 1
            channels = le16(b, i + 10)
            rate = le32(b, i + 12)
            bits = le16(b, i + 22)
          } else if (t == "data" && dataOff < 0) {
            dataOff = i + 8; dataLen = len
          }
          i += 8 + len + (len & 1) // RIFF pads odd chunks to even
        }
      }
      if (bad || !haveFmt || !pcm || dataOff < 0 || channels <= 0 ||
          channels > 16 || rate <= 0 || bits != 16) None
      else {
        val frames = dataLen / (channels * 2)
        val n = frames * channels
        val out = new Array[Short](n)
        var k = 0
        while (k < n) {
          out(k) = ((b(dataOff + 2 * k) & 0xff) |
            (b(dataOff + 2 * k + 1) << 8)).toShort
          k += 1
        }
        Some(WavAudio(rate, channels, out))
      }
    }
  }

  /** REAL JPEG header decode: walk the marker stream from SOI to the
    * first SOFn frame header (C0-CF except the C4/C8/CC non-frame
    * markers) and read the big-endian height/width it carries. Segment
    * lengths self-describe, so the scan skips APPn/COM/DQT/DHT without
    * understanding them; entropy-coded pixel data (which needs a real
    * codec) starts only at SOS, after the frame header — dimensions never
    * require it. Any desync (non-FF where a marker must be, truncated
    * segment, SOS/EOI before a SOF) falls through to the stub.
    */
  private[multimodal] def decodeJpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) None
    else {
      var i = 2
      var res: Option[(Int, Int, Int)] = None
      while (res.isEmpty && i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) i = b.length // marker desync: bail
        else (b(i + 1) & 0xff) match {
          case 0xff => i += 1 // fill byte before a marker
          case m if m == 0x01 || (m >= 0xd0 && m <= 0xd8) =>
            i += 2 // standalone markers carry no length
          case m if m == 0xd9 || m == 0xda =>
            i = b.length // EOI/SOS: the frame header must have come first
          case m =>
            if (i + 3 >= b.length) i = b.length
            else {
              val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
              val isSof = m >= 0xc0 && m <= 0xcf &&
                m != 0xc4 && m != 0xc8 && m != 0xcc
              if (len < 2 || i + 2 + len > b.length) i = b.length
              else if (isSof && len >= 9) {
                val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
                val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
                if (w > 0 && w <= (1 << 20) && h > 0 && h <= (1 << 20))
                  res = Some((w, h, 1))
                else i = b.length
              } else i += 2 + len
            }
        }
      }
      res
    }
  }

  /** REAL GIF header decode: 'GIF87a'/'GIF89a' signature + the logical
    * screen descriptor's little-endian width/height at offsets 6/8.
    * Frame count would need walking LZW-sized image blocks — header-only
    * stays at 1.
    */
  private[multimodal] def decodeGif(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length >= 13 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
        b(2) == 'F'.toByte && b(3) == '8'.toByte &&
        (b(4) == '7'.toByte || b(4) == '9'.toByte) && b(5) == 'a'.toByte) {
      val w = le16(b, 6)
      val h = le16(b, 8)
      if (w > 0 && w <= (1 << 20) && h > 0 && h <= (1 << 20)) Some((w, h, 1))
      else None
    } else None

  // ------------------------------------------------------------------
  // REAL baseline JPEG codec (grayscale): genuine DQT/DHT/SOF0/SOS
  // segments, canonical Huffman entropy coding with byte stuffing and DC
  // prediction on the encode side; a generic marker walk, canonical
  // Huffman decode (BITS/HUFFVAL exactly as DHT declares them — any
  // valid baseline grayscale table decodes, not just ours), run/size AC
  // expansion with ZRL/EOB, dequantization against the parsed DQT, and
  // a float IDCT with round+clamp on the decode side. No media library:
  // pure bit arithmetic, like the PNG and GIF codecs above.
  // ------------------------------------------------------------------

  /** JPEG zigzag scan: position i in zigzag order sits at natural index
    * ZigZag(i) of the 8×8 block (row-major). */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Our DHT table specs — canonical and deliberately simple: the 12 DC
    * size categories as 5-bit codes, the 162 AC run/size symbols (EOB,
    * ZRL, run 0-15 × size 1-10) as 8-bit codes. Flat-length tables are
    * valid canonical Huffman (single-length codes are trivially
    * prefix-free, and neither reaches the reserved all-ones codeword);
    * the decoder never assumes them — it rebuilds whatever DHT declares.
    */
  private val DcHuffVals: Array[Int] = (0 to 11).toArray
  private val DcHuffBits: Array[Int] = {
    val b = new Array[Int](16); b(4) = DcHuffVals.length; b
  }
  private val AcHuffVals: Array[Int] =
    0x00 +: ((for (run <- 0 to 15; size <- 1 to 10)
      yield (run << 4) | size).toArray :+ 0xf0)
  private val AcHuffBits: Array[Int] = {
    val b = new Array[Int](16); b(7) = AcHuffVals.length; b
  }

  /** Canonical Huffman code assignment (JPEG Annex C): value → (code,
    * length), lengths walked in order, code doubled at each new length. */
  private def huffCodes(bits: Array[Int],
      vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += (vals(k) -> ((code, len))); code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }
  private lazy val DcEnc = huffCodes(DcHuffBits, DcHuffVals)
  private lazy val AcEnc = huffCodes(AcHuffBits, AcHuffVals)

  /** MSB-first bit accumulator with JPEG byte stuffing (FF → FF 00) and
    * 1-padding to the byte boundary on flush, exactly as SOS data needs. */
  private final class JpegBitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0; private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); n += 1
        if (n == 8) {
          buf += acc.toByte
          if (acc == 0xff) buf += 0x00.toByte
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
    def bytes: Array[Byte] = buf.toArray
  }

  @inline private def jpegCategory(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** General grayscale baseline encoder: `coeffs` holds one 64-int
    * natural-order coefficient block per 8×8 tile, row-major over the
    * padded image (these are the values the decoder must recover — the
    * quantization table written to DQT is all-ones). AC magnitudes must
    * fit size ≤ 10, DC ≤ 11 — the full baseline grayscale range our AC
    * table declares.
    */
  def jpegEncodeGray(width: Int, height: Int,
      coeffs: Array[Array[Int]]): Array[Byte] = {
    val bx = (width + 7) / 8; val by = (height + 7) / 8
    require(coeffs.length == bx * by, "one coefficient block per 8x8 tile")
    val w = new JpegBitWriter
    var prevDc = 0
    coeffs.foreach { blk =>
      require(blk.length == 64)
      val dc = blk(0)
      val diff = dc - prevDc
      prevDc = dc
      val s = if (diff == 0) 0 else jpegCategory(diff)
      require(s <= 11, s"DC category $s out of range")
      val (dcode, dlen) = DcEnc(s)
      w.put(dcode, dlen)
      if (s > 0) w.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      var run = 0; var k = 1
      while (k < 64) {
        val c = blk(ZigZag(k))
        if (c == 0) run += 1
        else {
          while (run > 15) { val (z, zl) = AcEnc(0xf0); w.put(z, zl); run -= 16 }
          val sz = jpegCategory(c)
          require(sz <= 10, s"AC magnitude $c out of range")
          val (acode, alen) = AcEnc((run << 4) | sz)
          w.put(acode, alen)
          w.put(if (c >= 0) c else c + (1 << sz) - 1, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (e, el) = AcEnc(0x00); w.put(e, el) }
    }
    w.flush()
    val entropy = w.bytes
    // exact segment sizes: SOI 2, DQT 69, SOF0 13, DHT 212, SOS 10, EOI 2
    val out = java.nio.ByteBuffer.allocate(
      2 + 69 + 13 + 212 + 10 + entropy.length + 2)
    out.putShort(0xffd8.toShort)                     // SOI
    out.putShort(0xffdb.toShort).putShort(67.toShort) // DQT, Pq=0/Tq=0
      .put(0x00.toByte)
    (0 until 64).foreach(_ => out.put(1.toByte))     // all-ones quant table
    out.putShort(0xffc0.toShort).putShort(11.toShort) // SOF0
      .put(8.toByte)                                 // precision
      .putShort(height.toShort).putShort(width.toShort)
      .put(1.toByte)                                 // 1 component
      .put(1.toByte).put(0x11.toByte).put(0.toByte)  // id, 1x1, Tq=0
    out.putShort(0xffc4.toShort)                     // DHT (both tables)
      .putShort((2 + 17 + 12 + 17 + 162).toShort)
      .put(0x00.toByte)                              // Tc=DC, Th=0
    DcHuffBits.foreach(b => out.put(b.toByte))
    DcHuffVals.foreach(v => out.put(v.toByte))
    out.put(0x10.toByte)                             // Tc=AC, Th=0
    AcHuffBits.foreach(b => out.put(b.toByte))
    AcHuffVals.foreach(v => out.put(v.toByte))
    out.putShort(0xffda.toShort).putShort(8.toShort) // SOS
      .put(1.toByte)                                 // 1 component
      .put(1.toByte).put(0x00.toByte)                // id, Td=0/Ta=0
      .put(0.toByte).put(63.toByte).put(0.toByte)    // Ss, Se, Ah/Al
    out.put(entropy)
    out.putShort(0xffd9.toShort)                     // EOI
    out.array()
  }

  /** Block-constant grayscale JPEG: each 8×8 tile holds the single value
    * `blockVal(bx, by)` (0-255). The DCT of a flat block is exactly its
    * DC coefficient 8·(v-128) with every AC zero, so with the all-ones
    * quantization table the encode→Huffman→decode→IDCT round trip is
    * BIT-EXACT — the property that makes real entropy-coded JPEGs
    * oracle-able from a closed-form pixel formula.
    */
  def jpegGrayFlat(width: Int, height: Int,
      blockVal: (Int, Int) => Int): Array[Byte] = {
    val bx = (width + 7) / 8; val by = (height + 7) / 8
    val blocks = Array.tabulate(bx * by) { i =>
      val blk = new Array[Int](64)
      blk(0) = 8 * (blockVal(i % bx, i / bx) - 128)
      blk
    }
    jpegEncodeGray(width, height, blocks)
  }

  /** A fully decoded grayscale JPEG: dimensions + row-major 8-bit pixels
    * (already cropped from MCU padding), the output of
    * [[decodeJpegPixels]]. */
  final case class JpegImage(width: Int, height: Int, gray: Array[Byte])

  /** Canonical Huffman decode tables built from DHT's BITS/HUFFVAL via
    * the standard mincode/maxcode/valptr construction. */
  private final class JpegHuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(code: Int, len: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  /** MSB-first bit reader over entropy-coded data: un-stuffs FF 00,
    * stops (returns -1 forever) at any real marker. */
  private final class JpegBitReader(b: Array[Byte], start: Int) {
    private var i = start
    private var acc = 0; private var n = 0
    private var ended = false
    def bit(): Int = {
      if (n == 0) {
        if (ended || i >= b.length) { ended = true; return -1 }
        val v = b(i) & 0xff
        if (v == 0xff) {
          if (i + 1 < b.length && b(i + 1) == 0x00) { i += 2 } // stuffed FF
          else { ended = true; return -1 }                      // real marker
          acc = 0xff; n = 8
        } else { acc = v; n = 8; i += 1 }
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0; var k = 0
      while (k < len) {
        val bt = bit(); if (bt < 0) return Int.MinValue
        v = (v << 1) | bt; k += 1
      }
      v
    }
  }

  @inline private def jpegExtend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline grayscale JPEG down to its DEQUANTIZED
    * natural-order coefficient blocks (row-major over the padded image) —
    * the full entropy layer: marker walk, DQT/DHT parse, canonical
    * Huffman, DC prediction, run/size with ZRL/EOB, byte unstuffing.
    * Returns (width, height, blocks). Strict: progressive/multi-component
    * frames, missing tables, restart intervals, overruns and truncated
    * streams are decode failures, not guesses.
    */
  def decodeJpegCoeffs(b: Array[Byte]): Option[(Int, Int, Array[Array[Int]])] = {
    if (b == null || b.length < 4 || (b(0) & 0xff) != 0xff ||
        (b(1) & 0xff) != 0xd8) return None
    var i = 2
    val quant = new Array[Array[Int]](4)
    val dcTab = new Array[JpegHuffTable](4)
    val acTab = new Array[JpegHuffTable](4)
    var width = 0; var height = 0; var compQt = -1
    var sosAt = -1; var dcSel = -1; var acSel = -1
    while (sosAt < 0 && i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      (b(i + 1) & 0xff) match {
        case 0xff => i += 1
        case m if m == 0x01 || (m >= 0xd0 && m <= 0xd8) => i += 2
        case 0xd9 => return None // EOI before any scan
        case m =>
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 2 || i + 2 + len > b.length) return None
          val seg = i + 4; val segEnd = i + 2 + len
          m match {
            case 0xdb => // DQT: one or more 8-bit tables
              var p = seg
              while (p < segEnd) {
                val pq = (b(p) & 0xf0) >> 4; val tq = b(p) & 0x0f
                if (pq != 0 || tq > 3 || p + 65 > segEnd) return None
                quant(tq) = Array.tabulate(64)(k => b(p + 1 + k) & 0xff)
                p += 65
              }
            case 0xc4 => // DHT: one or more tables
              var p = seg
              while (p < segEnd) {
                if (p + 17 > segEnd) return None
                val tc = (b(p) & 0xf0) >> 4; val th = b(p) & 0x0f
                if (tc > 1 || th > 3) return None
                val bits = Array.tabulate(16)(k => b(p + 1 + k) & 0xff)
                val nv = bits.sum
                if (p + 17 + nv > segEnd) return None
                val vals = Array.tabulate(nv)(k => b(p + 17 + k) & 0xff)
                val t = new JpegHuffTable(bits, vals)
                if (tc == 0) dcTab(th) = t else acTab(th) = t
                p += 17 + nv
              }
            case 0xc0 => // SOF0 baseline
              if (len < 11 || (b(seg) & 0xff) != 8) return None
              height = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
              width = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
              val ncomp = b(seg + 5) & 0xff
              if (ncomp != 1 || (b(seg + 7) & 0xff) != 0x11) return None
              compQt = b(seg + 8) & 0x0f
            case mm if mm >= 0xc1 && mm <= 0xcf && mm != 0xc4 &&
                mm != 0xc8 && mm != 0xcc =>
              return None // progressive / extended: not baseline
            case 0xdd => return None // DRI: we never emit restarts
            case 0xda => // SOS
              if (len < 8 || (b(seg) & 0xff) != 1) return None
              dcSel = (b(seg + 2) & 0xf0) >> 4
              acSel = b(seg + 2) & 0x0f
              sosAt = segEnd
            case _ => () // APPn/COM: skip
          }
          i = segEnd
      }
    }
    if (sosAt < 0 || width <= 0 || height <= 0 || compQt < 0) return None
    val qt = quant(compQt)
    val dt = dcTab(dcSel); val at = acTab(acSel)
    if (qt == null || dt == null || at == null) return None
    val bx = (width + 7) / 8; val by = (height + 7) / 8
    val blocks = new Array[Array[Int]](bx * by)
    val r = new JpegBitReader(b, sosAt)
    def decodeSym(t: JpegHuffTable): Int = {
      var code = 0; var l = 0
      while (l < 16) {
        val bt = r.bit(); if (bt < 0) return -1
        code = (code << 1) | bt; l += 1
        if (t.maxCode(l) >= code && t.minCode(l) <= code) return t.value(code, l)
      }
      -1
    }
    var prevDc = 0
    var n = 0
    while (n < blocks.length) {
      val blk = new Array[Int](64)
      val s = decodeSym(dt)
      if (s < 0 || s > 11) return None
      val dv = if (s == 0) 0 else {
        val raw = r.receive(s); if (raw == Int.MinValue) return None
        jpegExtend(raw, s)
      }
      prevDc += dv
      blk(0) = prevDc * qt(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = decodeSym(at)
        if (rs < 0) return None
        if (rs == 0x00) eob = true
        else if (rs == 0xf0) k += 16
        else {
          val run = (rs >> 4) & 0x0f; val sz = rs & 0x0f
          k += run
          if (k > 63 || sz == 0 || sz > 10) return None
          val raw = r.receive(sz); if (raw == Int.MinValue) return None
          blk(ZigZag(k)) = jpegExtend(raw, sz) * qt(k)
          k += 1
        }
      }
      blocks(n) = blk
      n += 1
    }
    Some((width, height, blocks))
  }

  private lazy val IdctCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private lazy val IdctC: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Full grayscale pixel decode: [[decodeJpegCoeffs]] + per-block IDCT
    * (round + clamp + 128 level shift) + crop from MCU padding. */
  def decodeJpegPixels(b: Array[Byte]): Option[JpegImage] =
    decodeJpegCoeffs(b).map { case (w, h, blocks) =>
      val bx = (w + 7) / 8
      val gray = new Array[Byte](w * h)
      var n = 0
      while (n < blocks.length) {
        val blk = blocks(n)
        val ox = (n % bx) * 8; val oy = (n / bx) * 8
        var y = 0
        while (y < 8) {
          val py = oy + y
          if (py < h) {
            var x = 0
            while (x < 8) {
              val px = ox + x
              if (px < w) {
                var sum = 0.0
                var u = 0
                while (u < 8) {
                  var v = 0
                  val cu = IdctC(u) * IdctCos(u)(x)
                  while (v < 8) {
                    val f = blk(v * 8 + u)
                    if (f != 0) sum += cu * IdctC(v) * IdctCos(v)(y) * f
                    v += 1
                  }
                  u += 1
                }
                val p = math.round(sum / 4.0 + 128.0).toInt
                gray(py * w + px) =
                  (if (p < 0) 0 else if (p > 255) 255 else p).toByte
              }
              x += 1
            }
          }
          y += 1
        }
        n += 1
      }
      JpegImage(w, h, gray)
    }

  /** Decode dispatch: real header parse where the format allows it, the
    * deterministic stub for codec-requiring formats.
    */
  private[multimodal] def decode(mediaType: String,
      bytes: Array[Byte]): (Int, Int, Int, Boolean) =
    if (bytes == null || bytes.isEmpty) (0, 0, 0, false)
    else decodeBmp(bytes).orElse(decodePng(bytes))
        .orElse(decodeJpeg(bytes)).orElse(decodeGif(bytes))
        .orElse(decodeWav(bytes)).orElse(decodeY4mMeta(bytes)) match {
      case Some((w, h, f)) => (w, h, f, true)
      case None => decodeStub(mediaType, bytes)
    }

  /** Deterministic fake decode for formats needing a codec this runtime
    * does not ship: header-derived pseudo-dimensions. REPLACE with a real
    * codec (javax.imageio / ffmpeg bindings) when available — keep the
    * signature.
    */
  private[multimodal] def decodeStub(mediaType: String, bytes: Array[Byte]): (Int, Int, Int, Boolean) = {
    if (bytes == null || bytes.isEmpty) (0, 0, 0, false)
    else {
      val h = java.util.Arrays.hashCode(bytes)
      val width = 16 + math.abs(h % 1024)
      val height = 16 + math.abs((h / 1024) % 1024)
      val frames = mediaType match {
        case "video" => 1 + (bytes.length / 4096)
        case "audio" => 1 + (bytes.length / 1024)
        case _ => 1
      }
      (width, height, frames, true)
    }
  }

  /** Decode + feature-extract, one decoder context per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // partition-local init happens HERE (decoder handles, model weights…)
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val (w, h, f, ok) = decode(r.media_type, r.content)
        digest.reset()
        val fp = digest.digest(if (r.content == null) Array.empty else r.content)
          .take(8).map("%02x".format(_)).mkString
        MediaFeature(r.media_id, r.media_type,
          if (r.content == null) 0L else r.content.length.toLong,
          fp, w, h, f, ok)
      }
    }
  }

  /** Frame sampling: every `stride`-th chunk of a video/audio blob as its
    * own row — the explode-shaped stage that feeds per-frame models.
    * Chunking is columnar (`substring` on binary) — no UDF on the hot path.
    */
  def sampleChunks(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_chunks",
        ceil(length(col("content")) / lit(chunkBytes.toDouble)).cast("int"))
      .withColumn("chunk_idx",
        explode(when(col("n_chunks") > 0,
            sequence(lit(0), col("n_chunks") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .select(
        col("media_id"), col("media_type"), col("chunk_idx"),
        expr(s"substring(content, chunk_idx * $chunkBytes + 1, $chunkBytes)")
          .as("chunk"))

  /** Minimal valid BMP: 14-byte file header + 40-byte BITMAPINFOHEADER +
    * `payload` as pixel data (24bpp declared).
    */
  private[multimodal] def bmpBytes(width: Int, height: Int,
      payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(54 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
      .putInt(54 + payload.length) // file size
      .putShort(0).putShort(0)
      .putInt(54)                  // pixel-data offset
      .putInt(40)                  // BITMAPINFOHEADER size
      .putInt(width).putInt(height)
      .putShort(1)                 // planes
      .putShort(24)                // bpp
      .putInt(0)                   // BI_RGB
      .putInt(payload.length)      // image size
      .putInt(2835).putInt(2835)   // 72 dpi
      .putInt(0).putInt(0)
      .put(payload)
    out.array()
  }

  /** Minimal GIF89a: signature + logical screen descriptor (no global
    * color table) + trailer, with `payload` as opaque trailing bytes.
    */
  private[multimodal] def gifBytes(width: Int, height: Int,
      payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(13 + 1 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes)
      .putShort(width.toShort).putShort(height.toShort)
      .put(0.toByte).put(0.toByte).put(0.toByte)   // flags, bg, aspect
      .put(0x3b.toByte)                            // trailer
      .put(payload)
    out.array()
  }

  /** Canonical 44-byte PCM WAV header + `payload` as sample data. */
  def wavBytes(channels: Int, sampleRate: Int,
      payload: Array[Byte]): Array[Byte] = {
    val bits = 16
    val out = java.nio.ByteBuffer.allocate(44 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + payload.length)
      .put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16)
      .putShort(1)                      // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * bits / 8)
      .putShort((channels * bits / 8).toShort)
      .putShort(bits.toShort)
      .put("data".getBytes).putInt(payload.length)
      .put(payload)
    out.array()
  }

  /** A fully decoded YUV4MPEG2 stream: dimensions plus every frame's
    * luma plane (row-major, one `Array[Byte]` of width*height per
    * frame), the output of [[decodeY4m]]. */
  final case class Y4mVideo(width: Int, height: Int,
      frames: Array[Array[Byte]])

  /** Canonical YUV4MPEG2 container around monochrome frames: the ASCII
    * stream header (`YUV4MPEG2 W.. H.. F25:1 Ip A1:1 Cmono`), then each
    * frame as a `FRAME` marker line plus its raw width*height luma
    * plane. Y4M is the uncompressed interchange format of the ffmpeg /
    * mjpegtools world — the one video container a dependency-free
    * environment can write and parse for real, byte for byte.
    */
  def y4mBytes(width: Int, height: Int,
      frames: Array[Array[Byte]]): Array[Byte] = {
    val header =
      s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 Cmono\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames.map(marker.length + _.length).sum)
    out.put(header)
    frames.foreach { f => out.put(marker).put(f) }
    out.array()
  }

  /** REAL YUV4MPEG2 decode: parse the ASCII stream header (W/H/C
    * parameters located by tag wherever they sit in the parameter list,
    * unknown parameters skipped), then walk the FRAME markers — each may
    * carry its own parameter string up to the newline, per spec — and
    * slice out one luma plane per frame. Strict where it matters: a
    * missing magic, non-positive dimensions, a colorspace other than
    * `Cmono` (the only one whose plane layout this writer emits), a
    * malformed FRAME marker, or a truncated final plane is a decode
    * failure, not a guess.
    */
  def decodeY4m(b: Array[Byte]): Option[Y4mVideo] =
    y4mWalk(b) { (w, h, offsets) =>
      Y4mVideo(w, h, offsets.map(o =>
        java.util.Arrays.copyOfRange(b, o, o + w * h)))
    }

  /** Metadata-only Y4M decode — (width, height, n_frames) from the same
    * strict walk as [[decodeY4m]] without copying any plane. The cheap
    * form the feature-extraction dispatch wants: a 100 MB video blob
    * yields three ints, not a frame copy. */
  def decodeY4mMeta(b: Array[Byte]): Option[(Int, Int, Int)] =
    y4mWalk(b)((w, h, offsets) => (w, h, offsets.length))

  /** Shared strict Y4M walk: header parse + frame-marker scan, then
    * `build(width, height, planeOffsets)` on success. Every structural
    * defect (bad magic, non-`Cmono` colorspace, malformed FRAME marker,
    * truncated plane) is a `None`, never a guess. */
  private def y4mWalk[A](b: Array[Byte])(
      build: (Int, Int, Array[Int]) => A): Option[A] = {
    val magic = "YUV4MPEG2"
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < b.length && b(i) != '\n') i += 1
      i
    }
    if (b == null || b.length < magic.length + 1 ||
        new String(b, 0, magic.length,
          java.nio.charset.StandardCharsets.US_ASCII) != magic) None
    else {
      val hEnd = lineEnd(magic.length)
      if (hEnd >= b.length) None
      else {
        val params = new String(b, magic.length, hEnd - magic.length,
          java.nio.charset.StandardCharsets.US_ASCII)
          .split(' ').filter(_.nonEmpty)
        def intParam(tag: Char): Int =
          params.collectFirst {
            case p if p.length > 1 && p.head == tag &&
                p.tail.forall(_.isDigit) => p.tail.toInt
          }.getOrElse(-1)
        val w = intParam('W')
        val h = intParam('H')
        val cs = params.collectFirst {
          case p if p.head == 'C' => p.tail
        }.getOrElse("420jpeg") // the spec default when C is absent
        if (w <= 0 || h <= 0 || cs != "mono") None
        else {
          val plane = w * h
          val offsets = Array.newBuilder[Int]
          var i = hEnd + 1
          var bad = false
          while (!bad && i < b.length) {
            if (i + 5 > b.length ||
                new String(b, i, 5,
                  java.nio.charset.StandardCharsets.US_ASCII) != "FRAME")
              bad = true
            else {
              val fEnd = lineEnd(i + 5) // frame-local params, skipped
              if (fEnd >= b.length || fEnd + 1 + plane > b.length) bad = true
              else {
                offsets += fEnd + 1
                i = fEnd + 1 + plane
              }
            }
          }
          if (bad) None else Some(build(w, h, offsets.result()))
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // MP4 (ISO BMFF) container: frame INDEXING without codec decode — the
  // real first step of any video training pipeline: locate every sample
  // (frame) in a 100 GB .mp4 by parsing the moov sample tables
  // (stts/stsc/stsz/stco/stss), so frame extraction can seek straight
  // to the bytes it wants instead of scanning the file. Parsing is pure
  // box arithmetic, dependency-free; only the CODEC payload (H.264 etc.)
  // stays out of scope for this runtime.
  // ------------------------------------------------------------------

  /** One indexed MP4 sample: 0-based index, file-absolute byte offset,
    * size in bytes, presentation time in track-timescale units, and
    * whether stss marks it a sync (seekable/key) sample. */
  final case class Mp4Sample(idx: Int, offset: Long, size: Int, pts: Long,
      sync: Boolean)

  /** The parsed sample index of one video track. */
  final case class Mp4Index(width: Int, height: Int, timescale: Long,
      samples: Array[Mp4Sample])

  private def be16w(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
  private def be32w(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
  private def mp4Box(tag: String, payloads: Array[Byte]*): Array[Byte] = {
    val n = payloads.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(n + 8)
    be32w(out, n + 8)
    out.write(tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    payloads.foreach(out.write)
    out.toByteArray
  }
  /** The 36-byte unity transform matrix mvhd/tkhd carry. */
  private def mp4UnityMatrix(out: java.io.ByteArrayOutputStream): Unit = {
    val m = Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    m.foreach(be32w(out, _))
  }

  /** Minimal VALID progressive-unfriendly MP4: `ftyp` (24 bytes), then
    * `mdat` holding the frame payloads back to back, then `moov` with one
    * video track whose sample tables index the mdat — samples grouped TWO
    * per chunk (so stsc/stco expansion is non-trivial), constant stts
    * delta, every third sample a sync sample in stss. mdat precedes moov
    * so sample offsets are independent of the moov's own size (frame 0
    * always lands at byte 32 = ftyp 24 + mdat header 8) — which is what
    * lets an arithmetic oracle replay the offsets exactly.
    */
  def mp4Bytes(width: Int, height: Int, timescale: Int, sampleDelta: Int,
      frames: Array[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty && width > 0 && height > 0)
    val nf = frames.length
    val nChunks = (nf + 1) / 2
    val duration = nf * sampleDelta

    val ftyp = {
      val p = new java.io.ByteArrayOutputStream(16)
      p.write("isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      be32w(p, 0)
      p.write("isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      p.write("iso2".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      mp4Box("ftyp", p.toByteArray)
    }
    val mdat = mp4Box("mdat", frames: _*)
    // file-absolute chunk offsets: mdat payload starts at ftyp + 8
    val chunkOffsets = new Array[Int](nChunks)
    var off = ftyp.length + 8
    var c = 0
    var f = 0
    while (f < nf) {
      if (f % 2 == 0) { chunkOffsets(c) = off; c += 1 }
      off += frames(f).length
      f += 1
    }

    def fullBox(tag: String, version: Int, flags: Int,
        body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val p = new java.io.ByteArrayOutputStream()
      be32w(p, (version << 24) | (flags & 0xffffff))
      body(p)
      mp4Box(tag, p.toByteArray)
    }

    val mvhd = fullBox("mvhd", 0, 0, { p =>
      be32w(p, 0); be32w(p, 0)          // creation / modification time
      be32w(p, timescale); be32w(p, duration)
      be32w(p, 0x00010000)              // rate 1.0
      be16w(p, 0x0100)                  // volume 1.0
      be16w(p, 0); be32w(p, 0); be32w(p, 0) // reserved
      mp4UnityMatrix(p)
      (0 until 6).foreach(_ => be32w(p, 0)) // pre_defined
      be32w(p, 2)                       // next_track_ID
    })
    val tkhd = fullBox("tkhd", 0, 0x7, { p => // enabled | in movie | in preview
      be32w(p, 0); be32w(p, 0)
      be32w(p, 1)                       // track_ID
      be32w(p, 0)                       // reserved
      be32w(p, duration)
      be32w(p, 0); be32w(p, 0)          // reserved
      be16w(p, 0); be16w(p, 0)          // layer, alternate_group
      be16w(p, 0); be16w(p, 0)          // volume (video: 0), reserved
      mp4UnityMatrix(p)
      be32w(p, width << 16); be32w(p, height << 16) // 16.16 fixed point
    })
    val mdhd = fullBox("mdhd", 0, 0, { p =>
      be32w(p, 0); be32w(p, 0)
      be32w(p, timescale); be32w(p, duration)
      be16w(p, 0x55c4)                  // packed ISO-639 "und"
      be16w(p, 0)
    })
    val hdlr = fullBox("hdlr", 0, 0, { p =>
      be32w(p, 0)
      p.write("vide".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      be32w(p, 0); be32w(p, 0); be32w(p, 0) // reserved
      p.write(0)                        // empty NUL-terminated name
    })
    val vmhd = fullBox("vmhd", 0, 1, { p =>
      be16w(p, 0)                       // graphicsmode copy
      be16w(p, 0); be16w(p, 0); be16w(p, 0) // opcolor
    })
    val dinf = mp4Box("dinf", fullBox("dref", 0, 0, { p =>
      be32w(p, 1)                       // entry_count
      // self-contained url entry
      be32w(p, 12)
      p.write("url ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      be32w(p, 1)                       // flag: data in this file
    }))
    val stsd = fullBox("stsd", 0, 0, { p =>
      be32w(p, 1)                       // entry_count
      // 86-byte VisualSampleEntry, fourcc "raw " (uncompressed)
      be32w(p, 86)
      p.write("raw ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      be16w(p, 0); be16w(p, 0); be16w(p, 0) // reserved6
      be16w(p, 1)                       // data_reference_index
      be16w(p, 0); be16w(p, 0)          // pre_defined, reserved
      be32w(p, 0); be32w(p, 0); be32w(p, 0) // pre_defined
      be16w(p, width); be16w(p, height)
      be32w(p, 0x00480000); be32w(p, 0x00480000) // 72 dpi
      be32w(p, 0)                       // reserved
      be16w(p, 1)                       // frame_count per sample
      (0 until 32).foreach(_ => p.write(0)) // compressorname
      be16w(p, 0x0018)                  // depth
      be16w(p, 0xffff)                  // pre_defined -1
    })
    val stts = fullBox("stts", 0, 0, { p =>
      be32w(p, 1); be32w(p, nf); be32w(p, sampleDelta)
    })
    val syncs = (0 until nf).filter(_ % 3 == 0)
    val stss = fullBox("stss", 0, 0, { p =>
      be32w(p, syncs.length)
      syncs.foreach(sIdx => be32w(p, sIdx + 1)) // 1-based sample numbers
    })
    val stsc = fullBox("stsc", 0, 0, { p =>
      if (nf <= 2) { be32w(p, 1); be32w(p, 1); be32w(p, nf); be32w(p, 1) }
      else if (nf % 2 == 0) { be32w(p, 1); be32w(p, 1); be32w(p, 2); be32w(p, 1) }
      else {
        be32w(p, 2)
        be32w(p, 1); be32w(p, 2); be32w(p, 1)
        be32w(p, nChunks); be32w(p, 1); be32w(p, 1) // odd tail chunk
      }
    })
    val stsz = fullBox("stsz", 0, 0, { p =>
      be32w(p, 0)                       // non-uniform sizes
      be32w(p, nf)
      frames.foreach(fr => be32w(p, fr.length))
    })
    val stco = fullBox("stco", 0, 0, { p =>
      be32w(p, nChunks)
      chunkOffsets.foreach(be32w(p, _))
    })
    val stbl = mp4Box("stbl", stsd, stts, stss, stsc, stsz, stco)
    val minf = mp4Box("minf", vmhd, dinf, stbl)
    val mdia = mp4Box("mdia", mdhd, hdlr, minf)
    val trak = mp4Box("trak", tkhd, mdia)
    val moov = mp4Box("moov", mvhd, trak)

    val out = new java.io.ByteArrayOutputStream(
      ftyp.length + mdat.length + moov.length)
    out.write(ftyp); out.write(mdat); out.write(moov)
    out.toByteArray
  }

  /** REAL ISO BMFF sample-table walk: find `moov → trak → mdia → minf →
    * stbl`, parse stsd (track dimensions), mdhd (timescale), stts
    * (per-sample durations → pts), stsz (sizes), stsc + stco (chunk map →
    * file-absolute offsets), stss (sync set; absent = all sync, per
    * spec). Strict: malformed box lengths, a non-video handler-less
    * layout, sample-count disagreement between stts/stsz/stsc-expansion,
    * or an offset past EOF is a `None`, never a guess. 64-bit `co64` and
    * compressed/versioned variants this writer never emits are rejected,
    * not mis-read.
    */
  def indexMp4(b: Array[Byte]): Option[Mp4Index] = {
    if (b == null || b.length < 16) return None
    @inline def u16(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    @inline def u32(i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    /** First child box with `tag` inside [from, until); (payloadStart,
      * payloadEnd) or None. Walks sequentially, strict on lengths. */
    def find(tag: String, from: Int, until: Int): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= until) {
        val size = u32(i)
        val t = new String(b, i + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        if (size < 8 || i + size > until) return None // 0/1 ext sizes: reject
        if (t == tag) return Some((i + 8, i + size.toInt))
        i += size.toInt
      }
      None
    }
    try {
      for {
        (moovS, moovE) <- find("moov", 0, b.length)
        (trakS, trakE) <- find("trak", moovS, moovE)
        (mdiaS, mdiaE) <- find("mdia", trakS, trakE)
        (mdhdS, mdhdE) <- find("mdhd", mdiaS, mdiaE)
        (hdlrS, hdlrE) <- find("hdlr", mdiaS, mdiaE)
        (minfS, minfE) <- find("minf", mdiaS, mdiaE)
        (stblS, stblE) <- find("stbl", minfS, minfE)
        (stsdS, stsdE) <- find("stsd", stblS, stblE)
        (sttsS, sttsE) <- find("stts", stblS, stblE)
        (stscS, stscE) <- find("stsc", stblS, stblE)
        (stszS, stszE) <- find("stsz", stblS, stblE)
        (stcoS, stcoE) <- find("stco", stblS, stblE)
        idx <- {
          val timescale = u32(mdhdS + 12) // v0: vf, ctime, mtime, timescale
          // stsd: vf(4) count(4) then the first 86-byte sample entry;
          // width/height sit 32/34 bytes into the entry
          val entry = stsdS + 8
          // every table's declared entry count must FIT ITS BOX — a lying
          // count is a reject, never an allocation sized by attacker bytes
          val nStts = u32(sttsS + 4).toInt
          val nStsc = u32(stscS + 4).toInt
          val uniform = u32(stszS + 4)
          val nSamples = u32(stszS + 8).toInt
          val nChunks = u32(stcoS + 4).toInt
          val tablesFit =
            nStts >= 0 && sttsS + 8 + nStts.toLong * 8 <= sttsE &&
            nStsc >= 0 && stscS + 8 + nStsc.toLong * 12 <= stscE &&
            nSamples >= 0 && (
              if (uniform == 0L) stszS + 12 + nSamples.toLong * 4 <= stszE
              // uniform stsz has no per-sample table to fit, but the
              // count must still be a size the FILE can justify — every
              // sample's payload lives in b, so nSamples × uniform can't
              // exceed the file length (nSamples ≤ b.length first keeps
              // the product under 2^63: ≤ 2^31 × (2^32−1))
              else nSamples <= b.length &&
                nSamples.toLong * uniform <= b.length) &&
            nChunks >= 0 && stcoS + 8 + nChunks.toLong * 4 <= stcoE
          // this walk only understands VIDEO sample entries: the handler
          // must say "vide" (the common in-the-wild first trak is audio —
          // parsing its SoundSampleEntry as width/height would be a
          // silent wrong answer, not strictness); mdhd must actually hold
          // the timescale it claims
          val isVideo = hdlrE >= hdlrS + 12 &&
            new String(b, hdlrS + 8, 4,
              java.nio.charset.StandardCharsets.US_ASCII) == "vide"
          val mdhdFits = mdhdE >= mdhdS + 16
          if (stsdE < entry + 36 || !tablesFit || !isVideo || !mdhdFits) None
          else {
            val width = u16(entry + 32)
            val height = u16(entry + 34)
            // stts → per-sample pts (cumulative deltas from 0); total
            // sample count capped by the stsz count so a lying stts
            // cannot balloon the builder
            val ptsB = Array.newBuilder[Long]
            var t = 0L
            var e = 0
            var nPts = 0
            while (e < nStts && nPts <= nSamples) {
              val cnt = u32(sttsS + 8 + e * 8).toInt
              val delta = u32(sttsS + 12 + e * 8)
              var k = 0
              while (k < cnt && nPts <= nSamples) {
                ptsB += t; t += delta; k += 1; nPts += 1
              }
              e += 1
            }
            val pts = ptsB.result()
            // stsz → sizes; a size with bit 31 set would truncate to a
            // NEGATIVE Int and walk offsets backwards — reject, per the
            // strictness contract
            val sizes =
              if (uniform != 0L) Array.fill(nSamples)(uniform.toInt)
              else Array.tabulate(nSamples)(i => u32(stszS + 12 + i * 4).toInt)
            val sizesSane = sizes.forall(_ >= 0)
            // stsc entries + stco offsets → file-absolute sample offsets
            val stscEntries = Array.tabulate(nStsc) { i =>
              (u32(stscS + 8 + i * 12).toInt,      // first_chunk (1-based)
                u32(stscS + 12 + i * 12).toInt)    // samples_per_chunk
            }
            val chunkOff = Array.tabulate(nChunks)(i => u32(stcoS + 8 + i * 4))
            val sync: Int => Boolean =
              find("stss", stblS, stblE) match {
                case Some((st, stE)) =>
                  val n = u32(st + 4).toInt
                  if (n < 0 || st + 8 + n.toLong * 4 > stE)
                    (_: Int) => false // lying stss: no sample claims sync
                  else {
                    val set =
                      (0 until n).map(i => u32(st + 8 + i * 4).toInt).toSet
                    (s: Int) => set.contains(s + 1)
                  }
                case None => (_: Int) => true // no stss = every sample sync
              }
            if (pts.length != nSamples || nStsc == 0 || nChunks == 0 ||
                !sizesSane) None
            else {
              val samples = new Array[Mp4Sample](nSamples)
              var s = 0
              var ci = 0 // chunk index, 0-based
              var ok = true
              while (ok && ci < nChunks && s < nSamples) {
                // samples_per_chunk of the LAST stsc entry whose
                // first_chunk <= this chunk
                var spc = stscEntries(0)._2
                var j = 0
                while (j < nStsc && stscEntries(j)._1 <= ci + 1) {
                  spc = stscEntries(j)._2; j += 1
                }
                var within = 0
                var o = chunkOff(ci)
                while (ok && within < spc && s < nSamples) {
                  if (o + sizes(s) > b.length) ok = false
                  else {
                    samples(s) = Mp4Sample(s, o, sizes(s), pts(s), sync(s))
                    o += sizes(s); s += 1; within += 1
                  }
                }
                ci += 1
              }
              if (!ok || s != nSamples) None
              else Some(Mp4Index(width, height, timescale, samples))
            }
          }
        }
      } yield idx
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Deterministic synthetic media table derived from `documents` — the
    * test corpus has no real media. Image rows are VALID BMP blobs and
    * audio rows VALID canonical WAV blobs (dimensions/rates derived from
    * the doc), so the real header decoders run end-to-end; video rows are
    * VALID YUV4MPEG2 streams the real frame parser decodes. Lets every
    * multimodal
    * stage run at any scale factor.
    */
  def syntheticFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (id % 6) match {
          case 0 => MediaRow(id, "image",
            bmpBytes(1 + (text.length % 64), 1 + (id % 32).toInt, payload), src)
          case 1 => MediaRow(id, "audio",
            wavBytes(1 + (id % 2).toInt,
              if (id % 8 == 1) 16000 else 8000, payload), src)
          case 2 =>
            // a REAL PNG, pixels and all (deflated IDAT, genuine CRCs):
            // the payload-decode stage gets honest input at every scale
            val w = 1 + (text.length % 128)
            val h = 1 + (id % 64).toInt
            val rgb = Array.tabulate(w * h * 3) { i =>
              ((i / 3 % w + 2 * (i / 3 / w) + 3 * (i % 3) + id) % 256).toByte
            }
            MediaRow(id, "image", pngRgb(w, h, rgb), src)
          case 4 =>
            // a REAL baseline JPEG, entropy-coded pixels and all (Huffman
            // DC stream, byte stuffing, genuine DQT/DHT/SOF0/SOS): the
            // third honest payload-decode input. Block-constant content
            // keeps the lossy codec bit-exact (flat blocks are DC-only).
            MediaRow(id, "image",
              jpegGrayFlat(1 + (text.length % 256), 1 + (id % 48).toInt,
                (bx, by) => ((5 * bx + 11 * by + id) % 256).toInt), src)
          case 5 =>
            // a REAL GIF, pixels and all (LZW-coded indices, global color
            // table, sub-blocks): the second honest payload-decode input
            val w = 1 + (text.length % 200)
            val h = 1 + (id % 40).toInt
            val idx = Array.tabulate(w * h) { i =>
              ((i % w + 5 * (i / w) + 7 * id) % 256).toByte
            }
            MediaRow(id, "image", gifIndexed(w, h, idx), src)
          case _ =>
            // a REAL YUV4MPEG2 stream, frame planes and all (ASCII
            // stream header, FRAME markers): video now decodes for real
            // too — the stub path remains only for formats that need a
            // true compressed-codec library (e.g. MP4/H.264)
            val w = 1 + (text.length % 48)
            val h = 1 + (id % 32).toInt
            val frames = Array.tabulate(2 + (id % 5).toInt) { f =>
              Array.tabulate(w * h) { i =>
                ((i % w + 3 * (i / w) + 11 * f + id) % 256).toByte
              }
            }
            MediaRow(id, "video", y4mBytes(w, h, frames), src)
        }
      }
  }
}
