package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus partition-local decode / feature-extract /
  * resize / frame-sample operators.
  *
  * Decode binds behind the [[MediaDecoder]] seam. [[MediaDecoder.Uncompressed]]
  * is a REAL pure-JVM decoder for the uncompressed container formats —
  * 16-bit PCM RIFF/WAVE and 24-bit uncompressed BMP — needing no codec
  * dependency, and [[MediaDecoder.ImageIo]] is a REAL compressed-image
  * decoder (PNG/JPEG/GIF/BMP) through the stock JDK's `javax.imageio`.
  * VIDEO is real too for the intra-only case: [[decodeAviMjpegFrames]]
  * walks a RIFF/AVI container and decodes its MJPEG `00dc` frames through
  * the same stock-JDK JPEG reader. Only INTER-frame video (H.264…) and
  * compressed audio (AAC…) codecs remain stubbed via
  * [[MediaDecoder.Fake]], which produces deterministic synthetic
  * pixels/samples from the bytes (those libraries are genuinely absent
  * from a stock JVM; a codec-backed implementation drops into the
  * same seam with no plan shape changes). Everything else — the asset
  * schema, binary column handling, bounded-batch `mapPartitions`
  * iteration, fixed-width feature output, frame-row explosion — is the
  * real Spark plumbing either decoder runs through.
  *
  * Scale posture: decode/feature work is per-partition with NO shuffle —
  * plans are embarrassingly parallel maps; batching bounds peak memory per
  * task (`batchSize` assets decoded at once, not a whole partition); binary
  * payloads never hit the driver.
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, sampleRateHz: Int, durationMs: Long)

  /** One media asset row: opaque bytes + typed metadata. */
  final case class MediaAsset(
      asset_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      asset_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  final case class Frame(asset_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Decoder seam — real for uncompressed formats ([[MediaDecoder.Uncompressed]]),
    * stubbed only for compressed codecs ([[MediaDecoder.Fake]]).
    *
    * PLUG-IN CONTRACT (the seam an ffmpeg/JavaCV-backed decoder drops
    * into, closing the H.264/AAC gap without touching any operator):
    *
    *   - `decodeImage(bytes, meta)` → row-major GRAYSCALE luma matrix,
    *     `result.length` = decoded height, `result(r).length` = decoded
    *     width (operators recover dimensions from the ARRAY, never from
    *     `meta` — a container mis-parse must surface as a dimension
    *     mismatch, not silently shaped output). Luma = ITU-R BT.601
    *     integer transform `(77R + 150G + 29B) >> 8` for parity with the
    *     built-ins.
    *   - `decodeAudio(bytes, meta)` → mono PCM samples in s16 range, full
    *     decoded length (operators window/normalize downstream).
    *   - `decodeVideoFrames(bytes, meta)` → one luma matrix per frame in
    *     presentation order; default implementation is the REAL
    *     intra-only MJPEG-in-AVI container walk
    *     ([[Multimodal.decodeAviMjpegFrames]]). An inter-frame (H.264…)
    *     implementation overrides ONLY this method; every video operator
    *     ([[videoKeyframeDHash]], [[framesFromAvi]], [[videoDecodeCheck]])
    *     takes the decoder as a parameter and flows unchanged.
    *
    *   Failure taxonomy — implementations must THROW (fail fast), never
    *   degrade to synthetic output:
    *   - unsupported/compressed format this decoder does not handle →
    *     `IllegalArgumentException` naming the format found (the
    *     [[MediaDecoder.Uncompressed]] discipline);
    *   - corrupt container (truncated chunk walk, bad magic) →
    *     `IllegalArgumentException` with the offset/chunk context;
    *   - decodable-but-empty (zero frames/samples) → return the empty
    *     array; operators that REQUIRE content gate on it themselves
    *     (e.g. [[videoKeyframeDHash]]'s nonEmpty require).
    *   Determinism: for a fixed decoder build, output must be
    *   deterministic per input (the m09/m10 oracle gates are
    *   dimensions-exact + luma-sum-within-tolerance, the correct shape
    *   for codecs that are deterministic but not spec-exact). */
  trait MediaDecoder extends Serializable {
    /** Decode to a row-major grayscale byte matrix of (height × width). */
    def decodeImage(content: Array[Byte], meta: MediaMeta): Array[Array[Byte]]
    /** Decode audio to PCM samples. */
    def decodeAudio(content: Array[Byte], meta: MediaMeta): Array[Short]
    /** Decode video to one grayscale matrix per frame (presentation
      * order). Default: the real intra-only MJPEG-in-AVI walk; an
      * inter-frame codec implementation overrides this alone. */
    def decodeVideoFrames(content: Array[Byte], meta: MediaMeta): Array[Array[Array[Byte]]] =
      decodeAviMjpegFrames(content)
  }

  object MediaDecoder {
    /** Deterministic fake: pixels/samples derived from content bytes by
      * position — stable across runs/engines, shaped per metadata. A real
      * implementation binds an image/audio codec here. */
    object Fake extends MediaDecoder {
      def decodeImage(content: Array[Byte], meta: MediaMeta): Array[Array[Byte]] =
        Array.tabulate(meta.height, meta.width) { (r, c) =>
          if (content.isEmpty) 0.toByte
          else content((r * meta.width + c) % content.length)
        }
      def decodeAudio(content: Array[Byte], meta: MediaMeta): Array[Short] =
        if (content.isEmpty) Array(0.toShort)
        else Array.tabulate(math.max(1, content.length / 2)) { i =>
          ((content(2 * i % content.length) << 8) | (content((2 * i + 1) % content.length) & 0xff)).toShort
        }
    }

    /** Real pure-JVM decode for the uncompressed container formats: 16-bit
      * PCM RIFF/WAVE audio and 24-bit uncompressed (BI_RGB) BMP images.
      * Both formats are byte-layout specifications, not codecs — a chunk
      * walk and an integer luma transform — so no external dependency is
      * needed and decoded values are bit-deterministic across engines.
      * Compressed inputs fail fast with the format found, rather than
      * degrading to the synthetic fake. */
    object Uncompressed extends MediaDecoder {
      private def le16(b: Array[Byte], o: Int): Int =
        (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      private def le32(b: Array[Byte], o: Int): Int =
        (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

      /** 24-bit BMP → row-major grayscale via the ITU-R BT.601 integer luma
        * (299·R + 587·G + 114·B)/1000. Handles bottom-up (positive height,
        * the common case) and top-down (negative height) pixel arrays and
        * the 4-byte row padding. */
      def decodeImage(content: Array[Byte], meta: MediaMeta): Array[Array[Byte]] = {
        require(content.length >= 54 && content(0) == 'B'.toByte && content(1) == 'M'.toByte,
          "not a BMP payload (missing BM magic)")
        val pixOff = le32(content, 10)
        val width = le32(content, 18)
        val rawH = le32(content, 22)
        val bpp = le16(content, 28)
        val compression = le32(content, 30)
        require(bpp == 24 && compression == 0,
          s"only 24-bit uncompressed (BI_RGB) BMP decodes without codecs, got bpp=$bpp compression=$compression")
        require(width > 0 && rawH != 0, s"degenerate BMP dimensions ${width}x$rawH")
        val height = math.abs(rawH)
        val bottomUp = rawH > 0
        val rowBytes = ((width * 3 + 3) / 4) * 4
        require(pixOff >= 54 && pixOff.toLong + rowBytes.toLong * height <= content.length,
          "truncated BMP pixel array")
        Array.tabulate(height, width) { (r, c) =>
          val srcRow = if (bottomUp) height - 1 - r else r
          val o = pixOff + srcRow * rowBytes + c * 3 // B, G, R byte order
          val blue = content(o) & 0xff
          val green = content(o + 1) & 0xff
          val red = content(o + 2) & 0xff
          ((299 * red + 587 * green + 114 * blue) / 1000).toByte
        }
      }

      /** RIFF/WAVE chunk walk → little-endian 16-bit PCM samples
        * (interleaved across channels, as stored). */
      def decodeAudio(content: Array[Byte], meta: MediaMeta): Array[Short] = {
        require(content.length >= 44
            && new String(content, 0, 4, "US-ASCII") == "RIFF"
            && new String(content, 8, 4, "US-ASCII") == "WAVE",
          "not a RIFF/WAVE payload")
        var off = 12
        var fmtCode = -1
        var bits = -1
        var dataOff = -1
        var dataLen = -1
        while (off + 8 <= content.length && (dataOff < 0 || fmtCode < 0)) {
          val id = new String(content, off, 4, "US-ASCII")
          val sz = le32(content, off + 4)
          require(sz >= 0 && off + 8 + sz.toLong <= content.length, s"truncated WAV chunk $id")
          id match {
            case "fmt " =>
              fmtCode = le16(content, off + 8)
              bits = le16(content, off + 8 + 14)
            case "data" =>
              dataOff = off + 8
              dataLen = sz
            case _ => // skip LIST/fact/cue/…
          }
          off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
        }
        require(fmtCode == 1 && bits == 16,
          s"only 16-bit PCM WAV decodes without codecs, got fmt=$fmtCode bits=$bits")
        require(dataOff >= 0, "WAV data chunk missing")
        Array.tabulate(dataLen / 2)(i => le16(content, dataOff + 2 * i).toShort)
      }
    }

    /** Real COMPRESSED-image decode via the stock JDK's `javax.imageio`
      * (PNG, JPEG, BMP and GIF readers ship in every JRE — zero external
      * codec dependency): `ImageIO.read` → per-pixel sRGB → the same
      * BT.601 integer luma as [[Uncompressed]]. PNG/GIF/BMP are lossless,
      * so decoded pixels are an exact function of the encoded image and
      * fully oracle-restatable (m08); JPEG decodes deterministically for a
      * fixed JRE but is lossy by spec, so its gate is dimensions-exact +
      * luma-sum-within-tolerance (m09, [[Multimodal.imageDecodeCheck]]).
      * Audio delegates to the [[Uncompressed]] RIFF/WAVE chunk walk —
      * genuinely-compressed audio/video codecs (AAC, H.264) remain the
      * only [[Fake]]-stubbed formats, as those libraries are truly absent
      * from a stock JVM. */
    object ImageIo extends MediaDecoder {
      def decodeImage(content: Array[Byte], meta: MediaMeta): Array[Array[Byte]] = {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        require(img != null,
          s"javax.imageio found no reader for this payload (format hint: ${meta.format})")
        Array.tabulate(img.getHeight, img.getWidth) { (r, c) =>
          val rgb = img.getRGB(c, r)
          val red = (rgb >> 16) & 0xff
          val green = (rgb >> 8) & 0xff
          val blue = rgb & 0xff
          ((299 * red + 587 * green + 114 * blue) / 1000).toByte
        }
      }
      def decodeAudio(content: Array[Byte], meta: MediaMeta): Array[Short] =
        Uncompressed.decodeAudio(content, meta)
    }
  }

  /** Build a deterministic media-asset Dataset over the `documents` fixture
    * (text bytes as payload): the test/bench input shape until a real binary
    * table exists. */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val meta = kind match {
        case "image" => MediaMeta("png", width = 16, height = 8, 0, 0L)
        case "audio" => MediaMeta("pcm16", 0, 0, sampleRateHz = 16000, durationMs = bytes.length.toLong)
        case _       => MediaMeta("rawvid", width = 16, height = 8, 0, durationMs = 40L * (1 + bytes.length / 128))
      }
      MediaAsset(id, kind, bytes, meta)
    }
  }

  /** Synthesize a VALID RIFF/WAVE 16-bit PCM mono payload whose samples are
    * the pure function ((seed·31 + i·7) mod 65536) − 32768 — restatable by
    * an external oracle. The container includes a junk LIST chunk with an
    * ODD size between fmt and data, so a decoder only produces the right
    * samples if its chunk walk (including RIFF word-alignment padding) is
    * correct: the decode path itself becomes oracle-gated. */
  def synthWav(seed: Long, nSamples: Int, sampleRateHz: Int = 8000): Array[Byte] =
    writeWav(nSamples, sampleRateHz)(i => (((seed * 31 + i * 7) % 65536) - 32768).toShort)

  /** WAV whose samples follow a LENGTH-NORMALIZED multiplicative pattern —
    * the audio near-dup fixture (the [[synthBmpKeyed]] idea on PCM):
    * sample i reads virtual position `vp = i·64 / n`, so slightly
    * different lengths render nearly the same 64-step contour (a binned
    * energy hash of them differs in a few bits — a true near-duplicate);
    * the seed is scaled by a prime so products WRAP mod 65536 and
    * distinct keys decorrelate (unscaled small seeds never wrap — every
    * contour is monotone and all hashes collapse, measured before
    * scaling). */
  def synthWavKeyed(seedKey: Long, nSamples: Int, sampleRateHz: Int = 8000): Array[Byte] =
    writeWav(nSamples, sampleRateHz) { i =>
      val vp = i * 64 / nSamples
      (((seedKey * 1103 * (1 + 7 * vp)) % 65536) - 32768).toShort
    }

  /** Valid RIFF/WAVE 16-bit PCM mono container around a per-index sample
    * function. The container includes a junk LIST chunk with an ODD size
    * between fmt and data, so a decoder only produces the right samples
    * if its chunk walk (including RIFF word-alignment padding) is
    * correct: the decode path itself becomes oracle-gated. */
  private def writeWav(nSamples: Int, sampleRateHz: Int)
      (sample: Int => Short): Array[Byte] = {
    require(nSamples >= 1, s"nSamples must be >= 1, got $nSamples")
    val dataLen = nSamples * 2
    // RIFF(12) + fmt(8+16) + LIST(8+5+1 pad) + data(8+dataLen)
    val total = 12 + 24 + 14 + 8 + dataLen
    val b = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(total - 8).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                       // PCM, mono
      .putInt(sampleRateHz).putInt(sampleRateHz * 2) // byte rate
      .putShort(2).putShort(16)                      // block align, bits
    b.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put("INFOx".getBytes("US-ASCII")).put(0.toByte) // odd size + pad byte
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      b.putShort(sample(i))
      i += 1
    }
    b.array()
  }

  /** Assets carrying REAL WAV containers (doc_id % 3 == 2; sample count
    * (n_chars mod 50) + 20): the end-to-end real-decode input shape —
    * [[MediaDecoder.Uncompressed]] must walk the container correctly to
    * reproduce the synthesis formula. */
  def wavAssetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nChars) =>
        val n = (nChars % 50 + 20).toInt
        val wav = synthWav(id, n)
        MediaAsset(id, "audio", wav,
          MediaMeta("wav", 0, 0, sampleRateHz = 8000, durationMs = n * 1000L / 8000))
      }
  }

  /** Synthesize a VALID bottom-up 24-bit BI_RGB BMP whose channel bytes are
    * pure functions of (seed, row, col): R = (seed + r·3 + c·7) mod 256,
    * G = (seed·5 + r·11 + c) mod 256, B = (seed·7 + r + c·13) mod 256 —
    * restatable by an external oracle through the BT.601 integer luma. The
    * pixel array is stored BOTTOM-UP with 4-byte row padding (width chosen
    * off-multiple), so a decoder only reproduces the formula if its row
    * flip and stride handling are correct. */
  def synthBmp(seed: Long, width: Int, height: Int): Array[Byte] =
    writeBmp(width, height) { (r, c) =>
      (((seed + r * 3 + c * 7) % 256).toInt,
        ((seed * 5 + r * 11 + c) % 256).toInt,
        ((seed * 7 + r + c * 13) % 256).toInt)
    }

  /** BMP whose pixels sample a WIDTH-NORMALIZED multiplicative pattern —
    * the near-dup fixture: the channel formulas read the virtual column
    * `vc = c·8 / width`, so two widths render nearly the same 8-wide
    * pattern (an 8-grid dHash of them differs in a few roundtrip-rounding
    * bits — a true near-duplicate), while the MULTIPLICATIVE seed makes
    * neighbor comparisons seed-dependent (distinct seeds → unrelated
    * hashes; the additive [[synthBmp]] formula cancels the seed out of
    * every horizontal comparison, collapsing all dHashes together). */
  def synthBmpKeyed(seed: Long, width: Int, height: Int): Array[Byte] =
    writeBmp(width, height) { (r, c) =>
      val vc = c * 8 / width
      ((seed * (1 + 3 * r + 7 * vc) % 256).toInt,
        (seed * (2 + 11 * r + vc) % 256).toInt,
        (seed * (3 + r + 13 * vc) % 256).toInt)
    }

  /** 24bpp bottom-up BI_RGB container around a per-pixel (R,G,B) function
    * (`r` = logical top-down row). */
  private def writeBmp(width: Int, height: Int)
      (rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width >= 1 && height >= 1, s"degenerate ${width}x$height")
    val rowBytes = ((width * 3 + 3) / 4) * 4
    val total = 54 + rowBytes * height
    val b = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(total).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0)     // planes, bpp, BI_RGB
      .putInt(rowBytes * height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var j = 0
    while (j < height) {
      val r = height - 1 - j // file rows bottom-up
      var c = 0
      while (c < width) {
        val (red, green, blue) = rgb(r, c)
        b.put(blue.toByte).put(green.toByte).put(red.toByte)
        c += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      j += 1
    }
    b.array()
  }

  /** RGB channel formulas shared by every synthesized image container
    * (BMP, PNG, JPEG): pure functions of (seed, row, col), restatable by
    * an external oracle. `r` is the logical TOP-DOWN row. */
  private def synthChannels(seed: Long, r: Int, c: Int): (Int, Int, Int) = (
    ((seed + r * 3 + c * 7) % 256).toInt,   // R
    ((seed * 5 + r * 11 + c) % 256).toInt,  // G
    ((seed * 7 + r + c * 13) % 256).toInt)  // B

  /** Exact integer BT.601 luma sum of the [[synthChannels]] image — the
    * per-asset expected value a lossy-decode gate compares against. */
  def synthLumaSum(seed: Long, width: Int, height: Int): Long = {
    var sum = 0L
    for (r <- 0 until height; c <- 0 until width) {
      val (red, green, blue) = synthChannels(seed, r, c)
      sum += (299 * red + 587 * green + 114 * blue) / 1000
    }
    sum
  }

  /** Synthesize a genuinely-compressed image container through the JDK's
    * own encoder (`javax.imageio.ImageIO.write`) with [[synthChannels]]
    * pixels: `format` = "png" (zlib-deflated, LOSSLESS — decode recovers
    * the formula exactly) or "jpg" (DCT-quantized, lossy). The bytes are a
    * real compressed bitstream, so decoding them exercises a real inflate /
    * entropy-decode path, not a byte-layout walk. */
  def synthCompressedImage(seed: Long, width: Int, height: Int, format: String): Array[Byte] = {
    require(width >= 1 && height >= 1, s"degenerate ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until height; c <- 0 until width) {
      val (red, green, blue) = synthChannels(seed, r, c)
      img.setRGB(c, r, (red << 16) | (green << 8) | blue)
    }
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, baos), s"no JDK encoder for $format")
    baos.toByteArray
  }

  /** Assets carrying REAL zlib-compressed PNG containers (doc_id % 3 == 1;
    * width (n_chars mod 5) + 3, height 4): PNG is lossless, so the decoded
    * lumas are the [[synthChannels]] formula exactly — the m08 gate. */
  def pngAssetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nChars) =>
        val w = (nChars % 5 + 3).toInt
        MediaAsset(id, "image", synthCompressedImage(id, w, 4, "png"),
          MediaMeta("png", w, 4, 0, 0L))
      }
  }

  /** Assets carrying REAL JPEG containers (doc_id % 3 == 2; width
    * (n_chars mod 3) + 8, height 8 — at least one full 8×8 DCT block). */
  def jpegAssetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nChars) =>
        val w = (nChars % 3 + 8).toInt
        MediaAsset(id, "image", synthCompressedImage(id, w, 8, "jpg"),
          MediaMeta("jpeg", w, 8, 0, 0L))
      }
  }

  /** Per-frame seed for synthesized multi-frame containers: a pure function
    * of (asset seed, frame index) an external oracle can restate. */
  def frameSeed(seed: Long, frameIdx: Int): Long = seed * 1000L + frameIdx

  /** Synthesize a REAL MJPEG-in-AVI video: a RIFF `AVI ` container with a
    * proper `hdrl` LIST (avih main header + `strl` stream list declaring a
    * `vids`/`MJPG` stream with its BITMAPINFOHEADER), a JUNK chunk with an
    * ODD size (so only a word-alignment-correct chunk walk survives), and a
    * `movi` LIST whose `00dc` chunks each hold a genuine DCT-quantized JPEG
    * bitstream ([[synthCompressedImage]] with [[frameSeed]] pixels). MJPEG
    * is exactly this layout — intra-only JPEG per frame — so the stock-JDK
    * JPEG reader makes the whole video decodable with zero external codecs;
    * only INTER-frame codecs (H.264…) remain beyond a stock JVM. */
  def synthMjpegAvi(seed: Long, width: Int, height: Int, nFrames: Int,
      usecPerFrame: Int = 40000): Array[Byte] = {
    require(width >= 1 && height >= 1 && nFrames >= 1,
      s"degenerate AVI ${width}x$height x$nFrames")
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val frames = Array.tabulate(nFrames)(f =>
      synthCompressedImage(frameSeed(seed, f), width, height, "jpg"))
    val out = new java.io.ByteArrayOutputStream()
    val le = java.nio.ByteOrder.LITTLE_ENDIAN
    def i32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).order(le).putInt(v).array()
    def i16(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(2).order(le).putShort(v.toShort).array()
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      fourcc(id) ++ i32(body.length) ++ body ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(listType) ++ body)
    val avih = i32(usecPerFrame) ++ i32(0) ++ i32(0) ++ i32(0x10) ++ // µs/frame, maxbytes, granularity, HASINDEX-less flags
      i32(nFrames) ++ i32(0) ++ i32(1) ++ i32(0) ++ // frames, initial, streams, bufsize
      i32(width) ++ i32(height) ++ i32(0) ++ i32(0) ++ i32(0) ++ i32(0)
    val strh = fourcc("vids") ++ fourcc("MJPG") ++ i32(0) ++ i16(0) ++ i16(0) ++
      i32(0) ++ i32(1) ++ i32(1000000 / usecPerFrame) ++ // scale, rate (fps)
      i32(0) ++ i32(nFrames) ++ i32(0) ++ i32(-1) ++ i32(0) ++
      i16(0) ++ i16(0) ++ i16(width) ++ i16(height)
    val strf = i32(40) ++ i32(width) ++ i32(height) ++ i16(1) ++ i16(24) ++
      fourcc("MJPG") ++ i32(width * height * 3) ++ i32(0) ++ i32(0) ++ i32(0) ++ i32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val junk = chunk("JUNK", Array.fill(5)(0x4a.toByte)) // odd size: alignment trap
    val movi = list("movi", frames.flatMap(j => chunk("00dc", j)))
    val body = fourcc("AVI ") ++ hdrl ++ junk ++ movi
    out.write(fourcc("RIFF")); out.write(i32(body.length)); out.write(body)
    out.toByteArray
  }

  /** REAL video decode: walk the RIFF/AVI container to its `movi` LIST and
    * decode every `..dc` (compressed video) chunk through the stock-JDK
    * JPEG reader → per-frame grayscale matrices, in stream order. Fails
    * fast (with what was found) on a non-AVI payload or a frame the JDK
    * cannot decode — no silent fallback to the synthetic fake. */
  def decodeAviMjpegFrames(content: Array[Byte]): Array[Array[Array[Byte]]] = {
    def le32(o: Int): Int =
      (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8) |
        ((content(o + 2) & 0xff) << 16) | ((content(o + 3) & 0xff) << 24)
    def cc(o: Int): String = new String(content, o, 4, "US-ASCII")
    require(content.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ",
      s"not a RIFF/AVI payload (got ${if (content.length >= 12) cc(0) + "/" + cc(8) else "short"})")
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Array[Byte]]]
    def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= until) {
        val id = cc(off)
        val sz = le32(off + 4)
        require(sz >= 0 && off + 8 + sz.toLong <= until, s"truncated AVI chunk $id")
        if (id == "LIST") {
          val listType = cc(off + 8)
          walk(off + 12, off + 8 + sz, inMovi || listType == "movi")
        } else if (inMovi && id.length == 4 && id.endsWith("dc")) {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(content, off + 8, sz))
          require(img != null, s"stock JDK found no reader for $id frame ${frames.size}")
          frames += Array.tabulate(img.getHeight, img.getWidth) { (r, c) =>
            val rgb = img.getRGB(c, r)
            ((299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
              + 114 * (rgb & 0xff)) / 1000).toByte
          }
        }
        off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
    }
    walk(12, content.length, inMovi = false)
    frames.toArray
  }

  /** Assets carrying REAL MJPEG AVI containers (doc_id % 3 == 0; width
    * (n_chars mod 3) + 8 — at least one full 8×8 DCT block per row of
    * blocks; height 8; (n_chars mod 4) + 2 frames). */
  def aviAssetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nChars) =>
        val w = (nChars % 3 + 8).toInt
        val n = (nChars % 4 + 2).toInt
        MediaAsset(id, "video", synthMjpegAvi(id, w, 8, n),
          MediaMeta("avi", w, 8, 0, durationMs = 40L * n))
      }
  }

  /** AVI assets with a CONTENT KEY (`doc_id % keyMod`) — the VIDEO
    * near-dup fixture: width AND every frame's pixel seed derive from the
    * key, so same-key assets are byte-identical up to their FRAME COUNT
    * (which keeps the per-doc jitter) — the "same video, different cut"
    * case. Their keyframes are therefore byte-identical (keyframe dHash
    * Hamming 0, EXACTLY — deterministic through the real lossy decode,
    * because the decoder sees identical JPEG bytes); distinct keys
    * decorrelate. Population: doc_id % 3 == 1 (disjoint from the m11 BMP
    * and m12 WAV keyed fixtures). */
  def aviAssetsKeyed(docs: DataFrame, keyMod: Int = 60): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nChars) =>
        val k = id % keyMod
        // 32-48 px frames: several JPEG blocks per frame, so the lossy
        // roundtrip keeps enough cross-seed LOW-FREQUENCY structure for
        // distinct keys to land far apart in dHash space (the 8-10 px m10
        // sizes are 1-2 blocks: quantization flattens them and cross-key
        // hashes collide under any useful Hamming gate)
        val w = (32 + (k % 3) * 8).toInt
        val n = (nChars % 4 + 2).toInt
        MediaAsset(id, "video", synthMjpegAvi(k + 1, w, 32, n),
          MediaMeta("avi", w, 32, 0, durationMs = 40L * n))
      }
  }

  /** Difference hash of each video's KEYFRAME (frame 0) through the REAL
    * MJPEG-in-AVI decode — the video face of [[imageDHash]]: container
    * walk → stock-JDK JPEG decode → luma grid → 56-bit dHash. Duplicate
    * detection over video at the keyframe grain (full-sequence matching
    * composes [[frameSignatures]] the same way). Pure per-row map. */
  def videoKeyframeDHash(assets: Dataset[MediaAsset],
      gridW: Int = 8, gridH: Int = 8,
      decoder: MediaDecoder = MediaDecoder.ImageIo): Dataset[ImageHash] = {
    require(gridW >= 2 && gridH >= 1 && (gridW - 1) * gridH <= 63,
      s"grid ${gridW}x$gridH out of the 63-bit budget")
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").map { a =>
      val frames = decoder.decodeVideoFrames(a.content, a.meta)
      require(frames.nonEmpty, s"asset ${a.asset_id}: no frames decoded")
      ImageHash(a.asset_id, dHashBits(frames(0), gridW, gridH))
    }
  }

  /** The dHash bit loop over a decoded luma matrix (shared by
    * [[imageDHash]] and [[videoKeyframeDHash]]). */
  private def dHashBits(px: Array[Array[Byte]], gridW: Int, gridH: Int): Long = {
    val (h, w) = (px.length, if (px.isEmpty) 0 else px(0).length)
    var bits = 0L
    var i = 0
    var r = 0
    while (r < gridH) {
      var c = 0
      while (c < gridW - 1) {
        val l = px(r * h / gridH)(c * w / gridW) & 0xff
        val rt = px(r * h / gridH)((c + 1) * w / gridW) & 0xff
        if (l > rt) bits |= 1L << i
        i += 1; c += 1
      }
      r += 1
    }
    bits
  }

  /** REAL decoded video frames as the standard [[Frame]] stream (frame
    * bytes = the decoded luma matrix, row-major), so the downstream frame
    * operators — [[frameSignatures]], [[frameNearDupPairs]],
    * [[shotKeyframes]] — run unchanged on genuinely-decoded video. */
  def framesFromAvi(assets: Dataset[MediaAsset],
      decoder: MediaDecoder = MediaDecoder.ImageIo): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      decoder.decodeVideoFrames(a.content, a.meta).iterator.zipWithIndex.map {
        case (px, i) => Frame(a.asset_id, i, px.flatten)
      }
    }
  }

  final case class FrameDecodeCheck(
      asset_id: Long, frame_idx: Int, width: Int, height: Int,
      n_pixels: Long, mean_within_tol: Boolean)

  /** Per-FRAME lossy-decode gate over AVI video — [[imageDecodeCheck]]
    * lifted to the frame grain: every frame's dimensions must be exact
    * (recovered from the DECODED array, so a container mis-walk or frame
    * drop is a hard row mismatch) and its luma sum within tolerance of the
    * per-frame expected value. Pure flatMap, no shuffle; per-asset work is
    * bounded by frames-per-video. */
  def videoDecodeCheck(assets: Dataset[MediaAsset],
      expectedSum: (MediaAsset, Int) => Long, tolPerPixel: Int,
      decoder: MediaDecoder = MediaDecoder.ImageIo): Dataset[FrameDecodeCheck] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      decoder.decodeVideoFrames(a.content, a.meta).iterator.zipWithIndex.map { case (px, i) =>
        val h = px.length
        val w = if (h == 0) 0 else px(0).length
        val n = w.toLong * h
        val sum = px.iterator.flatMap(_.iterator).map(b => (b & 0xff).toLong).sum
        FrameDecodeCheck(a.asset_id, i, w, h, n,
          math.abs(sum - expectedSum(a, i)) <= tolPerPixel.toLong * n)
      }
    }
  }

  final case class DecodeCheck(
      asset_id: Long, width: Int, height: Int, n_pixels: Long, mean_within_tol: Boolean)

  /** Lossy-decode gate: decode each image and compare its EXACT integer
    * luma sum against a per-asset expected sum, within `tolPerPixel`·n —
    * the oracle shape for codecs (JPEG) whose output is deterministic for
    * a fixed decoder but not spec-exact across decoders. Width/height/
    * pixel-count come from the DECODED array, so a container-parse failure
    * or dimension drift is a hard mismatch, not a tolerance miss. Pure
    * map, no shuffle. */
  def imageDecodeCheck(assets: Dataset[MediaAsset], decoder: MediaDecoder,
      expectedSum: MediaAsset => Long, tolPerPixel: Int): Dataset[DecodeCheck] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").map { a =>
      val px = decoder.decodeImage(a.content, a.meta)
      val h = px.length
      val w = if (h == 0) 0 else px(0).length
      val n = w.toLong * h
      val sum = px.iterator.flatMap(_.iterator).map(b => (b & 0xff).toLong).sum
      DecodeCheck(a.asset_id, w, h, n,
        math.abs(sum - expectedSum(a)) <= tolPerPixel.toLong * n)
    }
  }

  /** Assets carrying REAL BMP containers (doc_id % 3 == 0; width
    * (n_chars mod 3) + 3 — deliberately off-4 so row padding is exercised;
    * height 4). */
  def bmpAssetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nChars) =>
        val w = (nChars % 3 + 3).toInt
        MediaAsset(id, "image", synthBmp(id, w, 4), MediaMeta("bmp", w, 4, 0, 0L))
      }
  }

  /** BMP assets whose pixel seed is a CONTENT KEY shared across documents
    * (`doc_id % keyMod`) instead of the doc_id itself — the fixture for
    * image-level near-dup detection: same-key same-width assets are exact
    * pixel duplicates, same-key different-width assets are near-duplicates
    * (the resize to the hash grid shifts a few comparisons), different
    * keys are unrelated. Same population as [[bmpAssetsFromDocuments]]. */
  def bmpAssetsKeyed(docs: DataFrame, keyMod: Int = 60): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nChars) =>
        // 16-18 px wide: wide enough that the 8-grid virtual-column
        // roundtrip is tight (same-key different-width = a few flipped
        // bits, a TRUE near-dup; the 3-5 px m06 sizes quantize too
        // coarsely and scatter same-key pairs across the hash space)
        val w = (16 + nChars % 3).toInt
        MediaAsset(id, "image", synthBmpKeyed(id % keyMod + 1, w, 16),
          MediaMeta("bmp", w, 16, 0, 0L))
      }
  }

  /** WAV assets with a CONTENT KEY (`doc_id % keyMod`) and small length
    * jitter — the audio near-dup fixture: same-key same-length assets are
    * exact duplicates, same-key jittered lengths are near-duplicates
    * under the contour hash, distinct keys decorrelate. Same population
    * as [[wavAssetsFromDocuments]] (doc_id % 3 == 2). */
  def wavAssetsKeyed(docs: DataFrame, keyMod: Int = 60): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nChars) =>
        val n = (80 + nChars % 5).toInt
        MediaAsset(id, "audio", synthWavKeyed(id % keyMod + 1, n),
          MediaMeta("wav", 0, 0, 8000, n * 1000L / 8000))
      }
  }

  final case class AudioHash(asset_id: Long, chash: Long)

  /** Energy-contour hash over decoded PCM: mean |amplitude| in `bins`
    * length-normalized bins, one bit per adjacent-bin comparison
    * (left > right) — the audio counterpart of [[imageDHash]] (a
    * Shazam-style constellation reduced to its monotone-contour core).
    * 32 bins → 31 bits: the hash and its 16-bit LSH bands stay positive
    * on any engine. Pure per-row map over the real RIFF chunk walk. */
  def audioContourHash(assets: Dataset[MediaAsset], decoder: MediaDecoder,
      bins: Int = 32): Dataset[AudioHash] = {
    require(bins >= 2 && bins <= 64, s"bins out of range: $bins")
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").map { a =>
      val s = decoder.decodeAudio(a.content, a.meta)
      val n = s.length
      val sums = new Array[Long](bins)
      val cnts = new Array[Long](bins)
      var i = 0
      while (i < n) {
        val b = (i.toLong * bins / n).toInt
        sums(b) += math.abs(s(i).toLong)
        cnts(b) += 1
        i += 1
      }
      def mean(j: Int): Long = if (cnts(j) == 0) 0L else sums(j) / cnts(j)
      var bits = 0L
      var j = 0
      while (j < bins - 1) {
        if (mean(j) > mean(j + 1)) bits |= 1L << j
        j += 1
      }
      AudioHash(a.asset_id, bits)
    }
  }

  /** Spectral-band energy hash over decoded PCM — the audio counterpart of
    * [[imagePHash]] (the m14 integer-DCT trick): the 32 length-normalized
    * mean-|amplitude| window energies of [[audioContourHash]] feed a 1-D
    * integer DCT-II ([[dctBasis]], AC rows u = 1..31), and bit i is set
    * iff coefficient i+1 exceeds the AC mean (`c·31 > Σc` — integer-exact,
    * no division). 31 bits; the hash and its 16-bit LSH bands stay
    * positive on any engine.
    *
    * WHY a second audio hash next to [[audioContourHash]]: each spectral
    * coefficient aggregates EVERY window, so the hash keys on the
    * low-frequency spectral ENVELOPE — the structure lossy audio codecs
    * preserve — rather than on pointwise adjacent-window order. The
    * planted spec pins its re-encode robustness (bit-depth requantization
    * and per-window scale-factor jitter both stay within the Hamming
    * gate). Honest scope note (measured, same discipline as the s15
    * recall finding): on THIS noise-like synthetic fixture the window
    * means are far apart, so the contour hash is at least as robust —
    * the spectral layout is the ready, oracle-gated estimator for
    * tonal/real-audio corpora where adjacent windows sit near-equal and
    * pointwise comparisons scatter. Pure per-row map over the real RIFF
    * chunk walk — no shuffle. Overflow-safe: |mean| ≤ 2¹⁵, |basis| ≤ 2¹⁴,
    * 32 terms → |coefficient| < 2³⁴, ×31 < 2³⁹. */
  def audioSpectralHash(assets: Dataset[MediaAsset], decoder: MediaDecoder,
      bins: Int = 32): Dataset[AudioHash] = {
    require(bins >= 2 && bins <= 64, s"bins out of range: $bins")
    import assets.sparkSession.implicits._
    val t = dctBasis(bins, bins)
    assets.filter(_.kind == "audio").map { a =>
      val s = decoder.decodeAudio(a.content, a.meta)
      val n = s.length
      val sums = new Array[Long](bins)
      val cnts = new Array[Long](bins)
      var i = 0
      while (i < n) {
        val b = (i.toLong * bins / n).toInt
        sums(b) += math.abs(s(i).toLong)
        cnts(b) += 1
        i += 1
      }
      def mean(j: Int): Long = if (cnts(j) == 0) 0L else sums(j) / cnts(j)
      val ac = new Array[Long](bins - 1)
      var u = 1
      while (u < bins) {
        var acc = 0L
        var x = 0
        while (x < bins) { acc += mean(x) * t(u)(x); x += 1 }
        ac(u - 1) = acc
        u += 1
      }
      val total = ac.sum
      var bits = 0L
      i = 0
      while (i < ac.length) {
        if (ac(i) * ac.length > total) bits |= 1L << i
        i += 1
      }
      AudioHash(a.asset_id, bits)
    }
  }

  /** A lossy RE-ENCODE of a [[synthWavKeyed]] asset — bit-depth reduction
    * (samples quantized to multiples of `step`), the audio analog of the
    * m14 JPEG recompress: byte-different container payload, perceptually
    * the same signal. The m15 spec's planted pair. */
  def requantizeWav(content: Array[Byte], meta: MediaMeta, step: Int): Array[Byte] = {
    require(step >= 1, s"step must be >= 1, got $step")
    val s = MediaDecoder.Uncompressed.decodeAudio(content, meta)
    writeWav(s.length, meta.sampleRateHz)(i => ((s(i) / step) * step).toShort)
  }

  /** Per-window scale-factor jitter re-encode — each of `windows`
    * length-normalized windows re-gained by a deterministic factor in
    * `1 ± pctMilli/1000` (the per-block scale-factor wobble of perceptual
    * audio codecs). The m15 spec's second planted re-encode. */
  def scaleJitterWav(content: Array[Byte], meta: MediaMeta, pctMilli: Int,
      windows: Int = 32): Array[Byte] = {
    require(pctMilli >= 0 && pctMilli < 1000, s"pctMilli out of range: $pctMilli")
    val s = MediaDecoder.Uncompressed.decodeAudio(content, meta)
    writeWav(s.length, meta.sampleRateHz) { i =>
      val w = (i.toLong * windows / s.length).toInt
      val g = 1000L + ((w.toLong * 2654435761L) % (2L * pctMilli + 1)) - pctMilli
      math.max(-32768L, math.min(32767L, s(i).toLong * g / 1000L)).toShort
    }
  }

  final case class ImageHash(asset_id: Long, dhash: Long)

  /** Difference hash (dHash) over decoded images: nearest-neighbor
    * resample the luma grid to `gridW`×`gridH`, emit one bit per
    * horizontal neighbor pair (left > right), row-major — the standard
    * perceptual fingerprint for image near-dup detection. The default
    * 8×8 grid yields 56 bits, keeping every value (and every 14-bit LSH
    * band of it) in positive BIGINT range on any engine. Pure per-row
    * map over the real decode path — no shuffle. */
  def imageDHash(assets: Dataset[MediaAsset], decoder: MediaDecoder,
      gridW: Int = 8, gridH: Int = 8): Dataset[ImageHash] = {
    require(gridW >= 2 && gridH >= 1 && (gridW - 1) * gridH <= 63,
      s"grid ${gridW}x$gridH out of the 63-bit budget")
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").map { a =>
      val px = decoder.decodeImage(a.content, a.meta)
      val (h, w) = (px.length, if (px.isEmpty) 0 else px(0).length)
      require(h == a.meta.height && w == a.meta.width,
        s"asset ${a.asset_id}: decoded ${w}x$h != metadata ${a.meta.width}x${a.meta.height}")
      ImageHash(a.asset_id, dHashBits(px, gridW, gridH))
    }
  }

  /** Fixed-point DCT-II basis for [[imagePHash]]:
    * `T(u)(x) = round(cos(π·(2x+1)·u / (2n)) · 2¹⁴)` — the cosine table
    * quantized to integers ONCE (StrictMath, so the constants are
    * identical on any JVM), making the whole perceptual hash pure integer
    * arithmetic: engine-reproducible bit for bit, and restatable by an
    * external oracle that interpolates these 256 constants as literals
    * (the JPEG integer-DCT trick applied to oracle determinism). */
  def dctBasis(n: Int, block: Int): Array[Array[Long]] =
    Array.tabulate(block, n)((u, x) =>
      Math.round(StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2.0 * n)) * 16384.0))

  /** Perceptual hash (pHash): decode → nearest-neighbor 32×32 luma →
    * integer 2-D DCT-II ([[dctBasis]], separable) → keep the low-frequency
    * `block×block` corner minus DC → 63 bits, bit set iff the coefficient
    * exceeds the AC mean (`c·63 > Σc` — integer-exact, no division).
    *
    * WHY a second image hash next to [[imageDHash]]: dHash compares
    * POINTWISE neighbor lumas, so a lossy RE-ENCODE (JPEG quantization,
    * brightness shift) flips bits all over the grid and the pair drifts
    * past any useful Hamming gate; the low-frequency DCT block is exactly
    * what lossy codecs preserve, so a re-encoded near-dup stays within a
    * small Hamming distance (the planted spec pins a JPEG re-encode dHash
    * demonstrably misses). Pure per-row map over the real decode — no
    * shuffle; max |coefficient| ≤ 32²·255·2²⁸ < 2⁴⁷, sums < 2⁵³ — no
    * overflow. */
  def imagePHash(assets: Dataset[MediaAsset], decoder: MediaDecoder,
      side: Int = 32, block: Int = 8): Dataset[ImageHash] = {
    require(side >= block && block >= 2 && block * block - 1 <= 63,
      s"pHash ${side}/$block out of the 63-bit budget")
    import assets.sparkSession.implicits._
    val t = dctBasis(side, block)
    assets.filter(_.kind == "image").map { a =>
      val px = decoder.decodeImage(a.content, a.meta)
      val (h, w) = (px.length, if (px.isEmpty) 0 else px(0).length)
      require(h > 0 && w > 0, s"asset ${a.asset_id}: empty decode")
      val luma = Array.tabulate(side, side)((r, c) =>
        (px(r * h / side)(c * w / side) & 0xff).toLong)
      val rowPass = Array.tabulate(side, block) { (r, v) =>
        var s = 0L; var c = 0
        while (c < side) { s += luma(r)(c) * t(v)(c); c += 1 }
        s
      }
      val ac = new Array[Long](block * block - 1)
      var u = 0
      while (u < block) {
        var v = 0
        while (v < block) {
          if (u != 0 || v != 0) {
            var s = 0L; var r = 0
            while (r < side) { s += t(u)(r) * rowPass(r)(v); r += 1 }
            ac(u * block + v - 1) = s
          }
          v += 1
        }
        u += 1
      }
      val total = ac.sum
      var bits = 0L
      var i = 0
      while (i < ac.length) {
        if (ac(i) * ac.length > total) bits |= 1L << i
        i += 1
      }
      ImageHash(a.asset_id, bits)
    }
  }

  /** A real JPEG RE-ENCODE of the [[synthBmpKeyed]] pixel pattern at an
    * aggressive quality factor — the m14 spec's planted pair:
    * byte-different container, heavily DCT-quantized lossy pixels, same
    * underlying image (the social-media/thumbnail recompress case). */
  def reencodeKeyedJpeg(seed: Long, width: Int, height: Int,
      quality: Float = 0.35f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until height; c <- 0 until width) {
      val vc = c * 8 / width
      val red = (seed * (1 + 3 * r + 7 * vc) % 256).toInt
      val green = (seed * (2 + 11 * r + vc) % 256).toInt
      val blue = (seed * (3 + r + 13 * vc) % 256).toInt
      img.setRGB(c, r, (red << 16) | (green << 8) | blue)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { ios.close(); writer.dispose() }
    baos.toByteArray
  }

  final case class RowLuma(
    asset_id: Long, row_idx: Int, sum_luma: Long, min_luma: Int, max_luma: Int)

  /** Per-row grayscale stats over decoded images — exact integer sums, so
    * the values are engine-reproducible. Pure flatMap, no shuffle. */
  def imageRowStats(assets: Dataset[MediaAsset], decoder: MediaDecoder): Dataset[RowLuma] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").flatMap { a =>
      decoder.decodeImage(a.content, a.meta).iterator.zipWithIndex.map { case (row, r) =>
        val lumas = row.map(_ & 0xff)
        RowLuma(a.asset_id, r, lumas.map(_.toLong).sum, lumas.min, lumas.max)
      }
    }
  }

  /** Decode + fixed-width feature extraction in bounded batches per
    * partition. Features: [n_bytes, mean_pixel/sample, byte entropy proxy,
    * aspect/duration] — a stand-in embedding with a FIXED width of 4, the
    * contract a real extractor must keep. */
  def extractFeatures(
      assets: Dataset[MediaAsset], decoder: MediaDecoder, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = peak-memory bound: `batchSize` decoded assets live
        // at once, mirroring a vectorized (Arrow-style) decode batch
        batch.iterator.map { a =>
          val mean: Float =
            if (a.kind == "audio") {
              val s = decoder.decodeAudio(a.content, a.meta)
              (s.map(_.toLong).sum.toDouble / s.length).toFloat
            } else {
              val px = decoder.decodeImage(a.content, a.meta)
              val flat = px.flatten
              (flat.map(b => (b & 0xff).toLong).sum.toDouble / math.max(1, flat.length)).toFloat
            }
          val distinct = a.content.distinct.length.toFloat
          val shape = a.meta match {
            case MediaMeta(_, w, h, _, _) if h > 0 => w.toFloat / h
            case m => m.durationMs.toFloat
          }
          MediaFeatures(a.asset_id, a.kind, a.content.length.toLong,
            Array(a.content.length.toFloat, mean, distinct, shape))
        }
      }
    }
  }

  /** Frame sampling for video assets: one row per sampled frame (stubbed
    * frame bytes = content windows). Pure flatMap — no shuffle, output rows
    * bounded by durationMs / frameEveryMs. */
  def sampleFrames(assets: Dataset[MediaAsset], frameEveryMs: Long = 40L): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val n = math.max(1, (a.meta.durationMs / frameEveryMs).toInt)
      val window = math.max(1, a.content.length / n)
      (0 until n).iterator.map { i =>
        val from = i * window
        Frame(a.asset_id, i, a.content.slice(from, math.min(from + window, a.content.length)))
      }
    }
  }

  final case class AudioWindow(
      asset_id: Long, window_idx: Int, n_samples: Int, sum_amp: Long, peak_amp: Int)

  /** Audio windowing: decode PCM samples and slice into fixed-size analysis
    * windows with per-window amplitude stats (exact integer sum + peak, so
    * any engine reproduces them bit-for-bit). Pure flatMap over audio
    * assets — no shuffle; window count is bounded by samples/windowSamples.
    * The real-codec swap point is the same [[MediaDecoder]] seam. */
  def audioWindows(
      assets: Dataset[MediaAsset], decoder: MediaDecoder,
      windowSamples: Int = 256): Dataset[AudioWindow] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").flatMap { a =>
      val s = decoder.decodeAudio(a.content, a.meta)
      s.grouped(windowSamples).zipWithIndex.map { case (w, i) =>
        AudioWindow(a.asset_id, i, w.length,
          w.map(_.toLong).sum, w.map(x => math.abs(x.toInt)).max)
      }
    }
  }

  final case class FrameSig(asset_id: Long, frame_idx: Int, frame_hash: Long)

  /** Portable per-frame content signature: the polynomial byte hash
    * (acc·31 + byte mod 1e9+7 — the [[graft.sql.Defaults.P]] family, so an
    * external oracle recomputes identical values). A production system
    * would use a perceptual hash behind the same (frame → long) shape;
    * content hashing already catches re-containerized/re-muxed duplicates,
    * where the decoded frames are byte-identical. */
  def frameSignatures(frames: Dataset[Frame]): Dataset[FrameSig] = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      val h = f.frame_bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % graft.sql.Defaults.P)
      FrameSig(f.asset_id, f.frame_idx, h)
    }
  }

  /** Media near-dup: Jaccard over each video's DISTINCT frame-signature
    * set — the d02 inverted-index shape lifted to binary assets (shared
    * frame → candidate pair → exact two-pointer verify). `maxFrameFreq`
    * is the same hot-key cap: a boilerplate frame (black/intro card)
    * present in everything generates O(df²) candidates and carries no
    * near-dup signal. No decode needed — signatures come from the sampled
    * frame bytes, so the plan is flatMap → per-asset set agg → equi-join. */
  def frameNearDupPairs(frames: Dataset[Frame], minJaccard: Double,
      maxFrameFreq: Long = 1000L): DataFrame = {
    val sets = frameSignatures(frames).toDF()
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_set(col("frame_hash"))).as("hset"))
    val sh = sets.select(col("asset_id"), size(col("hset")).as("nh"), explode(col("hset")).as("h"))
    val rare = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxFrameFreq).select(col("h"))
    val capped = sh.join(rare, "h")
    val cand = capped.as("a").join(capped.as("b"),
        col("a.h") === col("b.h") && col("a.asset_id") < col("b.asset_id"))
      .filter(least(col("a.nh"), col("b.nh")).cast("double") >=
        lit(minJaccard) * greatest(col("a.nh"), col("b.nh")).cast("double"))
      .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"))
      .distinct()
    def intersectSize(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.ColumnShim.column(
        graft.sql.SortedIntersectSize(
          org.apache.spark.sql.graft.ColumnShim.expression(a),
          org.apache.spark.sql.graft.ColumnShim.expression(b)))
    cand
      .join(sets.select(col("asset_id").as("id_a"), col("hset").as("hs_a")), "id_a")
      .join(sets.select(col("asset_id").as("id_b"), col("hset").as("hs_b")), "id_b")
      .withColumn("shared", intersectSize(col("hs_a"), col("hs_b")).cast("double"))
      .withColumn("jaccard",
        col("shared") / (size(col("hs_a")) + size(col("hs_b")) - col("shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Shot-boundary detection + keyframe selection over a video's frame
    * stream — the standard video-curation step (one representative frame
    * per shot feeds the embedding/caption stage instead of every frame).
    *
    * Boundary rule: a new shot starts where the mean frame intensity jumps
    * by ≥ `meanDeltaThreshold`, tested CROSS-MULTIPLIED in exact integers
    * (|sum_i·n_{i−1} − sum_{i−1}·n_i| ≥ τ·n_i·n_{i−1}), so no float mean
    * ever exists to round differently across engines. Keyframe = the
    * shot's max-intensity frame (ties → earliest), selected via one
    * lexicographic struct-max — a production system swaps mean intensity
    * for a perceptual feature behind the same (frame → long) shape.
    *
    * Plan: per-frame integer stats are a pure map over the frame flatMap
    * (no shuffle); then ONE window shuffle keyed on asset_id orders frames
    * for the lag/cumulative-sum shot ids, and the keyframe argmax is a
    * map-combined struct-max per (asset, shot). Per-key work is bounded by
    * frames-per-video. Empty frames (empty payload) are dropped on both
    * engine and oracle sides. */
  def shotKeyframes(frames: Dataset[Frame], meanDeltaThreshold: Int = 2): DataFrame = {
    import frames.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val stats = frames
      .map(f => (f.asset_id, f.frame_idx, f.frame_bytes.length.toLong,
        f.frame_bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))))
      .toDF("asset_id", "frame_idx", "n_bytes", "sum_bytes")
      .filter(col("n_bytes") > 0)
    val w = Window.partitionBy(col("asset_id")).orderBy(col("frame_idx"))
    val shots = stats
      .withColumn("prev_n", lag(col("n_bytes"), 1).over(w))
      .withColumn("prev_sum", lag(col("sum_bytes"), 1).over(w))
      .withColumn("boundary",
        when(col("prev_n").isNull, lit(1)).otherwise(
          (abs(col("sum_bytes") * col("prev_n") - col("prev_sum") * col("n_bytes")) >=
            lit(meanDeltaThreshold.toLong) * col("n_bytes") * col("prev_n")).cast("int")))
      .withColumn("shot_id", sum(col("boundary")).over(w))
    shots.groupBy(col("asset_id"), col("shot_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        min(col("frame_idx")).as("start_frame"),
        max(struct(col("sum_bytes").as("s"), (-col("frame_idx")).as("neg_idx"))).as("__kf"))
      .select(col("asset_id"), col("shot_id"),
        col("n_frames"), col("start_frame"),
        (-col("__kf.neg_idx")).as("keyframe_idx"),
        col("__kf.s").as("keyframe_sum"))
  }

  final case class ResizedPixel(asset_id: Long, row_idx: Int, col_idx: Int, luma: Int)

  /** Nearest-neighbor resize over REAL decoded pixels, emitted as the
    * resized luma grid — the oracle-checkable face of [[resizeImages]]
    * (same source-index mapping: target (r,c) samples source
    * (r·H/newH, c·W/newW), integer division). Per-row flatMap, no shuffle;
    * output is newW·newH rows per asset regardless of source size, the
    * fixed-width contract a thumbnail/training-patch stage wants. */
  def imageResizeGrid(assets: Dataset[MediaAsset], decoder: MediaDecoder,
      newW: Int, newH: Int): Dataset[ResizedPixel] = {
    require(newW > 0 && newH > 0, s"degenerate resize target ${newW}x$newH")
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").flatMap { a =>
      val px = decoder.decodeImage(a.content, a.meta)
      // index by the DECODED dimensions; a metadata/header mismatch fails
      // fast with the asset named rather than as an executor AIOOBE
      val (h, w) = (px.length, if (px.isEmpty) 0 else px(0).length)
      require(h == a.meta.height && w == a.meta.width,
        s"asset ${a.asset_id}: decoded ${w}x$h != metadata ${a.meta.width}x${a.meta.height}")
      for { r <- 0 until newH; c <- 0 until newW } yield
        ResizedPixel(a.asset_id, r, c, px(r * h / newH)(c * w / newW) & 0xff)
    }
  }

  /** Resize plumbing: recompute metadata + stub-resample pixels through the
    * decoder. Plan shape (per-row map over binary + struct) is what a codec
    * resize looks like. */
  def resizeImages(
      assets: Dataset[MediaAsset], decoder: MediaDecoder, newW: Int, newH: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      if (a.kind != "image") a
      else {
        val px = decoder.decodeImage(a.content, a.meta)
        val out = Array.tabulate(newH, newW) { (r, c) =>
          px(r * a.meta.height / newH)(c * a.meta.width / newW)
        }
        a.copy(content = out.flatten, meta = a.meta.copy(width = newW, height = newH))
      }
    }
  }
}
