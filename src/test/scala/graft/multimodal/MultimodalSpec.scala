package graft.multimodal

import graft.{Graft, SparkSpec}

import Multimodal._

class MultimodalSpec extends SparkSpec {

  private lazy val assets =
    assetsFromDocuments(Graft.table(spark, "/root/testdata/sf0.001", "documents"))

  test("asset construction: every document becomes a typed binary asset") {
    val rows = assets.collect()
    assert(rows.length == 500)
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))
    rows.foreach { a =>
      assert(a.content.nonEmpty)
      a.kind match {
        case "image" => assert(a.meta.width == 16 && a.meta.height == 8)
        case "audio" => assert(a.meta.sampleRateHz == 16000)
        case _       => assert(a.meta.durationMs > 0)
      }
    }
  }

  test("feature extraction: fixed-width vectors, deterministic across runs") {
    val f1 = extractFeatures(assets, MediaDecoder.Fake, batchSize = 7)
      .collect().sortBy(_.asset_id)
    val f2 = extractFeatures(assets, MediaDecoder.Fake, batchSize = 64)
      .collect().sortBy(_.asset_id)
    assert(f1.length == 500)
    assert(f1.forall(_.features.length == 4))
    // batch size must not change results, only peak memory
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.asset_id == b.asset_id)
      assert(a.features.toSeq == b.features.toSeq)
    }
    // n_bytes feature equals binary length
    f1.foreach(f => assert(f.features(0).toLong == f.n_bytes))
  }

  test("fake image decode shapes pixels to (height x width) from metadata") {
    val a = assets.filter(_.kind == "image").head()
    val px = MediaDecoder.Fake.decodeImage(a.content, a.meta)
    assert(px.length == a.meta.height)
    assert(px.forall(_.length == a.meta.width))
  }

  test("frame sampling: one row per 40ms frame, bytes partition the content") {
    val vids = assets.filter(_.kind == "video")
    val frames = sampleFrames(vids, frameEveryMs = 40L).collect()
    val byAsset = frames.groupBy(_.asset_id)
    vids.collect().foreach { v =>
      val expected = math.max(1, (v.meta.durationMs / 40L).toInt)
      assert(byAsset(v.asset_id).length == expected, s"asset ${v.asset_id}")
      val idxs = byAsset(v.asset_id).map(_.frame_idx).sorted.toSeq
      assert(idxs == (0 until expected))
    }
  }

  test("resize recomputes metadata and content dimensions") {
    val resized = resizeImages(assets, MediaDecoder.Fake, newW = 4, newH = 2)
      .filter(_.kind == "image").collect()
    resized.foreach { a =>
      assert(a.meta.width == 4 && a.meta.height == 2)
      assert(a.content.length == 8)
    }
    // non-image assets pass through untouched
    val audio = resizeImages(assets, MediaDecoder.Fake, 4, 2).filter(_.kind == "audio").head()
    val orig = assets.filter(_.kind == "audio").head()
    assert(audio.content.toSeq == orig.content.toSeq)
  }

  test("audio windows partition the decoded samples; stats match a direct decode") {
    import spark.implicits._
    val assets = assetsFromDocuments(
      graft.Graft.table(spark, "/root/testdata/sf0.001", "documents"))
    val windows = audioWindows(assets, MediaDecoder.Fake, windowSamples = 64)
      .collect().groupBy(_.asset_id)
    val audio = assets.filter(_.kind == "audio").collect()
    assert(audio.nonEmpty && windows.keySet == audio.map(_.asset_id).toSet)
    audio.foreach { a =>
      val s = MediaDecoder.Fake.decodeAudio(a.content, a.meta)
      val ws = windows(a.asset_id).sortBy(_.window_idx)
      assert(ws.map(_.n_samples).sum == s.length, s"windows must partition samples")
      assert(ws.map(_.window_idx).toSeq == ws.indices.toSeq)
      assert(ws.init.forall(_.n_samples == 64), "only the last window may be short")
      assert(ws.map(_.sum_amp).sum == s.map(_.toLong).sum)
      assert(ws.map(_.peak_amp).max == s.map(x => math.abs(x.toInt)).max)
    }
  }

  test("frame-signature near-dup pairs byte-identical videos (re-containerized copies)") {
    import spark.implicits._
    // asset ids ≡ 2 (mod 3) are video-class; 2 and 5 carry identical bytes
    // (a re-muxed copy decodes to the same frames), 8 differs
    val txt = "identical frame payload content repeated for enough length to sample " * 4
    val docs = Seq((2L, txt), (5L, txt), (8L, "totally different video content here"))
      .toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.assetsFromDocuments(docs))
    val pairs = Multimodal.frameNearDupPairs(frames, 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((2L, 5L)), pairs.mkString(","))
    assert(pairs.head._3 == 1.0)
  }

  test("media features flow into the similarity path: near-copies are nearest neighbors") {
    import spark.implicits._
    // the extracted feature vector is array<float>, the exact input type of
    // Similarity.bruteForceTopK — media dedup/search composes with the ANN
    // stack with no adapter. All four assets are image-class (id % 3 = 0;
    // feature scales are only comparable within a kind). Asset 30's payload
    // is a near-copy of 3's; 60 and 90 differ — 3's top-1 must be 30.
    val base = "media payload with stable statistics abcdefghij " * 8
    val docs = Seq(
      (3L, base), (30L, base + "!"),
      (60L, "x" * 900), (90L, "short"))
      .toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(
        Multimodal.assetsFromDocuments(docs), Multimodal.MediaDecoder.Fake)
      .toDF().select(org.apache.spark.sql.functions.col("asset_id").as("id"),
        org.apache.spark.sql.functions.col("features").as("embedding"))
    val top1 = graft.operators.Similarity.bruteForceTopK(
        feats.filter(org.apache.spark.sql.functions.col("id") === 3L), feats, 1)
      .select("neighbor_id").as[Long].head()
    assert(top1 == 30L, s"nearest neighbor of the near-copy was $top1")
  }

  // ---- real uncompressed-format decode (no codec dependency) ----

  private def le16(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Minimal canonical 16-bit PCM WAV encoder (mono), with an extra LIST
    * chunk before data to exercise the chunk walk. */
  private def wavPcm16(samples: Seq[Short], sampleRate: Int = 16000): Array[Byte] = {
    val dataLen = samples.length * 2
    val listBody = "INFO".getBytes("US-ASCII").toSeq
    val riffLen = 4 + (8 + 16) + (8 + listBody.length) + (8 + dataLen)
    val bytes = Seq.newBuilder[Byte]
    bytes ++= "RIFF".getBytes("US-ASCII"); bytes ++= le32(riffLen)
    bytes ++= "WAVE".getBytes("US-ASCII")
    bytes ++= "fmt ".getBytes("US-ASCII"); bytes ++= le32(16)
    bytes ++= le16(1)                    // PCM
    bytes ++= le16(1)                    // mono
    bytes ++= le32(sampleRate)
    bytes ++= le32(sampleRate * 2)       // byte rate
    bytes ++= le16(2)                    // block align
    bytes ++= le16(16)                   // bits per sample
    bytes ++= "LIST".getBytes("US-ASCII"); bytes ++= le32(listBody.length); bytes ++= listBody
    bytes ++= "data".getBytes("US-ASCII"); bytes ++= le32(dataLen)
    samples.foreach(s => bytes ++= le16(s & 0xffff))
    bytes.result().toArray
  }

  /** Minimal 24-bit BI_RGB BMP encoder; `pixels(r)(c) = (red, green, blue)`
    * top row first. Positive height → bottom-up pixel array (the common
    * on-disk layout), negative → top-down. */
  private def bmp24(pixels: Seq[Seq[(Int, Int, Int)]], topDown: Boolean = false): Array[Byte] = {
    val h = pixels.length
    val w = pixels.head.length
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val pixOff = 54
    val bytes = Seq.newBuilder[Byte]
    bytes ++= "BM".getBytes("US-ASCII"); bytes ++= le32(pixOff + rowBytes * h)
    bytes ++= le32(0); bytes ++= le32(pixOff)
    bytes ++= le32(40); bytes ++= le32(w); bytes ++= le32(if (topDown) -h else h)
    bytes ++= le16(1); bytes ++= le16(24); bytes ++= le32(0) // planes, bpp, BI_RGB
    bytes ++= le32(rowBytes * h); bytes ++= le32(2835); bytes ++= le32(2835)
    bytes ++= le32(0); bytes ++= le32(0)
    val storageRows = if (topDown) pixels else pixels.reverse
    storageRows.foreach { row =>
      row.foreach { case (r, g, b) =>
        bytes += b.toByte; bytes += g.toByte; bytes += r.toByte
      }
      (w * 3 until rowBytes).foreach(_ => bytes += 0.toByte)
    }
    bytes.result().toArray
  }

  test("real WAV decode: PCM16 samples round-trip bit-exactly through the chunk walk") {
    val samples = Seq[Short](0, 1, -1, 12345, -12345, Short.MaxValue, Short.MinValue)
    val decoded = MediaDecoder.Uncompressed.decodeAudio(
      wavPcm16(samples), MediaMeta("wav", 0, 0, 16000, 0L))
    assert(decoded.toSeq == samples)
    // compressed/float formats must fail fast, not degrade to the fake
    val floatWav = {
      val b = wavPcm16(samples)
      b(20) = 3.toByte // fmt code 3 = IEEE float
      b
    }
    val e = intercept[IllegalArgumentException] {
      MediaDecoder.Uncompressed.decodeAudio(floatWav, MediaMeta("wav", 0, 0, 16000, 0L))
    }
    assert(e.getMessage.contains("16-bit PCM"))
  }

  test("real BMP decode: 24-bit pixels to BT.601 luma, bottom-up and top-down, padded rows") {
    // 3x2: distinct channel mixes; width 3 forces a padded (9→12 byte) row
    val px = Seq(
      Seq((255, 0, 0), (0, 255, 0), (0, 0, 255)),
      Seq((255, 255, 255), (0, 0, 0), (100, 150, 200)))
    val expected = px.map(_.map { case (r, g, b) => ((299 * r + 587 * g + 114 * b) / 1000).toByte })
    val meta = MediaMeta("bmp", 3, 2, 0, 0L)
    val up = MediaDecoder.Uncompressed.decodeImage(bmp24(px), meta)
    assert(up.map(_.toSeq).toSeq == expected)
    val down = MediaDecoder.Uncompressed.decodeImage(bmp24(px, topDown = true), meta)
    assert(down.map(_.toSeq).toSeq == expected)
    val e = intercept[IllegalArgumentException] {
      MediaDecoder.Uncompressed.decodeImage("BM".getBytes ++ new Array[Byte](60), meta)
    }
    assert(e.getMessage.contains("24-bit"))
  }

  test("real decoders drive the full Spark plumbing end-to-end on real bytes") {
    import spark.implicits._
    // image assets (id % 3 == 0) carry real BMPs, audio (id % 3 == 1) real
    // WAVs — the same mapPartitions/flatMap operators, zero plan changes
    val imgBytes = bmp24(Seq(
      Seq((10, 20, 30), (40, 50, 60)),
      Seq((70, 80, 90), (200, 210, 220))))
    val wavBytes = wavPcm16(Seq.tabulate(300)(i => ((i * 37) % 2000 - 1000).toShort))
    val rows = Seq(
      MediaAsset(0L, "image", imgBytes, MediaMeta("bmp", 2, 2, 0, 0L)),
      MediaAsset(1L, "audio", wavBytes, MediaMeta("wav", 0, 0, 16000, 300L)))
    val ds = spark.createDataset(rows)
    val feats = extractFeatures(ds, MediaDecoder.Uncompressed).collect().sortBy(_.asset_id)
    assert(feats.length == 2 && feats.forall(_.features.length == 4))
    // mean pixel/sample features agree with a direct local decode
    val pxMean = {
      val flat = MediaDecoder.Uncompressed.decodeImage(imgBytes, rows(0).meta).flatten
      (flat.map(b => (b & 0xff).toLong).sum.toDouble / flat.length).toFloat
    }
    assert(feats(0).features(1) == pxMean)
    val sMean = {
      val s = MediaDecoder.Uncompressed.decodeAudio(wavBytes, rows(1).meta)
      (s.map(_.toLong).sum.toDouble / s.length).toFloat
    }
    assert(feats(1).features(1) == sMean)
    // audio windowing over real samples partitions them exactly
    val ws = audioWindows(ds, MediaDecoder.Uncompressed, windowSamples = 128)
      .collect().sortBy(_.window_idx)
    assert(ws.map(_.n_samples).sum == 300)
    assert(ws.map(_.n_samples).toSeq == Seq(128, 128, 44))
  }

  test("synthWav: real decoder round-trips the formula; the LIST chunk must be walked") {
    import Multimodal._
    val wav = synthWav(seed = 7L, nSamples = 33)
    val meta = MediaMeta("wav", 0, 0, 8000, 0L)
    val got = MediaDecoder.Uncompressed.decodeAudio(wav, meta)
    val want = Array.tabulate(33)(i => (((7L * 31 + i * 7) % 65536) - 32768).toShort)
    assert(got.sameElements(want), "decoded samples must equal the synthesis formula")
    // the fake decoder CANNOT reproduce them (it reads the container bytes
    // positionally) — proving m05 exercises the real chunk walk
    val fake = MediaDecoder.Fake.decodeAudio(wav, meta)
    assert(!fake.sameElements(want), "fake decoder must diverge on a real container")
    // corrupting the RIFF magic fails fast, not garbage output
    val bad = wav.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException] {
      MediaDecoder.Uncompressed.decodeAudio(bad, meta)
    }
  }

  test("synthBmp: real decoder round-trips the luma formula incl. flip and padding") {
    import Multimodal._
    val (seed, w, h) = (9L, 5, 4)   // w=5 -> rowBytes 16, real padding
    val px = MediaDecoder.Uncompressed.decodeImage(
      synthBmp(seed, w, h), MediaMeta("bmp", w, h, 0, 0L))
    assert(px.length == h && px.head.length == w)
    for (r <- 0 until h; c <- 0 until w) {
      val want = (299 * ((seed + r * 3 + c * 7) % 256)
        + 587 * ((seed * 5 + r * 11 + c) % 256)
        + 114 * ((seed * 7 + r + c * 13) % 256)) / 1000
      assert((px(r)(c) & 0xff) == want.toInt, s"($r,$c): got ${px(r)(c) & 0xff} want $want")
    }
  }

  test("imageResizeGrid matches resizeImages' index mapping on real BMP decode") {
    import Multimodal._
    import spark.implicits._
    val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val assets = bmpAssetsFromDocuments(docs)
    val grid = imageResizeGrid(assets, MediaDecoder.Uncompressed, newW = 2, newH = 2)
      .collect().map(p => (p.asset_id, p.row_idx, p.col_idx) -> p.luma).toMap
    // 4 pixels per image asset, values equal to direct decode + the
    // resizeImages source-index formula
    val sample = assets.take(5)
    assert(sample.nonEmpty)
    sample.foreach { a =>
      val px = MediaDecoder.Uncompressed.decodeImage(a.content, a.meta)
      for (r <- 0 until 2; c <- 0 until 2) {
        val want = px(r * a.meta.height / 2)(c * a.meta.width / 2) & 0xff
        assert(grid((a.asset_id, r, c)) == want, s"asset ${a.asset_id} ($r,$c)")
      }
    }
    assert(grid.size == assets.count() * 4)
  }

  test("synthCompressedImage png: ImageIo decoder recovers the luma formula exactly") {
    import Multimodal._
    val (seed, w, h) = (11L, 6, 4)
    val png = synthCompressedImage(seed, w, h, "png")
    // a real PNG bitstream, not a raw byte layout
    assert(png.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val px = MediaDecoder.ImageIo.decodeImage(png, MediaMeta("png", w, h, 0, 0L))
    assert(px.length == h && px.head.length == w)
    for (r <- 0 until h; c <- 0 until w) {
      val want = (299 * ((seed + r * 3 + c * 7) % 256)
        + 587 * ((seed * 5 + r * 11 + c) % 256)
        + 114 * ((seed * 7 + r + c * 13) % 256)) / 1000
      assert((px(r)(c) & 0xff) == want.toInt, s"($r,$c): got ${px(r)(c) & 0xff} want $want")
    }
    // garbage bytes fail fast with a named error, not a null-deref
    intercept[IllegalArgumentException] {
      MediaDecoder.ImageIo.decodeImage(Array[Byte](1, 2, 3, 4), MediaMeta("png", 1, 1, 0, 0L))
    }
  }

  test("ImageIo also decodes the synthBmp containers, agreeing with the pure-JVM walk") {
    import Multimodal._
    val (seed, w, h) = (9L, 5, 4)
    val bmp = synthBmp(seed, w, h)
    val meta = MediaMeta("bmp", w, h, 0, 0L)
    val a = MediaDecoder.Uncompressed.decodeImage(bmp, meta)
    val b = MediaDecoder.ImageIo.decodeImage(bmp, meta)
    assert(a.length == b.length)
    a.zip(b).foreach { case (ra, rb) => assert(ra.sameElements(rb)) }
  }

  test("jpeg decode: real bitstream, exact dims, luma sum within DC-quantization tolerance") {
    import Multimodal._
    val (seed, w, h) = (13L, 9, 8)
    val jpg = synthCompressedImage(seed, w, h, "jpg")
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "JPEG SOI marker")
    val px = MediaDecoder.ImageIo.decodeImage(jpg, MediaMeta("jpeg", w, h, 0, 0L))
    assert(px.length == h && px.head.length == w)
    val sum = px.iterator.flatMap(_.iterator).map(b => (b & 0xff).toLong).sum
    val want = synthLumaSum(seed, w, h)
    assert(math.abs(sum - want) <= 8L * w * h,
      s"decoded luma sum $sum vs exact $want drifted past 8/pixel")
    // and the synthLumaSum helper agrees with a direct PNG (lossless) decode
    val pngPx = MediaDecoder.ImageIo.decodeImage(
      synthCompressedImage(seed, w, h, "png"), MediaMeta("png", w, h, 0, 0L))
    assert(pngPx.iterator.flatMap(_.iterator).map(b => (b & 0xff).toLong).sum == want)
  }

  test("imageDecodeCheck end-to-end over the png/jpeg asset builders") {
    import Multimodal._
    val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val png = imageDecodeCheck(pngAssetsFromDocuments(docs), MediaDecoder.ImageIo,
      a => synthLumaSum(a.asset_id, a.meta.width, a.meta.height), tolPerPixel = 0)
      .collect()
    assert(png.nonEmpty)
    // PNG is lossless: tolerance ZERO must already hold everywhere
    png.foreach(c => assert(c.mean_within_tol, s"asset ${c.asset_id} png decode drifted"))
    val jpg = imageDecodeCheck(jpegAssetsFromDocuments(docs), MediaDecoder.ImageIo,
      a => synthLumaSum(a.asset_id, a.meta.width, a.meta.height), tolPerPixel = 8)
      .collect()
    assert(jpg.nonEmpty)
    jpg.foreach { c =>
      assert(c.height == 8 && c.width >= 8 && c.n_pixels == c.width.toLong * 8)
      assert(c.mean_within_tol, s"asset ${c.asset_id} jpeg luma sum outside 8/pixel")
    }
    // a WRONG expected sum fails the gate — the tolerance is a gate, not a pass
    val bad = imageDecodeCheck(jpegAssetsFromDocuments(docs).limit(3), MediaDecoder.ImageIo,
      a => synthLumaSum(a.asset_id, a.meta.width, a.meta.height) + 100000L, tolPerPixel = 8)
      .collect()
    bad.foreach(c => assert(!c.mean_within_tol))
  }

  test("imageResizeGrid fails fast on degenerate targets and metadata mismatches") {
    import Multimodal._
    import spark.implicits._
    val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    intercept[IllegalArgumentException] {
      imageResizeGrid(bmpAssetsFromDocuments(docs), MediaDecoder.Uncompressed, 0, 2)
    }
    // metadata claiming the wrong dims surfaces as a named require, not AIOOBE
    val lying = bmpAssetsFromDocuments(docs).limit(1)
      .map(a => a.copy(meta = a.meta.copy(width = a.meta.width + 1)))
    val err = intercept[org.apache.spark.SparkException] {
      imageResizeGrid(lying, MediaDecoder.Uncompressed, 2, 2).collect()
    }
    assert(err.getMessage.contains("decoded") || Option(err.getCause).exists(
      _.getMessage.contains("decoded")))
  }

  test("mjpeg avi: real container walk + per-frame JPEG decode recovers every frame") {
    val avi = synthMjpegAvi(seed = 42L, width = 9, height = 8, nFrames = 3)
    // a real RIFF/AVI container, not a bare JPEG concat
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF"
      && new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val frames = decodeAviMjpegFrames(avi)
    assert(frames.length == 3, s"container walk found ${frames.length}/3 frames")
    frames.zipWithIndex.foreach { case (px, f) =>
      assert(px.length == 8 && px(0).length == 9, "decoded frame dims drifted")
      val sum = px.iterator.flatMap(_.iterator).map(b => (b & 0xff).toLong).sum
      val expected = synthLumaSum(frameSeed(42L, f), 9, 8)
      assert(math.abs(sum - expected) <= 8L * 9 * 8,
        s"frame $f luma sum $sum vs expected $expected beyond DC tolerance")
    }
    // frames differ (per-frame seeds), so a shuffled/misordered walk would
    // fail the per-frame sums above
    assert(frames.map(_.flatten.toSeq).distinct.length == 3)
    // non-AVI payloads fail fast with what was found
    val e = intercept[IllegalArgumentException](decodeAviMjpegFrames("not avi at all".getBytes))
    assert(e.getMessage.contains("RIFF/AVI"))
  }

  test("mjpeg avi: decoded frames feed the standard frame operators unchanged") {
    import spark.implicits._
    val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val vids = aviAssetsFromDocuments(docs).limit(6)
    val frames = framesFromAvi(vids)
    val byAsset = frames.collect().groupBy(_.asset_id)
    val metas = vids.collect().map(a => a.asset_id -> a.meta).toMap
    assert(byAsset.keySet == metas.keySet)
    byAsset.foreach { case (id, fs) =>
      assert(fs.length == (metas(id).durationMs / 40L).toInt,
        s"asset $id: ${fs.length} decoded frames vs declared ${metas(id).durationMs / 40L}")
      assert(fs.forall(_.frame_bytes.length == metas(id).width * metas(id).height))
    }
    // signatures + shot segmentation run on genuinely-decoded pixels
    val sigs = frameSignatures(frames).collect()
    assert(sigs.length == byAsset.values.map(_.length).sum)
    val shots = shotKeyframes(frames).collect()
    assert(shots.nonEmpty && shots.map(_.getAs[Long]("asset_id")).toSet == metas.keySet)
  }

  test("imageDHash: exact dup = 0, same-key width change = small, distinct keys = far") {
    import Multimodal._
    import spark.implicits._
    def hashOf(seed: Long, w: Int): Long = {
      val a = MediaAsset(1L, "image", synthBmpKeyed(seed, w, 16), MediaMeta("bmp", w, 16, 0, 0L))
      imageDHash(Seq(a).toDS(), MediaDecoder.Uncompressed).head().dhash
    }
    val base = hashOf(7L, 16)
    assert(hashOf(7L, 16) == base, "same seed+width must hash identically")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the near-dup plant: across the key space, width-changed twins land
    // CLOSE for a meaningful fraction of keys (how close is seed-dependent
    // - a virtual-column shift of 1 flips more bits for some multipliers)
    // (the 17/18 widths' virtual-column patterns nearly coincide; 16's
    // pattern is exact and sits farther from both)
    val widthHams = (1L to 60L).map(k => ham(hashOf(k, 17), hashOf(k, 18)))
    assert(widthHams.count(h => h > 0 && h <= 4) >= 5,
      s"expected planted near-dups across keys, got ${widthHams.sorted.take(10)}")
    // distinct keys separate STATISTICALLY: like any perceptual hash,
    // dHash admits rare borderline collisions (low seeds with no mod-256
    // wraparound can agree on many comparison signs) - the property is a
    // tiny cross-key collision RATE, not zero
    val keys = (1L to 60L).map(hashOf(_, 16))
    val crossHams = for (i <- keys.indices; j <- i + 1 until keys.size)
      yield ham(keys(i), keys(j))
    val colliding = crossHams.count(_ <= 4)
    assert(colliding <= crossHams.size / 100,
      s"$colliding of ${crossHams.size} cross-key pairs under the verify threshold")
    // 56-bit budget: every hash (and every 14-bit band) stays non-negative
    assert(base >= 0L && (base >> 56) == 0L)
  }

  test("imagePHash catches JPEG re-encodes that dHash demonstrably misses") {
    import Multimodal._
    import spark.implicits._
    def asset(id: Long, bytes: Array[Byte], fmt: String, w: Int): MediaAsset =
      MediaAsset(id, "image", bytes, MediaMeta(fmt, w, 16, 0, 0L))
    def pHashOf(a: MediaAsset): Long =
      imagePHash(Seq(a).toDS(), MediaDecoder.ImageIo).head().dhash
    def dHashOf(a: MediaAsset): Long =
      imageDHash(Seq(a).toDS(), MediaDecoder.ImageIo).head().dhash
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the planted pairs: the SAME synthBmpKeyed image as a lossless BMP
    // and as a real lossy JPEG re-encode (stock-JDK encoder)
    val stats = (1L to 60L).map { k =>
      val bmp = asset(k, synthBmpKeyed(k, 16, 16), "bmp", 16)
      val jpg = asset(k + 1000, reencodeKeyedJpeg(k, 16, 16), "jpg", 16)
      (ham(dHashOf(bmp), dHashOf(jpg)), ham(pHashOf(bmp), pHashOf(jpg)))
    }
    // dHash: pointwise comparisons scatter under DCT quantization — the
    // re-encoded twin drifts past the m11 verify gate (<= 4) for most keys
    val dMissed = stats.count(_._1 > 4)
    // pHash: the low-frequency block survives the re-encode — same pairs
    // stay inside a tight gate
    val pCaught = stats.count(_._2 <= 6)
    assert(dMissed >= 30, s"expected dHash to miss most re-encodes, missed $dMissed/60 " +
      s"(dHash hams: ${stats.map(_._1).sorted.mkString(",")})")
    assert(pCaught >= 45, s"expected pHash to hold re-encodes close, caught $pCaught/60 " +
      s"(pHash hams: ${stats.map(_._2).sorted.mkString(",")})")
    // and the pairs dHash loses are still recovered by pHash
    val recovered = stats.count(s => s._1 > 4 && s._2 <= 6)
    assert(recovered >= 25, s"pHash recovered only $recovered dHash-missed re-encodes")
    // cross-key separation: distinct keys stay far under pHash
    val ph = (1L to 60L).map(k => pHashOf(asset(k, synthBmpKeyed(k, 16, 16), "bmp", 16)))
    val cross = for (i <- ph.indices; j <- i + 1 until ph.size) yield ham(ph(i), ph(j))
    assert(cross.count(_ <= 6) <= cross.size / 50,
      s"${cross.count(_ <= 6)} of ${cross.size} cross-key pairs inside the pHash gate")
    // 63-bit budget: hash and every 16-bit band non-negative
    assert(ph.forall(h => h >= 0L && (h >> 63) == 0L))
  }

  test("audioContourHash: exact dup = 0, length jitter = near, distinct keys = far") {
    import Multimodal._
    import spark.implicits._
    def hashOf(seedKey: Long, n: Int): Long = {
      val a = MediaAsset(1L, "audio", synthWavKeyed(seedKey, n),
        MediaMeta("wav", 0, 0, 8000, n * 1000L / 8000))
      audioContourHash(Seq(a).toDS(), MediaDecoder.Uncompressed).head().chash
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hashOf(7L, 82) == hashOf(7L, 82))
    // length jitter lands NEAR for a meaningful fraction of keys
    val jitterHams = (1L to 60L).flatMap(k =>
      Seq(ham(hashOf(k, 80), hashOf(k, 82)), ham(hashOf(k, 82), hashOf(k, 84))))
    assert(jitterHams.count(h => h > 0 && h <= 3) >= 10,
      s"expected planted near-dups, got ${jitterHams.sorted.take(10)}")
    // distinct keys decorrelate: rare borderline collisions at most
    val keys = (1L to 60L).map(hashOf(_, 82))
    val cross = for (i <- keys.indices; j <- i + 1 until keys.size) yield ham(keys(i), keys(j))
    assert(cross.count(_ <= 3) <= cross.size / 100,
      s"${cross.count(_ <= 3)} of ${cross.size} cross-key pairs under the threshold")
    // 31-bit budget: hash and both bands stay non-negative
    assert(keys.forall(h => h >= 0L && (h >> 31) == 0L))
  }

  test("audioSpectralHash: exact dup = 0; requantize and scale-factor re-encodes stay inside the gate") {
    import Multimodal._
    import spark.implicits._
    val meta = MediaMeta("wav", 0, 0, 8000, 0L)
    def hashOf(bytes: Array[Byte]): Long =
      audioSpectralHash(Seq(MediaAsset(1L, "audio", bytes, meta)).toDS(),
        MediaDecoder.Uncompressed).head().chash
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // exact duplicate → identical hash
    assert(hashOf(synthWavKeyed(7L, 82)) == hashOf(synthWavKeyed(7L, 82)))
    // re-encode robustness: 8-bit-depth requantization (step 256) and ±1%
    // per-window scale-factor jitter both hold the pair inside the m15
    // verify gate (≤ 3) — the envelope survives what lossy codecs do
    val stats = (1L to 60L).map { k =>
      val orig = synthWavKeyed(k, 82)
      val h = hashOf(orig)
      (ham(h, hashOf(requantizeWav(orig, meta, 256))),
        ham(h, hashOf(scaleJitterWav(orig, meta, 10))))
    }
    assert(stats.count(_._1 <= 3) >= 55,
      s"requantized re-encodes drifted: ${stats.map(_._1).sorted.mkString(",")}")
    assert(stats.count(_._2 <= 3) >= 55,
      s"scale-factor re-encodes drifted: ${stats.map(_._2).sorted.mkString(",")}")
    // cross-key separation: distinct keys stay outside the gate
    val keys = (1L to 60L).map(k => hashOf(synthWavKeyed(k, 82)))
    val cross = for (i <- keys.indices; j <- i + 1 until keys.size) yield ham(keys(i), keys(j))
    assert(cross.count(_ <= 3) <= cross.size / 100,
      s"${cross.count(_ <= 3)} of ${cross.size} cross-key pairs inside the gate")
    // 31-bit budget: hash and both LSH bands stay non-negative
    assert(keys.forall(h => h >= 0L && (h >> 31) == 0L))
  }

  test("videoKeyframeDHash: same key = 0 through the lossy decode regardless of cut; keys separate") {
    import Multimodal._
    import spark.implicits._
    def hashOf(key: Long, nFrames: Int): Long = {
      val w = (32 + (key % 3) * 8).toInt
      val a = MediaAsset(1L, "video", synthMjpegAvi(key + 1, w, 32, nFrames),
        MediaMeta("avi", w, 32, 0, 40L * nFrames))
      videoKeyframeDHash(Seq(a).toDS()).head().dhash
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // "same video, different cut": the keyframe JPEG bytes are identical,
    // so the lossy decode yields EXACTLY the same hash — Hamming 0, not
    // merely small (this determinism is what the m13 oracle leans on)
    assert((1L to 20L).forall(k => ham(hashOf(k, 2), hashOf(k, 5)) == 0),
      "frame-count jitter must not touch the keyframe hash")
    // distinct keys land far apart despite DCT quantization (the fixture
    // uses multi-block 32-48 px frames precisely so smoothing does not
    // collapse the hash space): measured cross-key minimum is 6, so the
    // m13 verify gate (Hamming <= 4) admits ZERO false pairs even when a
    // 14-bit band of a close pair collides
    val keys = (0L to 59L).map(hashOf(_, 3))
    val cross = for (i <- keys.indices; j <- i + 1 until keys.size) yield ham(keys(i), keys(j))
    assert(cross.count(_ <= 4) == 0,
      s"${cross.count(_ <= 4)} of ${cross.size} cross-key pairs under the m13 gate " +
        s"(min=${cross.min})")
    // 56-bit budget holds for the video face too
    assert(keys.forall(h => h >= 0L && (h >> 56) == 0L))
  }

  test("MediaDecoder seam: a custom video decoder flows through the m10/m13 " +
      "operator paths unchanged") {
    import Multimodal._
    import spark.implicits._
    // A pretend COMPRESSED format the built-ins cannot read: frames packed
    // as [w, h, nFrames] + per-frame row-major luma XOR 0x5A. The custom
    // decoder stands in for an ffmpeg-backed H.264 implementation: it
    // overrides decodeVideoFrames ALONE, per the documented contract.
    def pack(w: Int, h: Int, frames: Array[Array[Array[Byte]]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(w); out.write(h); out.write(frames.length)
      frames.foreach(_.foreach(row => row.foreach(b => out.write((b ^ 0x5a) & 0xff))))
      out.toByteArray
    }
    object XorPackedDecoder extends MediaDecoder {
      def decodeImage(content: Array[Byte], meta: MediaMeta): Array[Array[Byte]] =
        throw new IllegalArgumentException("xor-packed: video-only format")
      def decodeAudio(content: Array[Byte], meta: MediaMeta): Array[Short] =
        throw new IllegalArgumentException("xor-packed: video-only format")
      override def decodeVideoFrames(content: Array[Byte], meta: MediaMeta): Array[Array[Array[Byte]]] = {
        val (w, h, n) = (content(0) & 0xff, content(1) & 0xff, content(2) & 0xff)
        var o = 3
        Array.fill(n) {
          Array.fill(h) {
            val row = Array.tabulate(w)(c => ((content(o + c) & 0xff) ^ 0x5a).toByte)
            o += w; row
          }
        }
      }
    }
    def luma(seed: Long, w: Int, h: Int, f: Int): Array[Array[Byte]] =
      Array.tabulate(h, w) { (r, c) =>
        // decorrelated per-pixel pattern (a gradient would make every
        // seed's dHash identical — all comparisons point the same way)
        (((seed ^ (r * 73L + c * 151L + f * 31L)) * 1103515245L + 12345L) >>> 16).toByte
      }
    def asset(id: Long, seed: Long, n: Int): MediaAsset = {
      val (w, h) = (16, 8)
      MediaAsset(id, "video", pack(w, h, Array.tabulate(n)(luma(seed, w, h, _))),
        MediaMeta("xorpacked", w, h, 0, 40L * n))
    }
    // m13 path: keyframe dHash through the custom decoder — same seed,
    // different cut = Hamming 0; different seeds separate
    val ds = Seq(asset(1, 9, 2), asset(2, 9, 5), asset(3, 123, 3)).toDS()
    val hs = videoKeyframeDHash(ds, decoder = XorPackedDecoder)
      .collect().map(x => x.asset_id -> x.dhash).toMap
    assert(hs(1L) == hs(2L), "same-seed keyframes must hash identically")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) > 4,
      "distinct seeds must separate past the m13 gate")
    // m10 path: per-frame decode check — dims exact, luma sums EXACT
    // (tol 0) because the custom decode is lossless
    def expect(a: MediaAsset, f: Int): Long =
      luma(if (a.asset_id == 3) 123 else 9, 16, 8, f)
        .iterator.flatMap(_.iterator).map(b => (b & 0xff).toLong).sum
    val checks = videoDecodeCheck(ds, expect, tolPerPixel = 0,
      decoder = XorPackedDecoder).collect()
    assert(checks.length == 2 + 5 + 3)
    checks.foreach { c =>
      assert(c.width == 16 && c.height == 8 && c.n_pixels == 128, c.toString)
      assert(c.mean_within_tol, s"frame luma drifted: $c")
    }
    // the standard frame operators run on the custom decode too
    val frames = framesFromAvi(ds, decoder = XorPackedDecoder).collect()
    assert(frames.length == 10 && frames.forall(_.frame_bytes.length == 128))
    // and the DEFAULT decoder on the same operators still walks real AVI
    // (the seam changed nothing for the built-in path)
    val avi = MediaAsset(7L, "video", synthMjpegAvi(5, 32, 32, 2),
      MediaMeta("avi", 32, 32, 0, 80L))
    assert(videoKeyframeDHash(Seq(avi).toDS()).collect().length == 1)
  }
}
