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
}
