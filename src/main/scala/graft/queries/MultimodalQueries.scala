package graft.queries

import graft.Graft.table
import org.apache.spark.sql.functions._

/** Binary-column queries over document bytes — the oracle-checkable half of
  * the multimodal surface (typed decode/feature plumbing lives in
  * `graft.multimodal` with its own spec). m05–m09 gate REAL decoders
  * end-to-end: pure-JVM WAV/BMP chunk walks and the stock-JDK
  * `javax.imageio` PNG/JPEG paths; only compressed audio/video codecs
  * (absent from any stock JVM) stay stubbed.
  */
object MultimodalQueries {

  /** Opaque binary handling: cast to bytes, octet length, content digest,
    * first byte — the operations a 100 TB binary-asset table needs pushed to
    * executors (never the driver). */
  val m01BinaryStats = GraftQuery(
    "m01_binary_stats",
    (s, dir) =>
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          octet_length(col("text").cast("binary")).as("n_bytes"),
          md5(col("text").cast("binary")).as("content_md5"),
          ascii(substring(col("text"), 1, 1)).cast("int").as("first_byte"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             md5(text) AS content_md5,
             CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte
      FROM documents
      ORDER BY doc_id"""))

  /** Frame-sampling statistics through the TYPED multimodal path
    * (`assetsFromDocuments` → `sampleFrames`: case-class Datasets, pure
    * flatMap fan-out, no shuffle until the final per-asset aggregate). The
    * oracle recomputes the deterministic frame plan — count, byte budget,
    * last index — from first principles (byte length → duration → window
    * slicing), so the hash-match pins the whole typed pipeline: asset
    * construction, duration metadata, frame slicing arithmetic. */
  val m02FrameStats = GraftQuery(
    "m02_frame_stats",
    (s, dir) => {
      import graft.multimodal.Multimodal
      val frames = Multimodal.sampleFrames(
        Multimodal.assetsFromDocuments(table(s, dir, "documents")))
      frames.toDF()
        .groupBy(col("asset_id"))
        .agg(
          count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame_bytes"))).as("total_frame_bytes"),
          max(col("frame_idx")).as("last_frame_idx"))
        .orderBy(col("asset_id"))
    },
    Some("""
      WITH v AS (
        SELECT doc_id AS asset_id, octet_length(encode(text)) AS len
        FROM documents WHERE doc_id % 3 = 2),
      p AS (
        SELECT asset_id, len,
               (1 + len // 128) AS n,
               greatest(len // (1 + len // 128), 1) AS w
        FROM v),
      f AS (SELECT asset_id, unnest(range(0, n)) AS i, w, len FROM p)
      SELECT asset_id,
             CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(greatest(least(w, len - i*w), 0)) AS BIGINT) AS total_frame_bytes,
             CAST(MAX(i) AS INT) AS last_frame_idx
      FROM f
      GROUP BY asset_id
      ORDER BY asset_id"""))

  /** Audio-window stats through the typed path (`assetsFromDocuments` →
    * `audioWindows`): PCM decode (stubbed, deterministic byte arithmetic),
    * fixed 256-sample windows, exact integer amplitude sum + peak per
    * window. The oracle recomputes the decode from first principles —
    * sample_i = byte(2i mod len)·256 + byte((2i+1) mod len) over the ASCII
    * payload — so the hash-match pins decode, windowing, and stats.
    *
    * Oracle precondition (verified for every fixture SF): the corpus is
    * pure ASCII, where `ascii(substr(text, i, 1))` IS byte i and bytes are
    * < 0x80 so the Scala side's signed-short cast never wraps. A non-ASCII
    * corpus would need a BLOB-indexing oracle; the Scala operator itself is
    * byte-correct either way. Empty text is guarded with greatest(len, 1)
    * (the decoder emits one zero sample; ascii('') = 0 matches). */
  val m03AudioWindows = GraftQuery(
    "m03_audio_windows",
    (s, dir) => {
      import graft.multimodal.Multimodal
      Multimodal.audioWindows(
          Multimodal.assetsFromDocuments(table(s, dir, "documents")),
          Multimodal.MediaDecoder.Fake)
        .toDF()
        .select(col("asset_id"), col("window_idx"), col("n_samples"),
          col("sum_amp"), col("peak_amp"))
        .orderBy(col("asset_id"), col("window_idx"))
    },
    Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, text,
               octet_length(encode(text)) AS len
        FROM documents WHERE doc_id % 3 = 1),
      s AS (
        SELECT asset_id, i,
               ascii(substr(text, CAST(((2*i) % greatest(len, 1)) + 1 AS INT), 1)) * 256
                 + ascii(substr(text, CAST(((2*i + 1) % greatest(len, 1)) + 1 AS INT), 1)) AS samp
        FROM a, LATERAL unnest(range(0, greatest(len // 2, 1))) AS t(i))
      SELECT asset_id,
             CAST(i // 256 AS INT) AS window_idx,
             CAST(COUNT(*) AS INT) AS n_samples,
             CAST(SUM(samp) AS BIGINT) AS sum_amp,
             CAST(MAX(abs(samp)) AS INT) AS peak_amp
      FROM s
      GROUP BY asset_id, i // 256
      ORDER BY asset_id, window_idx"""))

  /** Shot-boundary detection + keyframe selection
    * ([[graft.multimodal.Multimodal.shotKeyframes]]) through the typed
    * video path: per-frame integer intensity stats, cross-multiplied
    * mean-jump boundaries (no float mean exists anywhere), cumulative-sum
    * shot ids, struct-max keyframe per shot. The oracle recomputes frame
    * windows and ascii byte sums from the documents text exactly as
    * m02/m03 do, then replays the identical integer boundary/argmax
    * logic — decode, windowing, detection and selection all hash-pinned.
    * Same ASCII-corpus precondition as m03. */
  val m04ShotKeyframes = GraftQuery(
    "m04_shot_keyframes",
    (s, dir) => {
      import graft.multimodal.Multimodal
      Multimodal.shotKeyframes(
          Multimodal.sampleFrames(
            Multimodal.assetsFromDocuments(table(s, dir, "documents"))),
          meanDeltaThreshold = 2)
        .orderBy(col("asset_id"), col("shot_id"))
    },
    Some("""
      WITH v AS (
        SELECT doc_id AS asset_id, text, octet_length(encode(text)) AS len
        FROM documents WHERE doc_id % 3 = 2),
      p AS (SELECT asset_id, text, len, (1 + len // 128) AS n,
                   greatest(len // (1 + len // 128), 1) AS w FROM v),
      f AS (SELECT asset_id, unnest(range(0, n)) AS i, w, len, text FROM p),
      fs AS (
        SELECT asset_id, CAST(i AS INT) AS frame_idx,
               CAST(greatest(least(w, len - i*w), 0) AS BIGINT) AS n_bytes,
               CAST(list_aggregate(list_transform(range(i*w + 1, least((i+1)*w, len) + 1),
                    j -> ascii(substr(text, CAST(j AS INT), 1))), 'sum') AS BIGINT) AS sum_bytes
        FROM f WHERE greatest(least(w, len - i*w), 0) > 0),
      lg AS (
        SELECT *, lag(n_bytes) OVER (PARTITION BY asset_id ORDER BY frame_idx) AS pn,
                  lag(sum_bytes) OVER (PARTITION BY asset_id ORDER BY frame_idx) AS ps
        FROM fs),
      b AS (
        SELECT *, CASE WHEN pn IS NULL THEN 1
            WHEN abs(sum_bytes*pn - ps*n_bytes) >= 2*n_bytes*pn THEN 1 ELSE 0 END AS boundary
        FROM lg),
      sh AS (
        SELECT *, CAST(SUM(boundary) OVER (PARTITION BY asset_id ORDER BY frame_idx) AS BIGINT) AS shot_id
        FROM b),
      kf AS (
        SELECT *, row_number() OVER (PARTITION BY asset_id, shot_id
                    ORDER BY sum_bytes DESC, frame_idx ASC) AS rn
        FROM sh)
      SELECT asset_id, shot_id,
             CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(MIN(frame_idx) AS INT) AS start_frame,
             CAST(MIN(CASE WHEN rn = 1 THEN frame_idx END) AS INT) AS keyframe_idx,
             CAST(MIN(CASE WHEN rn = 1 THEN sum_bytes END) AS BIGINT) AS keyframe_sum
      FROM kf
      GROUP BY asset_id, shot_id
      ORDER BY asset_id, shot_id"""))

  /** REAL-decoder end-to-end (m05): every asset carries a genuine
    * RIFF/WAVE 16-bit PCM container (synthesized with a junk odd-sized
    * LIST chunk between fmt and data), decoded by the pure-JVM
    * `MediaDecoder.Uncompressed` chunk walk — NOT the fake. The samples
    * are a pure function of (doc_id, i), so the oracle restates the window
    * stats from the formula; a header-offset, alignment, sign or
    * endianness bug in the decoder would change the decoded samples and
    * break the hash. This closes the loop m01–m04 could not: the decode
    * path itself is oracle-gated, not just the plumbing around it. */
  val m05WavDecodeWindows = GraftQuery(
    "m05_wav_decode_windows",
    (s, dir) => {
      import graft.multimodal.Multimodal
      Multimodal.audioWindows(
          Multimodal.wavAssetsFromDocuments(table(s, dir, "documents")),
          Multimodal.MediaDecoder.Uncompressed, windowSamples = 16)
        .toDF()
        .select(col("asset_id"), col("window_idx"), col("n_samples"),
          col("sum_amp"), col("peak_amp"))
        .orderBy(col("asset_id"), col("window_idx"))
    },
    Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, CAST(n_chars % 50 + 20 AS BIGINT) AS n
        FROM documents WHERE doc_id % 3 = 2),
      s AS (
        SELECT asset_id, i,
               ((asset_id * 31 + i * 7) % 65536) - 32768 AS samp
        FROM a, LATERAL unnest(range(0, n)) AS t(i))
      SELECT asset_id,
             CAST(i // 16 AS INT) AS window_idx,
             CAST(COUNT(*) AS INT) AS n_samples,
             CAST(SUM(samp) AS BIGINT) AS sum_amp,
             CAST(MAX(abs(samp)) AS INT) AS peak_amp
      FROM s
      GROUP BY asset_id, i // 16
      ORDER BY asset_id, window_idx"""))

  /** REAL BMP decode end-to-end (m06, image sibling of m05): genuine
    * bottom-up 24-bit BI_RGB containers with 4-byte row padding (width
    * deliberately off-multiple), decoded by the real chunk-parse +
    * BT.601 integer-luma path; channel bytes are pure functions of
    * (doc_id, row, col) so the oracle restates per-row luma stats from
    * the formula — a stride, row-flip, channel-order or luma-weight bug
    * breaks the hash. */
  val m06BmpDecodeRows = GraftQuery(
    "m06_bmp_decode_rows",
    (s, dir) => {
      import graft.multimodal.Multimodal
      Multimodal.imageRowStats(
          Multimodal.bmpAssetsFromDocuments(table(s, dir, "documents")),
          Multimodal.MediaDecoder.Uncompressed)
        .toDF()
        .select(col("asset_id"), col("row_idx"), col("sum_luma"),
          col("min_luma"), col("max_luma"))
        .orderBy(col("asset_id"), col("row_idx"))
    },
    Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, CAST(n_chars % 3 + 3 AS BIGINT) AS w
        FROM documents WHERE doc_id % 3 = 0),
      px AS (
        SELECT asset_id, r, c,
               (299 * ((asset_id + r*3 + c*7) % 256)
                + 587 * ((asset_id*5 + r*11 + c) % 256)
                + 114 * ((asset_id*7 + r + c*13) % 256)) // 1000 AS luma
        FROM a,
             LATERAL unnest(range(0, 4)) AS t1(r),
             LATERAL unnest(range(0, w)) AS t2(c))
      SELECT asset_id,
             CAST(r AS INT) AS row_idx,
             CAST(SUM(luma) AS BIGINT) AS sum_luma,
             CAST(MIN(luma) AS INT) AS min_luma,
             CAST(MAX(luma) AS INT) AS max_luma
      FROM px
      GROUP BY asset_id, r
      ORDER BY asset_id, row_idx"""))

  /** REAL-decode nearest-neighbor resize (m07): the BMP containers of m06
    * decoded by the real chunk-parse path, downsampled to a fixed 2×2 luma
    * grid — the thumbnail / training-patch shape. Target pixel (r,c)
    * samples source (r·H/2, c·W/2) (integer division), so the oracle
    * restates the resized grid directly from the synthesis formula; any
    * decode bug m06 would catch ALSO breaks this hash, and on top of it any
    * index-mapping bug in the resize itself. */
  val m07ResizeGrid = GraftQuery(
    "m07_resize_grid",
    (s, dir) => {
      import graft.multimodal.Multimodal
      Multimodal.imageResizeGrid(
          Multimodal.bmpAssetsFromDocuments(table(s, dir, "documents")),
          Multimodal.MediaDecoder.Uncompressed, newW = 2, newH = 2)
        .toDF()
        .select(col("asset_id"), col("row_idx"), col("col_idx"), col("luma"))
        .orderBy(col("asset_id"), col("row_idx"), col("col_idx"))
    },
    Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, CAST(n_chars % 3 + 3 AS BIGINT) AS w
        FROM documents WHERE doc_id % 3 = 0),
      g AS (
        SELECT asset_id, r, c, (r * 4) // 2 AS sr, (c * w) // 2 AS sc
        FROM a,
             LATERAL unnest(range(0, 2)) AS t1(r),
             LATERAL unnest(range(0, 2)) AS t2(c))
      SELECT asset_id,
             CAST(r AS INT) AS row_idx,
             CAST(c AS INT) AS col_idx,
             CAST((299 * ((asset_id + sr*3 + sc*7) % 256)
                  + 587 * ((asset_id*5 + sr*11 + sc) % 256)
                  + 114 * ((asset_id*7 + sr + sc*13) % 256)) // 1000 AS INT) AS luma
      FROM g
      ORDER BY asset_id, row_idx, col_idx"""))

  /** REAL PNG decode end-to-end (m08): genuine zlib-compressed PNG
    * containers produced by the JDK's own encoder, decoded by
    * `MediaDecoder.ImageIo` (`javax.imageio` — stock-JRE PNG reader, no
    * external codec). PNG is lossless, so the decoded lumas are the
    * synthesis formula EXACTLY and the oracle restates per-row stats the
    * same way m06 does for BMP — but here a real inflate + scanline-filter
    * reconstruction sits between the bytes and the pixels, so the gate
    * covers a true compressed-codec decode path, not a byte-layout walk. */
  val m08PngDecodeRows = GraftQuery(
    "m08_png_decode_rows",
    (s, dir) => {
      import graft.multimodal.Multimodal
      Multimodal.imageRowStats(
          Multimodal.pngAssetsFromDocuments(table(s, dir, "documents")),
          Multimodal.MediaDecoder.ImageIo)
        .toDF()
        .select(col("asset_id"), col("row_idx"), col("sum_luma"),
          col("min_luma"), col("max_luma"))
        .orderBy(col("asset_id"), col("row_idx"))
    },
    Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, CAST(n_chars % 5 + 3 AS BIGINT) AS w
        FROM documents WHERE doc_id % 3 = 1),
      px AS (
        SELECT asset_id, r, c,
               (299 * ((asset_id + r*3 + c*7) % 256)
                + 587 * ((asset_id*5 + r*11 + c) % 256)
                + 114 * ((asset_id*7 + r + c*13) % 256)) // 1000 AS luma
        FROM a,
             LATERAL unnest(range(0, 4)) AS t1(r),
             LATERAL unnest(range(0, w)) AS t2(c))
      SELECT asset_id,
             CAST(r AS INT) AS row_idx,
             CAST(SUM(luma) AS BIGINT) AS sum_luma,
             CAST(MIN(luma) AS INT) AS min_luma,
             CAST(MAX(luma) AS INT) AS max_luma
      FROM px
      GROUP BY asset_id, r
      ORDER BY asset_id, row_idx"""))

  /** REAL JPEG decode (m09): genuine DCT-quantized JPEG bitstreams decoded
    * by the stock-JRE `javax.imageio` reader. JPEG is lossy BY SPEC, so
    * exact pixel restatement is impossible for any engine; the gate is the
    * q34/q37 sketch pattern — dimensions and pixel count must be EXACT
    * (recovered from the decoded array, so a container-parse failure is a
    * hard mismatch) and the decoded luma sum must sit within ±8/pixel of
    * the synthesis formula's exact sum (DC coefficients survive default
    * quantization; a wrong-colorspace, wrong-subsampling or garbage decode
    * lands far outside). The oracle restates the dims from the synthesis
    * parameters and expects the tolerance verdict true. */
  val m09JpegDecodeCheck = GraftQuery(
    "m09_jpeg_decode_check",
    (s, dir) => {
      import graft.multimodal.Multimodal
      Multimodal.imageDecodeCheck(
          Multimodal.jpegAssetsFromDocuments(table(s, dir, "documents")),
          Multimodal.MediaDecoder.ImageIo,
          a => Multimodal.synthLumaSum(a.asset_id, a.meta.width, a.meta.height),
          tolPerPixel = 8)
        .toDF()
        .select(col("asset_id"), col("width"), col("height"),
          col("n_pixels"), col("mean_within_tol"))
        .orderBy(col("asset_id"))
    },
    Some("""
      SELECT doc_id AS asset_id,
             CAST(n_chars % 3 + 8 AS INT) AS width,
             8 AS height,
             CAST((n_chars % 3 + 8) * 8 AS BIGINT) AS n_pixels,
             TRUE AS mean_within_tol
      FROM documents WHERE doc_id % 3 = 2
      ORDER BY doc_id"""))

  /** REAL VIDEO decode (m10): genuine MJPEG-in-AVI containers — a RIFF
    * `AVI ` chunk tree (hdrl headers, an odd-sized JUNK alignment trap,
    * `movi` LIST) whose `00dc` chunks hold real DCT-quantized JPEG
    * bitstreams — walked and decoded per frame by the stock-JDK JPEG
    * reader. The gate is m09's lossy discipline lifted to the FRAME grain:
    * every frame's dimensions and pixel count must be exact (recovered
    * from the decoded arrays, so a container mis-walk, frame drop or
    * misordering is a hard row mismatch) and each frame's luma sum within
    * ±8/pixel of its per-frame synthesis formula. Only inter-frame codecs
    * (H.264) remain beyond a stock JVM. */
  val m10AviVideoDecodeCheck = GraftQuery(
    "m10_avi_video_decode_check",
    (s, dir) => {
      import graft.multimodal.Multimodal
      Multimodal.videoDecodeCheck(
          Multimodal.aviAssetsFromDocuments(table(s, dir, "documents")),
          (a, f) => Multimodal.synthLumaSum(
            Multimodal.frameSeed(a.asset_id, f), a.meta.width, a.meta.height),
          tolPerPixel = 8)
        .toDF()
        .select(col("asset_id"), col("frame_idx"), col("width"), col("height"),
          col("n_pixels"), col("mean_within_tol"))
        .orderBy(col("asset_id"), col("frame_idx"))
    },
    Some("""
      SELECT doc_id AS asset_id,
             CAST(f AS INT) AS frame_idx,
             CAST(n_chars % 3 + 8 AS INT) AS width,
             8 AS height,
             CAST((n_chars % 3 + 8) * 8 AS BIGINT) AS n_pixels,
             TRUE AS mean_within_tol
      FROM documents,
           LATERAL unnest(range(0, n_chars % 4 + 2)) AS t(f)
      WHERE doc_id % 3 = 0
      ORDER BY asset_id, frame_idx"""))

  /** Image-level near-dup detection via difference hash (m11): REAL BMP
    * decode → 8×8 nearest-neighbor luma grid → 56-bit dHash → 4×14-bit
    * LSH bands → bucket-join candidates → Hamming-verify (≤ 4). The
    * fixture plants duplicates by seeding pixels with `doc_id % 60`:
    * same-key same-width assets are exact dups (Hamming 0), same-key
    * different-width assets are true NEAR-dups (the resize shifts a few
    * neighbor comparisons), different keys are unrelated. Banding is the
    * d03/d04 discipline applied to images — candidates come from an
    * inverted index, never an all-pairs join — and the oracle replays
    * pixels, grid, bits, bands and Hamming from the synthesis formula. */
  val m11ImageDHashNearDup = GraftQuery(
    "m11_image_dhash_neardup",
    (s, dir) => {
      import graft.multimodal.Multimodal
      val hashes = Multimodal.imageDHash(
          Multimodal.bmpAssetsKeyed(table(s, dir, "documents")),
          Multimodal.MediaDecoder.Uncompressed).toDF()
      val bands = hashes.select(col("asset_id"), col("dhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("dhash"), 14 * b).bitwiseAND(lit(16383L))): _*))
          .as(Seq("band", "key")))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.asset_id") < col("y.asset_id"))
        .select(col("x.asset_id").as("asset_a"), col("y.asset_id").as("asset_b"),
          col("x.dhash").as("ha"), col("y.dhash").as("hb"))
        .distinct()
      cand.select(col("asset_a"), col("asset_b"),
          expr("bit_count(ha ^ hb)").cast("bigint").as("hamming"))
        .filter(col("hamming") <= 4)
        .orderBy(col("asset_a"), col("asset_b"))
    },
    Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, doc_id % 60 + 1 AS seed,
               CAST(16 + n_chars % 3 AS BIGINT) AS w
        FROM documents WHERE doc_id % 3 = 0),
      -- grid sample (gr, gc): physical pixel (gr*4//8, gc*w//8), whose
      -- channels read the VIRTUAL column vc = pc*8//w (synthBmpKeyed)
      bits AS (
        SELECT asset_id, gr * 7 + gc AS i,
          CASE WHEN
            (299 * ((seed * (1 + 3*(gr*16//8) + 7*(((gc*w//8)*8)//w))) % 256)
             + 587 * ((seed * (2 + 11*(gr*16//8) + (((gc*w//8)*8)//w))) % 256)
             + 114 * ((seed * (3 + (gr*16//8) + 13*(((gc*w//8)*8)//w))) % 256)) // 1000
            >
            (299 * ((seed * (1 + 3*(gr*16//8) + 7*((((gc+1)*w//8)*8)//w))) % 256)
             + 587 * ((seed * (2 + 11*(gr*16//8) + ((((gc+1)*w//8)*8)//w))) % 256)
             + 114 * ((seed * (3 + (gr*16//8) + 13*((((gc+1)*w//8)*8)//w))) % 256)) // 1000
          THEN (CAST(1 AS BIGINT) << CAST(gr * 7 + gc AS INT)) ELSE 0 END AS bitval
        FROM a,
             LATERAL unnest(range(0, 8)) t1(gr),
             LATERAL unnest(range(0, 7)) t2(gc)),
      h AS (
        SELECT asset_id, CAST(SUM(bitval) AS BIGINT) AS dhash
        FROM bits GROUP BY asset_id),
      bands AS (
        SELECT asset_id, dhash, b AS band,
               (dhash >> CAST(14 * b AS INT)) & 16383 AS key
        FROM h, LATERAL unnest(range(0, 4)) t(b)),
      cand AS (
        SELECT DISTINCT x.asset_id AS asset_a, y.asset_id AS asset_b,
               x.dhash AS ha, y.dhash AS hb
        FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
          AND x.asset_id < y.asset_id)
      SELECT asset_a, asset_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(ha, hb)) <= 4
      ORDER BY asset_a, asset_b"""))

  /** Audio-level near-dup detection via energy-contour hash (m12): REAL
    * RIFF/WAVE chunk walk → 32-bin mean-|amplitude| contour → 31-bit
    * adjacent-bin comparison hash → 2×16-bit LSH bands → bucket-join →
    * Hamming-verify (≤ 3). The keyed fixture plants exact duplicates
    * (same key + length) and TRUE near-duplicates (same key, 80–84
    * sample lengths: the length-normalized pattern shifts a few bin
    * boundaries). Measured at sf0.01: cross-key minimum Hamming 4, so
    * threshold 3 admits zero false pairs. The oracle replays samples,
    * bins, integer means, bits, bands and Hamming from the synthesis
    * formula. */
  val m12AudioContourNearDup = GraftQuery(
    "m12_audio_contour_neardup",
    (s, dir) => {
      import graft.multimodal.Multimodal
      val hashes = Multimodal.audioContourHash(
          Multimodal.wavAssetsKeyed(table(s, dir, "documents")),
          Multimodal.MediaDecoder.Uncompressed).toDF()
      val bands = hashes.select(col("asset_id"), col("chash"),
        posexplode(array(
          col("chash").bitwiseAND(lit(65535L)),
          shiftright(col("chash"), 16).bitwiseAND(lit(32767L))))
          .as(Seq("band", "key")))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.asset_id") < col("y.asset_id"))
        .select(col("x.asset_id").as("asset_a"), col("y.asset_id").as("asset_b"),
          col("x.chash").as("ha"), col("y.chash").as("hb"))
        .distinct()
      cand.select(col("asset_a"), col("asset_b"),
          expr("bit_count(ha ^ hb)").cast("bigint").as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy(col("asset_a"), col("asset_b"))
    },
    Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, doc_id % 60 + 1 AS seed,
               CAST(80 + n_chars % 5 AS BIGINT) AS n
        FROM documents WHERE doc_id % 3 = 2),
      s AS (
        SELECT asset_id, i * 32 // n AS bin,
               abs(((seed * 1103 * (1 + 7 * (i * 64 // n))) % 65536) - 32768) AS amp
        FROM a, LATERAL unnest(range(0, n)) t(i)),
      m AS (
        SELECT asset_id, bin, SUM(amp) // COUNT(*) AS mean
        FROM s GROUP BY asset_id, bin),
      b AS (
        SELECT l.asset_id,
               CASE WHEN l.mean > r.mean
                 THEN (CAST(1 AS BIGINT) << CAST(l.bin AS INT)) ELSE 0 END AS bitval
        FROM m l JOIN m r ON l.asset_id = r.asset_id AND r.bin = l.bin + 1),
      h AS (SELECT asset_id, CAST(SUM(bitval) AS BIGINT) AS chash FROM b GROUP BY asset_id),
      bands AS (
        SELECT asset_id, chash, 0 AS band, chash & 65535 AS key FROM h
        UNION ALL
        SELECT asset_id, chash, 1 AS band, (chash >> 16) & 32767 AS key FROM h),
      cand AS (
        SELECT DISTINCT x.asset_id AS asset_a, y.asset_id AS asset_b,
               x.chash AS ha, y.chash AS hb
        FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
          AND x.asset_id < y.asset_id)
      SELECT asset_a, asset_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(ha, hb)) <= 3
      ORDER BY asset_a, asset_b"""))

  /** VIDEO near-dup detection via keyframe dHash (m13): REAL MJPEG-in-AVI
    * container walk → stock-JDK JPEG decode of frame 0 → 56-bit dHash →
    * 4×14-bit LSH bands → bucket-join → Hamming-verify (≤ 4) — the m11
    * banding discipline lifted to video through the LOSSY decode path.
    * The keyed fixture derives width and every frame's pixel seed from
    * the content key but keeps per-doc frame-count jitter, so same-key
    * videos are the "same video, different cut" case: their keyframe JPEG
    * BYTES are identical, the (deterministic) decoder yields identical
    * pixels, and the pair's Hamming is EXACTLY 0 — which is what lets a
    * SQL oracle verify a lossy-codec pipeline value-for-value: it derives
    * the expected pair set structurally (same key, both in the
    * population) rather than replaying DCT arithmetic, and the engine
    * must recover exactly that set through the real decode with ZERO
    * false pairs (measured cross-key minimum Hamming over the full key
    * space is 6, so the ≤ 4 gate rejects every band-colliding non-dup —
    * verified green at all three SFs). */
  val m13VideoKeyframeNearDup = GraftQuery(
    "m13_video_keyframe_neardup",
    (s, dir) => {
      import graft.multimodal.Multimodal
      val hashes = Multimodal.videoKeyframeDHash(
          Multimodal.aviAssetsKeyed(table(s, dir, "documents"))).toDF()
      val bands = hashes.select(col("asset_id"), col("dhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("dhash"), 14 * b).bitwiseAND(lit(16383L))): _*))
          .as(Seq("band", "key")))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.asset_id") < col("y.asset_id"))
        .select(col("x.asset_id").as("asset_a"), col("y.asset_id").as("asset_b"),
          col("x.dhash").as("ha"), col("y.dhash").as("hb"))
        .distinct()
      cand.select(col("asset_a"), col("asset_b"),
          expr("bit_count(ha ^ hb)").cast("bigint").as("hamming"))
        .filter(col("hamming") <= 4)
        .orderBy(col("asset_a"), col("asset_b"))
    },
    Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, doc_id % 60 AS key
        FROM documents WHERE doc_id % 3 = 1)
      SELECT x.asset_id AS asset_a, y.asset_id AS asset_b,
             CAST(0 AS BIGINT) AS hamming
      FROM a x JOIN a y ON x.key = y.key AND x.asset_id < y.asset_id
      ORDER BY asset_a, asset_b"""))

  /** The [[graft.multimodal.Multimodal.dctBasis]] constants as a DuckDB
    * VALUES list — the integer cosine table interpolated into the m14
    * oracle so BOTH engines run the same pure-integer DCT (the JPEG
    * integer-transform trick applied to oracle determinism). */
  private lazy val phashDctValues: String =
    graft.multimodal.Multimodal.dctBasis(32, 8).zipWithIndex.flatMap {
      case (row, u) => row.zipWithIndex.map { case (tv, x) => s"($u,$x,$tv)" }
    }.mkString(",")

  /** Image near-dup detection via PERCEPTUAL hash (m14): REAL BMP decode →
    * nearest-neighbor 32×32 luma → integer 8×8 DCT-II block (fixed-point
    * cosine table) → 63-bit mean-rule hash → 4×15-bit LSH bands →
    * bucket-join → Hamming-verify (≤ 6). Same fixture and banding
    * discipline as m11, different estimator: dHash compares pointwise
    * neighbors and loses lossy RE-ENCODES (JPEG quantization flips bits
    * grid-wide — the planted MultimodalSpec pair pins it), while the
    * low-frequency DCT block is what lossy codecs preserve. The whole
    * hash is integer arithmetic, so the oracle replays pixels → resize →
    * DCT (interpolated constant table) → mean rule → bands value-exactly. */
  val m14ImagePHashNearDup = GraftQuery(
    "m14_image_phash_neardup",
    (s, dir) => {
      import graft.multimodal.Multimodal
      val hashes = Multimodal.imagePHash(
          Multimodal.bmpAssetsKeyed(table(s, dir, "documents")),
          Multimodal.MediaDecoder.Uncompressed).toDF()
        .select(col("asset_id"), col("dhash").as("phash"))
      val bands = hashes.select(col("asset_id"), col("phash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("phash"), 15 * b).bitwiseAND(lit(32767L))): _*))
          .as(Seq("band", "key")))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.asset_id") < col("y.asset_id"))
        .select(col("x.asset_id").as("asset_a"), col("y.asset_id").as("asset_b"),
          col("x.phash").as("ha"), col("y.phash").as("hb"))
        .distinct()
      cand.select(col("asset_a"), col("asset_b"),
          expr("bit_count(ha ^ hb)").cast("bigint").as("hamming"))
        .filter(col("hamming") <= 6)
        .orderBy(col("asset_a"), col("asset_b"))
    },
    Some(s"""
      WITH a AS (
        SELECT doc_id AS asset_id, doc_id % 60 + 1 AS seed,
               CAST(16 + n_chars % 3 AS BIGINT) AS w
        FROM documents WHERE doc_id % 3 = 0),
      t AS (
        SELECT u, x, CAST(tv AS BIGINT) AS tv
        FROM (VALUES $phashDctValues) v(u, x, tv)),
      -- 32x32 nearest-neighbor luma: physical pixel (r*16//32, c*w//32),
      -- whose channels read the virtual column vc = pc*8//w (synthBmpKeyed)
      luma AS (
        SELECT asset_id, r, c,
          (299 * ((seed * (1 + 3*(r//2) + 7*(((c*w//32)*8)//w))) % 256)
           + 587 * ((seed * (2 + 11*(r//2) + (((c*w//32)*8)//w))) % 256)
           + 114 * ((seed * (3 + (r//2) + 13*(((c*w//32)*8)//w))) % 256)) // 1000
            AS lum
        FROM a,
             LATERAL unnest(range(0, 32)) t1(r),
             LATERAL unnest(range(0, 32)) t2(c)),
      -- separable integer DCT: row pass then column pass
      rp AS (
        SELECT l.asset_id, l.r, t.u AS v, CAST(SUM(l.lum * t.tv) AS BIGINT) AS s
        FROM luma l JOIN t ON t.x = l.c
        GROUP BY l.asset_id, l.r, t.u),
      coef AS (
        SELECT rp.asset_id, t.u, rp.v, CAST(SUM(t.tv * rp.s) AS BIGINT) AS cv
        FROM rp JOIN t ON t.x = rp.r
        GROUP BY rp.asset_id, t.u, rp.v),
      ac AS (
        SELECT asset_id, u * 8 + v - 1 AS i, cv
        FROM coef WHERE u < 8 AND v < 8 AND NOT (u = 0 AND v = 0)),
      tot AS (SELECT asset_id, CAST(SUM(cv) AS BIGINT) AS total FROM ac GROUP BY asset_id),
      h AS (
        SELECT ac.asset_id,
               CAST(SUM(CASE WHEN ac.cv * 63 > tot.total
                 THEN (CAST(1 AS BIGINT) << CAST(ac.i AS INT)) ELSE 0 END) AS BIGINT)
                 AS phash
        FROM ac JOIN tot USING (asset_id) GROUP BY ac.asset_id),
      bands AS (
        SELECT asset_id, phash, b AS band,
               (phash >> CAST(15 * b AS INT)) & 32767 AS key
        FROM h, LATERAL unnest(range(0, 4)) t(b)),
      cand AS (
        SELECT DISTINCT x.asset_id AS asset_a, y.asset_id AS asset_b,
               x.phash AS ha, y.phash AS hb
        FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
          AND x.asset_id < y.asset_id)
      SELECT asset_a, asset_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(ha, hb)) <= 6
      ORDER BY asset_a, asset_b"""))

  /** The [[graft.multimodal.Multimodal.dctBasis]] AC rows (u = 1..31 over
    * 32 windows) as a DuckDB VALUES list — the m14 interpolation trick for
    * the m15 audio spectral hash. */
  private lazy val audioDctValues: String =
    graft.multimodal.Multimodal.dctBasis(32, 32).zipWithIndex.drop(1).flatMap {
      case (row, u) => row.zipWithIndex.map { case (tv, x) => s"($u,$x,$tv)" }
    }.mkString(",")

  /** Audio near-dup detection via SPECTRAL-BAND hash (m15): REAL RIFF/WAVE
    * chunk walk → 32-bin mean-|amplitude| energy contour → 1-D integer
    * DCT-II over the contour (fixed-point cosine table, AC coefficients
    * 1..31) → 31-bit mean-rule hash → 2×(16,15)-bit LSH bands →
    * bucket-join → Hamming-verify (≤ 3). Same fixture and banding
    * discipline as m12, different estimator: each spectral coefficient
    * aggregates every window, keying on the low-frequency envelope lossy
    * audio codecs preserve (the planted MultimodalSpec pins requantized
    * and scale-factor-jittered re-encodes inside the gate; see the honest
    * scope note on [[graft.multimodal.Multimodal.audioSpectralHash]] for
    * where each estimator wins). Measured cross-key minimum Hamming is 4 at all
    * three SFs (the hash is a pure function of (key, length) — the pair
    * structure is SF-invariant), so the ≤ 3 gate admits zero false pairs.
    * The whole hash is integer arithmetic; the oracle replays samples →
    * windows → integer means → DCT (interpolated constants) → mean rule →
    * bands → Hamming value-exactly. */
  val m15AudioSpectralNearDup = GraftQuery(
    "m15_audio_spectral_neardup",
    (s, dir) => {
      import graft.multimodal.Multimodal
      val hashes = Multimodal.audioSpectralHash(
          Multimodal.wavAssetsKeyed(table(s, dir, "documents")),
          Multimodal.MediaDecoder.Uncompressed).toDF()
        .select(col("asset_id"), col("chash").as("shash"))
      val bands = hashes.select(col("asset_id"), col("shash"),
        posexplode(array(
          col("shash").bitwiseAND(lit(65535L)),
          shiftright(col("shash"), 16).bitwiseAND(lit(32767L))))
          .as(Seq("band", "key")))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.asset_id") < col("y.asset_id"))
        .select(col("x.asset_id").as("asset_a"), col("y.asset_id").as("asset_b"),
          col("x.shash").as("ha"), col("y.shash").as("hb"))
        .distinct()
      cand.select(col("asset_a"), col("asset_b"),
          expr("bit_count(ha ^ hb)").cast("bigint").as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy(col("asset_a"), col("asset_b"))
    },
    Some(s"""
      WITH a AS (
        SELECT doc_id AS asset_id, doc_id % 60 + 1 AS seed,
               CAST(80 + n_chars % 5 AS BIGINT) AS n
        FROM documents WHERE doc_id % 3 = 2),
      s AS (
        SELECT asset_id, i * 32 // n AS bin,
               abs(((seed * 1103 * (1 + 7 * (i * 64 // n))) % 65536) - 32768) AS amp
        FROM a, LATERAL unnest(range(0, n)) t(i)),
      m AS (
        SELECT asset_id, bin, SUM(amp) // COUNT(*) AS mean
        FROM s GROUP BY asset_id, bin),
      t AS (SELECT u, x, CAST(tv AS BIGINT) AS tv
            FROM (VALUES $audioDctValues) v(u, x, tv)),
      coef AS (
        SELECT m.asset_id, t.u, CAST(SUM(m.mean * t.tv) AS BIGINT) AS cv
        FROM m JOIN t ON t.x = m.bin GROUP BY m.asset_id, t.u),
      tot AS (SELECT asset_id, CAST(SUM(cv) AS BIGINT) AS total FROM coef GROUP BY asset_id),
      h AS (
        SELECT coef.asset_id,
               CAST(SUM(CASE WHEN cv * 31 > total
                 THEN (CAST(1 AS BIGINT) << CAST(u - 1 AS INT)) ELSE 0 END) AS BIGINT)
                 AS shash
        FROM coef JOIN tot USING (asset_id) GROUP BY coef.asset_id),
      bands AS (
        SELECT asset_id, shash, 0 AS band, shash & 65535 AS key FROM h
        UNION ALL
        SELECT asset_id, shash, 1 AS band, (shash >> 16) & 32767 AS key FROM h),
      cand AS (
        SELECT DISTINCT x.asset_id AS asset_a, y.asset_id AS asset_b,
               x.shash AS ha, y.shash AS hb
        FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
          AND x.asset_id < y.asset_id)
      SELECT asset_a, asset_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(ha, hb)) <= 3
      ORDER BY asset_a, asset_b"""))

  val all: Seq[GraftQuery] = Seq(
    m01BinaryStats, m02FrameStats, m03AudioWindows, m04ShotKeyframes,
    m05WavDecodeWindows, m06BmpDecodeRows, m07ResizeGrid,
    m08PngDecodeRows, m09JpegDecodeCheck, m10AviVideoDecodeCheck,
    m11ImageDHashNearDup, m12AudioContourNearDup, m13VideoKeyframeNearDup,
    m14ImagePHashNearDup, m15AudioSpectralNearDup)
}
