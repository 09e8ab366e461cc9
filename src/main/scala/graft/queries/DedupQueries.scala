package graft.queries

import graft.Graft.table
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deduplication operator queries over `documents` / `embeddings` — exact,
  * n-gram Jaccard, MinHash signatures, MinHash-LSH banded candidates, SimHash,
  * and embedding-cosine near-dup.
  *
  * Every signature here uses the portable polynomial hash (`Dedup.polyHash`)
  * so the DuckDB oracle recomputes the *identical* integers — the hash-match
  * gate covers the whole MinHash/LSH pipeline, not just its shape. The
  * xxhash64 fast path in `Dedup` is the production hot path at 100 TB.
  */
object DedupQueries {

  /** Shared DuckDB fragments (kept in sync with Dedup.scala — same constants,
    * same fold, same window arithmetic). */
  private val duckCodes =
    "list_transform(range(1, length(text)+1), i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))"
  private[queries] def duckPoly(l: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $l), (acc, x) -> (acc*31 + x) % 1000000007)"
  private val duckShingleHashes =
    s"list_transform(range(1, greatest(length(text)-4, 1)+1), i -> ${duckPoly("codes[i:i+4]")})"
  // shared with CurationQueries (c09 decontamination restates the same
  // portable hash over its own — longer — window length)
  private[queries] val duckCodesSql = duckCodes
  private[queries] def duckShingleHashesN(n: Int): String =
    s"list_transform(range(1, greatest(length(text)-${n - 1}, 1)+1), i -> ${duckPoly(s"codes[i:i+${n - 1}]")})"

  /** Exact dedup: group by normalized-text fingerprint, keep min id.
    * One hash shuffle on the fingerprint — the canonical exact dedup. */
  val d01ExactDedup = GraftQuery(
    "d01_exact_dedup",
    (s, dir) =>
      Dedup.exactDedupGroups(table(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("fingerprint")),
    Some("""
      SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint,
             CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
             CAST(COUNT(*) AS BIGINT) AS dup_count
      FROM documents
      GROUP BY 1
      ORDER BY fingerprint"""),
    bench = true)

  /** Pairwise Jaccard ≥ 0.5 on distinct char-5-gram shingle hashes:
    * df-capped inverted-index candidates (shingles in > min(50% of docs,
    * 1000 docs) dropped BEFORE the self-join — the fractional term kills
    * relative hot keys, the absolute term bounds any key's fan-out at
    * df² ≤ 10⁶ independent of corpus size) + exact verification on the full
    * sets. The oracle restates the identical cap, so both engines compute
    * the same pair set with exact Jaccard values. */
  val d02JaccardPairs = GraftQuery(
    "d02_ngram_jaccard_pairs",
    (s, dir) =>
      Dedup.jaccardPairs(table(s, dir, "documents"), "doc_id", "text", 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH codes_t AS (
        SELECT doc_id, $duckCodes AS codes, text FROM documents),
      hs_t AS (
        SELECT doc_id, list_distinct($duckShingleHashes) AS hset FROM codes_t),
      sh AS (SELECT doc_id, unnest(hset) AS h FROM hs_t),
      rare AS (
        SELECT h FROM sh GROUP BY h
        HAVING COUNT(*) <= least((SELECT COUNT(*) FROM hs_t) * ${Dedup.DefaultMaxDocFreqFraction},
                                 ${Dedup.DefaultMaxDocFreqAbsolute}.0)),
      shc AS (SELECT sh.doc_id, sh.h FROM sh JOIN rare USING (h)),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id),
      ver AS (
        SELECT id_a, id_b,
               CAST(len(list_intersect(ha.hset, hb.hset)) AS DOUBLE) AS shared,
               len(ha.hset) AS na, len(hb.hset) AS nb
        FROM cand JOIN hs_t ha ON id_a = ha.doc_id JOIN hs_t hb ON id_b = hb.doc_id)
      SELECT id_a, id_b, round(shared / CAST(na + nb - shared AS DOUBLE), 6) AS jaccard
      FROM ver
      WHERE shared / CAST(na + nb - shared AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b"""))

  /** MinHash signatures (k=24, affine permutations of portable shingle
    * hashes) as 24 oracle-checked columns. Shingle sets are materialized
    * once behind the shuffle barrier, then each signature column is a cheap
    * affine min over the stored array (duplicate shingles cannot change a
    * min, so distinct-set signatures equal multiset signatures). */
  val d03MinhashSignatures = GraftQuery(
    "d03_minhash_signatures",
    (s, dir) => {
      val sig = Dedup.minhashSignature(col("hset"))
      Dedup.shingleSets(table(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id") +: (0 until Dedup.NumHashes)
          .map(j => element_at(sig, j + 1).as(s"sig_$j")): _*)
        .orderBy(col("doc_id"))
    },
    Some {
      val sigExprs = (0 until Dedup.NumHashes).map { j =>
        s"list_min(list_transform(hs, h -> (${Dedup.MinhashA(j)}*h + ${Dedup.MinhashB(j)}) % 1000000007)) AS sig_$j"
      }.mkString(",\n             ")
      s"""
      WITH codes_t AS (SELECT doc_id, $duckCodes AS codes, text FROM documents),
      hs_t AS (SELECT doc_id, list_distinct($duckShingleHashes) AS hs FROM codes_t)
      SELECT doc_id,
             $sigExprs
      FROM hs_t
      ORDER BY doc_id"""
    })

  /** The full MinHash-LSH near-dup pipeline as a reusable DuckDB CTE block,
    * PARAMETRIZED over the source relation and a CTE-name prefix (so one
    * SQL statement can run it over several doc sets — the c31 incremental-
    * curation oracle runs it over the standing corpus AND the batch).
    * Ends in `<p>lsh_pairs(id_a, id_b, jaccard)`; also defines
    * `<p>bands(doc_id, band_id, band_key)` and `<p>hs_t(doc_id, hset)` for
    * cross-corpus band probes. */
  private[queries] def duckLshPairCtesOver(src: String, p: String): String = {
    val sigList = (0 until Dedup.NumHashes).map { j =>
      s"list_min(list_transform(hset, h -> (${Dedup.MinhashA(j)}*h + ${Dedup.MinhashB(j)}) % 1000000007))"
    }.mkString("[", ", ", "]")
    // every CTE is MATERIALIZED: DuckDB inlines single-reference CTEs, and
    // the consumers reference bands/hs_t/lsh_pairs several times (closure
    // seed + step, cross-corpus probes) — re-inlining re-runs the whole
    // shingle→minhash pipeline per reference (measured 6.6× on c05 at
    // sf0.1; the c31 three-pipeline oracle was hours-slow from this)
    s"""${p}codes_t AS MATERIALIZED (SELECT doc_id, $duckCodes AS codes, text FROM $src),
      ${p}hs_t AS MATERIALIZED (SELECT doc_id, list_distinct($duckShingleHashes) AS hset FROM ${p}codes_t),
      ${p}sig_t AS MATERIALIZED (SELECT doc_id, hset, $sigList AS sig FROM ${p}hs_t),
      ${p}bands AS MATERIALIZED (
        SELECT doc_id,
               band_id,
               ${(1 to Dedup.RowsPerBand).foldLeft("CAST(0 AS BIGINT)") { (acc, r) =>
                  s"(($acc * 31 + sig[${Dedup.RowsPerBand}*band_id + $r]) % 1000000007)"
                }} AS band_key
        FROM ${p}sig_t CROSS JOIN (SELECT unnest([${(0 until Dedup.Bands).mkString(", ")}]) AS band_id) ${p}bb),
      ${p}cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ${p}bands a JOIN ${p}bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
      ${p}ver AS MATERIALIZED (
        SELECT id_a, id_b,
               CAST(len(list_intersect(ha.hset, hb.hset)) AS DOUBLE) AS shared,
               len(ha.hset) AS na, len(hb.hset) AS nb
        FROM ${p}cand JOIN ${p}hs_t ha ON id_a = ha.doc_id JOIN ${p}hs_t hb ON id_b = hb.doc_id),
      ${p}lsh_pairs AS MATERIALIZED (
        SELECT id_a, id_b, shared / CAST(na + nb - shared AS DOUBLE) AS jaccard
        FROM ${p}ver
        WHERE shared / CAST(na + nb - shared AS DOUBLE) >= 0.5)"""
  }

  /** The d04/c05/c06 instance over the whole `documents` table. */
  private[queries] val duckLshPairCtes: String = duckLshPairCtesOver("documents", "")

  /** MinHash-LSH near-dup pairs: band bucket join (6 bands × 4 rows, LSH
    * threshold ≈ 0.64 — see Dedup.scala for why r=4 on this corpus) →
    * distinct candidates → exact Jaccard verify ≥ 0.5. The full scale path:
    * shuffles only on band keys, never all-pairs. */
  val d04LshNearDup = GraftQuery(
    "d04_minhash_lsh_pairs",
    (s, dir) =>
      Dedup.lshNearDupPairs(table(s, dir, "documents"), "doc_id", "text", 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH $duckLshPairCtes
      SELECT id_a, id_b, round(jaccard, 6) AS jaccard
      FROM lsh_pairs
      ORDER BY id_a, id_b"""),
    bench = true)

  /** 32-bit SimHash over term-frequency-weighted token hashes. Near-identical
    * docs land within small Hamming distance; per-row map, no shuffle. The
    * fused native expression computes token hash + all 32 bit counters in one
    * codegen pass (the HOF spelling is 32 interpreted folds per row — kept as
    * the parity-tested specification in Dedup.simhash32Hof). */
  val d05Simhash = GraftQuery(
    "d05_simhash",
    (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          Dedup.simhashFromTokens(TextAnalysis.tokens(col("text"))).as("simhash"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
        FROM documents),
      th_t AS (
        SELECT doc_id,
               list_transform(t, tok -> ${duckPoly(
                 "list_transform(range(1, length(tok)+1), i -> CAST(ascii(substr(tok, CAST(i AS INT), 1)) AS BIGINT))")}) AS th
        FROM toks)
      SELECT doc_id,
             CAST(COALESCE(list_sum(list_transform(range(0, 32), j ->
               CASE WHEN list_sum(list_transform(th, h -> ((h >> CAST(j AS INT)) & 1)*2 - 1)) > 0
                    THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END)), 0) AS BIGINT) AS simhash
      FROM th_t
      ORDER BY doc_id"""))

  /** Asymmetric containment dedup (containment of the smaller shingle set
    * in the larger ≥ 0.6): catches quoted/partially-copied text whose
    * symmetric Jaccard stays low. Same df-capped candidates as d02 but NO
    * size-ratio prune — lopsided pairs are the signal. */
  val d07ContainmentPairs = GraftQuery(
    "d07_containment_pairs",
    (s, dir) =>
      Dedup.containmentPairs(table(s, dir, "documents"), "doc_id", "text", 0.6)
        .select(col("contained_id"), col("container_id"),
          round(col("containment"), 6).as("containment"))
        .orderBy(col("contained_id"), col("container_id")),
    Some(s"""
      WITH codes_t AS (
        SELECT doc_id, $duckCodes AS codes, text FROM documents),
      hs_t AS (
        SELECT doc_id, list_distinct($duckShingleHashes) AS hset FROM codes_t),
      sh AS (SELECT doc_id, unnest(hset) AS h FROM hs_t),
      rare AS (
        SELECT h FROM sh GROUP BY h
        HAVING COUNT(*) <= least((SELECT COUNT(*) FROM hs_t) * ${Dedup.DefaultMaxDocFreqFraction},
                                 ${Dedup.DefaultMaxDocFreqAbsolute}.0)),
      shc AS (SELECT sh.doc_id, sh.h FROM sh JOIN rare USING (h)),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id),
      ver AS (
        SELECT id_a, id_b,
               CAST(len(list_intersect(ha.hset, hb.hset)) AS DOUBLE) AS shared,
               len(ha.hset) AS na, len(hb.hset) AS nb
        FROM cand JOIN hs_t ha ON id_a = ha.doc_id JOIN hs_t hb ON id_b = hb.doc_id),
      scored AS (
        SELECT CASE WHEN na <= nb THEN id_a ELSE id_b END AS contained_id,
               CASE WHEN na <= nb THEN id_b ELSE id_a END AS container_id,
               shared / CAST(least(na, nb) AS DOUBLE) AS containment
        FROM ver)
      SELECT contained_id, container_id, round(containment, 6) AS containment
      FROM scored
      WHERE containment >= 0.6
      ORDER BY contained_id, container_id"""))

  /** Embedding-cosine near-dup pairs (cos ≥ 0.4) — brute-force double-math
    * fold, deterministic across engines. Scale path is the bucketed ANN in
    * SimilarityQueries; this is the exact verifier. */
  val d06EmbeddingNearDup = GraftQuery(
    "d06_embedding_neardup",
    (s, dir) => {
      // Norms are staged per-row BEFORE the pair join (n evals, not n²/2) —
      // the join exchange materializes them, so only the (native codegen'd)
      // dot product runs per pair.
      import graft.operators.Similarity
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), Similarity.l2Norm(col("embedding")).as("norm"))
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("norm").as("norm_a"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("norm").as("norm_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cosine",
          Similarity.dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")))
        .filter(col("cosine") >= 0.4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_aggregate(list_transform(range(1, len(a.embedding)+1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum') AS dot,
               list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS na,
               list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS nb
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      SELECT id_a, id_b, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cosine
      FROM p
      WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.4
      ORDER BY id_a, id_b"""))

  /** Cross-corpus (incremental) LSH near-dup: the src1 slice is "today's
    * batch", everything else the standing corpus — which existing documents
    * does the new data duplicate? A band-key equi-join of batch against
    * corpus: |batch| band probes, never a corpus self-join; at rest the
    * corpus band postings are a bucketed table so the daily run shuffles
    * only the batch. Same verify kernel as d04. */
  val d10CrossCorpusLsh = GraftQuery(
    "d10_cross_corpus_lsh",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      Dedup.lshNearDupPairsAcross(
          docs.filter(col("source") === "src1"),
          docs.filter(col("source") =!= "src1"), "doc_id", "text", 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val sigList = (0 until Dedup.NumHashes).map { j =>
        s"list_min(list_transform(hset, h -> (${Dedup.MinhashA(j)}*h + ${Dedup.MinhashB(j)}) % 1000000007))"
      }.mkString("[", ", ", "]")
      s"""
      WITH codes_t AS (SELECT doc_id, source, $duckCodes AS codes, text FROM documents),
      hs_t AS (SELECT doc_id, source, list_distinct($duckShingleHashes) AS hset FROM codes_t),
      sig_t AS (SELECT doc_id, source, hset, $sigList AS sig FROM hs_t),
      bands AS (
        SELECT doc_id, source, band_id,
               ${(1 to Dedup.RowsPerBand).foldLeft("CAST(0 AS BIGINT)") { (acc, r) =>
                  s"(($acc * 31 + sig[${Dedup.RowsPerBand}*band_id + $r]) % 1000000007)"
                }} AS band_key
        FROM sig_t CROSS JOIN (SELECT unnest([${(0 until Dedup.Bands).mkString(", ")}]) AS band_id) bb),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
        WHERE a.source = 'src1' AND b.source <> 'src1'),
      ver AS (
        SELECT id_a, id_b,
               CAST(len(list_intersect(ha.hset, hb.hset)) AS DOUBLE) AS shared,
               len(ha.hset) AS na, len(hb.hset) AS nb
        FROM cand JOIN hs_t ha ON id_a = ha.doc_id JOIN hs_t hb ON id_b = hb.doc_id)
      SELECT id_a, id_b, round(shared / CAST(na + nb - shared AS DOUBLE), 6) AS jaccard
      FROM ver
      WHERE shared / CAST(na + nb - shared AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b"""
    })

  /** Content-defined chunking near-dup (Rabin/gear CDC family): chunk
    * boundaries anchor to content via the rolling 16-byte hash (cut where
    * h ≡ 0 mod 64, mean chunk ≈ 64 bytes), so locally-edited/prepended
    * copies keep most chunks — the shift-robust dedup for binary payloads
    * where fixed windows keep none. df-capped inverted index + exact
    * verify, like d02. */
  val d11CdcNearDup = GraftQuery(
    "d11_cdc_neardup",
    (s, dir) =>
      Dedup.cdcNearDupPairs(table(s, dir, "documents"), "doc_id", "text", 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH codes_t AS (
        SELECT doc_id, $duckCodes AS codes, text, length(text) AS len FROM documents),
      hs_t AS (
        SELECT doc_id, text, len,
               list_transform(range(1, greatest(len-15, 1)+1),
                 i -> ${duckPoly("codes[i:i+15]")}) AS hs
        FROM codes_t),
      cuts_t AS (
        SELECT doc_id, text, len,
               CASE WHEN len(hs) >= 2
                    THEN list_filter(range(2, len(hs)+1), i -> hs[i] % 64 = 0)
                    ELSE [] END AS cuts
        FROM hs_t),
      bounds_t AS (
        SELECT doc_id, text,
               ([CAST(1 AS BIGINT)] || cuts || [CAST(len+1 AS BIGINT)]) AS bounds
        FROM cuts_t),
      ch_t AS (
        SELECT doc_id,
               list_sort(list_distinct(list_transform(range(1, len(bounds)),
                 k -> ${duckPoly(
                   "list_transform(range(1, length(substr(text, CAST(bounds[k] AS INT), CAST(bounds[k+1]-bounds[k] AS INT)))+1), " +
                   "j -> CAST(ascii(substr(substr(text, CAST(bounds[k] AS INT), CAST(bounds[k+1]-bounds[k] AS INT)), CAST(j AS INT), 1)) AS BIGINT))")}))) AS hset
        FROM bounds_t),
      sh AS (SELECT doc_id, unnest(hset) AS h FROM ch_t),
      rare AS (
        SELECT h FROM sh GROUP BY h
        HAVING COUNT(*) <= least((SELECT COUNT(*) FROM ch_t) * 1.0, 1000.0)),
      shc AS (SELECT sh.doc_id, sh.h FROM sh JOIN rare USING (h)),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id),
      ver AS (
        SELECT id_a, id_b,
               CAST(len(list_intersect(ha.hset, hb.hset)) AS DOUBLE) AS shared,
               len(ha.hset) AS na, len(hb.hset) AS nb
        FROM cand JOIN ch_t ha ON id_a = ha.doc_id JOIN ch_t hb ON id_b = hb.doc_id)
      SELECT id_a, id_b, round(shared / CAST(na + nb - shared AS DOUBLE), 6) AS jaccard
      FROM ver
      WHERE shared / CAST(na + nb - shared AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b"""))

  /** Maximal duplicated token spans (exact-substring dedup family): 8-token
    * gram inverted index (df ≤ 1000), anti-diagonal islands merge, spans of
    * ≥ 12 tokens. Localizes verbatim runs so a pipeline can cut the passage
    * instead of dropping the document. */
  val d09DuplicateSpans = GraftQuery(
    "d09_duplicate_spans",
    (s, dir) =>
      Dedup.duplicateSpans(table(s, dir, "documents"), "doc_id", "text",
          k = 8, minSpanTokens = 12, maxGramFreq = 1000L)
        .orderBy(col("doc_a"), col("doc_b"), col("start_a"), col("start_b")),
    Some("""
      WITH toks_t AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
        FROM documents),
      grams AS (
        SELECT doc_id, CAST(i AS INT) AS pos,
               md5(array_to_string(toks[CAST(i AS INT):CAST(i+7 AS INT)], ' ')) AS g
        FROM toks_t, unnest(range(1, greatest(len(toks)-7, 0)+1)) AS t(i)
        WHERE len(toks) >= 8),
      rare AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= 1000),
      gr AS (SELECT grams.* FROM grams JOIN rare USING (g)),
      mt AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
        FROM gr a JOIN gr b ON a.g = b.g AND a.doc_id < b.doc_id),
      isl AS (
        SELECT *, pos_a - pos_b AS diag,
               pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b
                 ORDER BY pos_a) AS grp
        FROM mt),
      spans AS (
        SELECT doc_a, doc_b, MIN(pos_a) AS start_a, MIN(pos_b) AS start_b,
               CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
        FROM isl GROUP BY doc_a, doc_b, diag, grp)
      SELECT doc_a, doc_b, CAST(start_a AS INT) AS start_a, CAST(start_b AS INT) AS start_b,
             span_tokens
      FROM spans WHERE span_tokens >= 12
      ORDER BY doc_a, doc_b, start_a, start_b"""))

  /** Within-document block dedup (d12): non-overlapping 16-token blocks,
    * first occurrence kept, text rebuilt in order — the intra-doc
    * repetition CLEANER (t07 only detects). Both shuffles carry the doc id
    * in their key, so the operator scales with documents. On this random
    * corpus no block repeats (n_dropped = 0 everywhere) — the oracle
    * checks the full rebuild; the planted-repeat behavior is spec-pinned. */
  val d12IntradocDedup = GraftQuery(
    "d12_intradoc_dedup",
    (s, dir) =>
      graft.operators.TextAnalysis.dedupBlocksWithinDoc(
          table(s, dir, "documents"), "doc_id", "text", blockTokens = 16)
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS t
        FROM documents),
      ch AS (
        SELECT doc_id, t,
               greatest(1, CAST(ceil((len(t) - 16) / 16.0) AS BIGINT) + 1) AS nch
        FROM toks),
      blocks AS (
        SELECT doc_id,
               unnest(range(0, nch)) AS chunk_idx,
               unnest(list_transform(range(0, nch),
                 i -> array_to_string(list_slice(t, CAST(i*16+1 AS INT), CAST(i*16+16 AS INT)), ' '))) AS chunk_text
        FROM ch),
      occ AS (
        SELECT doc_id, chunk_idx, chunk_text,
               row_number() OVER (PARTITION BY doc_id, chunk_text
                 ORDER BY chunk_idx) AS occ
        FROM blocks)
      SELECT doc_id,
             COALESCE(string_agg(CASE WHEN occ = 1 THEN chunk_text END, ' ' ORDER BY chunk_idx), '') AS text_deduped,
             CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
      FROM occ
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** CROSS-document block dedup (d13): the corpus-level sibling of d12 —
    * only the globally FIRST occurrence (by doc, position) of each distinct
    * block survives, documents rebuilt from survivors. 4-token blocks: the
    * synthetic corpus draws from a ~45-word vocabulary, so 4-grams collide
    * across documents for real (a 16-token block never would here); a
    * production run uses 32–64-token blocks over web text. The
    * first-occurrence window keys on block CONTENT — one hash shuffle, d01's
    * shape at block granularity; hot boilerplate blocks get the d02/d09
    * df-cap treatment before the window. */
  val d13CrossdocDedup = GraftQuery(
    "d13_crossdoc_dedup",
    (s, dir) =>
      graft.operators.TextAnalysis.dedupBlocksAcrossDocs(
          table(s, dir, "documents"), "doc_id", "text", blockTokens = 4)
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS t
        FROM documents),
      ch AS (
        SELECT doc_id, t,
               greatest(1, CAST(ceil((len(t) - 4) / 4.0) AS BIGINT) + 1) AS nch
        FROM toks),
      blocks AS (
        SELECT doc_id,
               unnest(range(0, nch)) AS chunk_idx,
               unnest(list_transform(range(0, nch),
                 i -> array_to_string(list_slice(t, CAST(i*4+1 AS INT), CAST(i*4+4 AS INT)), ' '))) AS chunk_text
        FROM ch),
      occ AS (
        SELECT doc_id, chunk_idx, chunk_text,
               row_number() OVER (PARTITION BY chunk_text
                 ORDER BY doc_id, chunk_idx) AS occ
        FROM blocks)
      SELECT doc_id,
             COALESCE(string_agg(CASE WHEN occ = 1 THEN chunk_text END, ' ' ORDER BY chunk_idx), '') AS text_deduped,
             CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
      FROM occ
      GROUP BY doc_id
      ORDER BY doc_id"""),
    bench = true)

  /** Exact set-similarity self-join with prefix filtering
    * ([[Dedup.prefixFilterPairs]], AllPairs/PPJoin): every Jaccard ≥ 0.8
    * pair over the d02 shingle-hash sets, found WITHOUT a df cap (lossless)
    * and without an all-pairs product — each doc joins only on its
    * `sz − ⌈0.8·sz⌉ + 1` globally-rarest shingles. Integer threshold
    * arithmetic (100·inter ≥ 80·union) makes every emitted row
    * engine-exact. */
  val d14PrefixJaccard = GraftQuery(
    "d14_prefix_jaccard_pairs",
    (s, dir) =>
      Dedup.prefixFilterPairs(table(s, dir, "documents"), "doc_id", "text", tauPct = 80)
        .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH codes_t AS (SELECT doc_id, $duckCodes AS codes, text FROM documents),
      hs_t AS (SELECT doc_id, list_sort(list_distinct($duckShingleHashes)) AS hset FROM codes_t),
      sh AS (SELECT doc_id, unnest(hset) AS h FROM hs_t),
      dft AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h),
      ranked AS (
        SELECT s.doc_id, s.h,
               row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.h) AS rn,
               COUNT(*) OVER (PARTITION BY s.doc_id) AS sz
        FROM sh s JOIN dft d USING (h)),
      prefix AS (SELECT * FROM ranked WHERE rn <= sz - ((80*sz + 99) // 100) + 1),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM prefix a JOIN prefix b ON a.h = b.h AND a.doc_id < b.doc_id
        WHERE 100*least(a.sz, b.sz) >= 80*greatest(a.sz, b.sz)),
      ver AS (
        SELECT id_a, id_b,
               CAST(len(list_intersect(ha.hset, hb.hset)) AS BIGINT) AS inter_size,
               CAST(len(ha.hset) + len(hb.hset) - len(list_intersect(ha.hset, hb.hset)) AS BIGINT) AS union_size
        FROM cand JOIN hs_t ha ON id_a = ha.doc_id JOIN hs_t hb ON id_b = hb.doc_id)
      SELECT id_a, id_b, inter_size, union_size
      FROM ver WHERE 100*inter_size >= 80*union_size
      ORDER BY id_a, id_b"""))

  /** MOSS-architecture near-dup pairs ([[Dedup.winnowPairs]]): CANDIDATES
    * from the df-capped inverted index over winnowed window minima (~22%
    * of the shingle volume), exact verify on FULL shingle sets — every
    * emitted Jaccard equals d02's value for the same pair; winnow-set
    * Jaccard itself is not rankable on this corpus (0.7 background — see
    * the operator scaladoc + BASELINE). */
  val d15WinnowPairs = GraftQuery(
    "d15_winnow_pairs",
    (s, dir) =>
      Dedup.winnowPairs(table(s, dir, "documents"), "doc_id", "text", 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH codes_t AS (SELECT doc_id, $duckCodes AS codes, text FROM documents),
      raw_t AS (SELECT doc_id, $duckShingleHashes AS hs FROM codes_t),
      full_t AS (SELECT doc_id, list_distinct(hs) AS hset FROM raw_t),
      win_t AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(hs) - 7, 1) + 1),
                 i -> list_aggregate(hs[i:i+7], 'min'))) AS wset
        FROM raw_t),
      sh AS (SELECT doc_id, unnest(wset) AS h FROM win_t),
      rare AS (
        SELECT h FROM sh GROUP BY h
        HAVING COUNT(*) <= least((SELECT COUNT(*) FROM win_t) * ${Dedup.DefaultMaxDocFreqFraction},
                                 ${Dedup.DefaultMaxDocFreqAbsolute}.0)),
      shc AS (SELECT sh.doc_id, sh.h FROM sh JOIN rare USING (h)),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id),
      ver AS (
        SELECT id_a, id_b,
               CAST(len(list_intersect(ha.hset, hb.hset)) AS DOUBLE) AS shared,
               len(ha.hset) AS na, len(hb.hset) AS nb
        FROM cand JOIN full_t ha ON id_a = ha.doc_id JOIN full_t hb ON id_b = hb.doc_id)
      SELECT id_a, id_b, round(shared / CAST(na + nb - shared AS DOUBLE), 6) AS jaccard
      FROM ver
      WHERE shared / CAST(na + nb - shared AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b"""))

  val all: Seq[GraftQuery] = Seq(
    d01ExactDedup, d02JaccardPairs, d03MinhashSignatures,
    d04LshNearDup, d05Simhash, d06EmbeddingNearDup, d07ContainmentPairs,
    d09DuplicateSpans, d10CrossCorpusLsh, d11CdcNearDup, d12IntradocDedup,
    d13CrossdocDedup, d14PrefixJaccard, d15WinnowPairs)
}
