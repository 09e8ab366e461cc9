package graft.queries

import graft.Graft.table
import graft.operators.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Dataset-curation operator queries over `documents` — the
  * subset-selection surface a large-scale training-data pipeline needs on
  * top of dedup/quality: deterministic sampling, stratified sampling,
  * weighted source mixing, token-budget sequence packing, and near-dup
  * cluster resolution.
  *
  * Sampling determinism: every selection is a pure function of md5(doc_id)
  * (see Curation.scala) — partition-layout-independent, so the DuckDB
  * oracle selects the byte-identical subset and the gate is hash-match,
  * not statistical.
  */
object CurationQueries {

  /** Deterministic ~12.5% Bernoulli sample by content-stable hash. The
    * filter is per-row with no shuffle; at 100 TB this is a scan-side
    * subset, the cheapest possible sampler. */
  val c01HashSample = GraftQuery(
    "c01_hash_sample",
    (s, dir) =>
      Curation.hashSample(table(s, dir, "documents"), "doc_id", 0.125)
        .select(col("doc_id"), col("lang"), col("source"),
          substring(Curation.hashKey(col("doc_id")), 1, 3).as("bucket"))
        .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id, lang, source, substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) AS bucket
      FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '${Curation.rateThreshold(0.125)}'
      ORDER BY doc_id"""))

  /** Stratified sample: deterministic top-5 per language by hash order.
    * One hash shuffle on the stratum; output is bounded at n per stratum
    * regardless of skew. */
  val c02StratifiedSample = GraftQuery(
    "c02_stratified_sample",
    (s, dir) =>
      Curation.stratifiedSample(table(s, dir, "documents"), "lang", "doc_id", 5)
        .select(col("lang"), col("sample_rank").cast("bigint").as("sample_rank"), col("doc_id"))
        .orderBy(col("lang"), col("sample_rank")),
    Some("""
      WITH ranked AS (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
        FROM documents)
      SELECT lang, CAST(sample_rank AS BIGINT) AS sample_rank, doc_id
      FROM ranked
      WHERE sample_rank <= 5
      ORDER BY lang, sample_rank"""))

  /** Language weights for the c03 mix — the knob a data-mixing recipe
    * turns. Rates are quantized to 3 hex digits (1/4096) by
    * [[Curation.rateThreshold]]; the oracle embeds the same thresholds. */
  val MixWeights: Seq[(String, Double)] = Seq(
    "en" -> 1.0, "de" -> 0.75, "es" -> 0.5, "fr" -> 0.5, "zh" -> 0.25)

  /** Weighted source mixing: per-language acceptance rates via the
    * hash-prefix rule, reported as kept docs + kept tokens per language.
    * The weights dim broadcasts (S4 inline-VALUES pattern); the filter is
    * per-row; the final rollup is one partial-aggregating shuffle on a
    * 5-value key. */
  val c03WeightedMix = GraftQuery(
    "c03_weighted_mix",
    (s, dir) =>
      Curation.weightedMix(table(s, dir, "documents"), "lang", "doc_id", MixWeights)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("bigint")).as("kept_tokens"))
        .orderBy(col("lang")),
    Some {
      val dim = MixWeights
        .map { case (l, r) => s"('$l', '${Curation.rateThreshold(r)}')" }
        .mkString(", ")
      s"""
      WITH weights(lang, accept_below) AS (VALUES $dim)
      SELECT d.lang,
             CAST(COUNT(*) AS BIGINT) AS kept_docs,
             CAST(SUM(len(list_filter(string_split_regex(d.text, '\\s+'), t -> t <> ''))) AS BIGINT) AS kept_tokens
      FROM documents d JOIN weights w ON d.lang = w.lang
      WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 3) < w.accept_below
      GROUP BY d.lang
      ORDER BY d.lang"""
    })

  /** Token-budget sequence packing (budget 512, 8 shards): greedy running
    * total within a shard, cut at the budget line; reported per-bin. The
    * window partitions by shard so packing parallelizes — raising the shard
    * count is the scale lever (one global ordered window would serialize
    * the corpus through a single partition). Shards come from the md5 key
    * (first 8 hex digits as a 32-bit value, mod 8 — always nonnegative), so
    * the assignment is identical in any engine and for any key type. */
  val c04PackSequences = GraftQuery(
    "c04_pack_sequences",
    (s, dir) =>
      Curation.packSequences(table(s, dir, "documents"), "doc_id",
          TextAnalysis.tokenCount(col("text")).cast("bigint"), budget = 512, shards = 8)
        .groupBy(col("shard").cast("bigint").as("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_tokens")).as("bin_tokens"))
        .withColumn("fill_ratio", round(col("bin_tokens").cast("double") / 512.0, 6))
        .orderBy(col("shard"), col("bin")),
    Some("""
      WITH sized AS (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
               CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS BIGINT) AS doc_tokens
        FROM documents),
      packed AS (
        SELECT shard, doc_tokens,
               SUM(doc_tokens) OVER (PARTITION BY shard
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        FROM sized)
      SELECT CAST(shard AS BIGINT) AS shard,
             CAST(floor((running - doc_tokens) / 512.0) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(doc_tokens) AS BIGINT) AS bin_tokens,
             round(CAST(SUM(doc_tokens) AS DOUBLE) / 512.0, 6) AS fill_ratio
      FROM packed
      GROUP BY shard, floor((running - doc_tokens) / 512.0)
      ORDER BY shard, bin"""))

  /** Near-dup cluster resolution: connected components over the d04
    * MinHash-LSH pair graph (min-label propagation), with the canonical
    * keeper (cluster_id = min member) and cluster size — the step that
    * turns pairwise near-dup evidence into a drop list. The oracle
    * restates the identical pair pipeline (shared CTE block with d04) and
    * closes it transitively with a recursive CTE. */
  val c05NearDupClusters = GraftQuery(
    "c05_neardup_clusters",
    (s, dir) => {
      val pairs = Dedup.lshNearDupPairs(table(s, dir, "documents"), "doc_id", "text", 0.5)
      val labels = Curation.connectedComponents(pairs)
      val sizes = labels.groupBy(col("cluster_id").as("cid"))
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, labels("cluster_id") === sizes("cid"))
        .select(col("cluster_id"), col("member_id"), col("cluster_size"))
        .orderBy(col("cluster_id"), col("member_id"))
    },
    Some(s"""
      WITH RECURSIVE ${DedupQueries.duckLshPairCtes},
      edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM lsh_pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM lsh_pairs),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      labels AS (
        SELECT src AS member_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
      SELECT cluster_id, member_id,
             CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
      FROM labels
      ORDER BY cluster_id, member_id"""))

  /** The flagship composition: the full curation funnel a training-data
    * pipeline runs, as one query — raw corpus → exact dedup (fingerprint
    * keepers) → near-dup cluster drop (LSH pairs → connected components,
    * non-canonical members removed) → repetition quality gate (t07
    * thresholds) → weighted language mix — reporting per-stage document and
    * token attrition. Every stage reuses the independently-oracle-checked
    * operator; the oracle restates the whole funnel (shared d04 CTEs +
    * recursive closure + quality metrics + mix thresholds), so the gate
    * covers the composition, not just the parts.
    *
    * Scale shape: stages 1/3/4 are one bounded shuffle or pure per-row
    * filters over the corpus; stage 2's graph work runs on the near-dup
    * PAIR set (docs with at least one near-dup), never the corpus. */
  val c06CurationFunnel = GraftQuery(
    "c06_curation_funnel",
    (s, dir) =>
      Curation.funnelStats(
        Curation.curationFunnel(table(s, dir, "documents"), MixWeights,
          minJaccard = 0.5, minDistinctFrac = 0.35, maxTopBigramFrac = 0.12))
        .orderBy(col("stage_idx")),
    Some {
      val dim = MixWeights
        .map { case (l, r) => s"('$l', '${Curation.rateThreshold(r)}')" }
        .mkString(", ")
      s"""
      WITH RECURSIVE ${DedupQueries.duckLshPairCtes},
      edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM lsh_pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM lsh_pairs),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      labels AS (
        SELECT src AS member_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
      ntok AS (
        SELECT doc_id, lang, text,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
        FROM documents),
      keepers AS (
        SELECT MIN(doc_id) AS doc_id
        FROM documents
        GROUP BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))),
      s1 AS (SELECT n.* FROM ntok n JOIN keepers USING (doc_id)),
      s2 AS (
        SELECT * FROM s1
        WHERE doc_id NOT IN
          (SELECT member_id FROM labels WHERE member_id <> cluster_id)),
      s3 AS (
        SELECT * FROM s2
        WHERE round(CASE WHEN len(t) = 0 THEN 1.0
                ELSE CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) END, 6) >= 0.35
          AND round(CASE WHEN len(t) < 2 THEN 0.0
                ELSE CAST(list_aggregate(list_transform(
                       list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])),
                       bg -> len(list_filter(
                         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]),
                         x -> x = bg))), 'max') AS DOUBLE) * 2.0
                     / CAST(len(t) AS DOUBLE) END, 6) <= 0.12),
      weights(lang, accept_below) AS (VALUES $dim),
      s4 AS (
        SELECT s3.* FROM s3 JOIN weights w ON s3.lang = w.lang
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < w.accept_below),
      funnel AS (
        SELECT 0 AS stage_idx, 'raw' AS stage,
               COUNT(*) AS docs, COALESCE(SUM(len(t)), 0) AS tokens FROM ntok
        UNION ALL
        SELECT 1, 'exact_dedup', COUNT(*), COALESCE(SUM(len(t)), 0) FROM s1
        UNION ALL
        SELECT 2, 'neardup_clusters', COUNT(*), COALESCE(SUM(len(t)), 0) FROM s2
        UNION ALL
        SELECT 3, 'quality_filter', COUNT(*), COALESCE(SUM(len(t)), 0) FROM s3
        UNION ALL
        SELECT 4, 'weighted_mix', COUNT(*), COALESCE(SUM(len(t)), 0) FROM s4)
      SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
             CAST(docs AS BIGINT) AS docs, CAST(tokens AS BIGINT) AS tokens
      FROM funnel
      ORDER BY stage_idx"""
    })

  /** Quality-ranked stratified selection: the top-3 documents per source by
    * the t03 quality score (desc, doc_id tie-break) — "keep the best of
    * each source", the biased counterpart of c02's unbiased hash sample.
    * One shuffle on the stratum, output bounded at n per stratum. The
    * oracle restates the identical quality arithmetic (same formula as
    * t03's) plus the window. */
  val c07QualityTopPerSource = GraftQuery(
    "c07_quality_top_per_source",
    (s, dir) =>
      Curation.qualityTopN(
          table(s, dir, "documents")
            .select(col("doc_id"), col("source"),
              TextAnalysis.qualityScore(col("text")).as("quality")),
          "source", col("quality"), "doc_id", 3)
        .select(col("source"), col("quality_rank").cast("bigint").as("quality_rank"),
          col("doc_id"), col("quality"))
        .orderBy(col("source"), col("quality_rank")),
    Some("""
      WITH base AS (
        SELECT doc_id, source,
          CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS DOUBLE) AS n_tok,
          CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
            / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
          CAST(len(list_filter(list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
            t -> t IN ('the','a','of','and','to','in','is','it','that','for',
                       'el','la','de','y','que','los','un','es','en','se',
                       'der','die','das','und','ist','ein','zu','den','mit','nicht',
                       'le','la','de','et','est','les','un','une','du','pour'))) AS DOUBLE) AS stop_hits
        FROM documents),
      scored AS (
        SELECT doc_id, source,
               round(least(n_tok / 50.0, 1.0) * 0.4 + (1.0 - punct_ratio) * 0.3
                     + stop_hits / greatest(n_tok, 1.0) * 0.3, 6) AS quality
        FROM base),
      ranked AS (
        SELECT source, doc_id, quality,
               row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS quality_rank
        FROM scored)
      SELECT source, CAST(quality_rank AS BIGINT) AS quality_rank, doc_id, quality
      FROM ranked
      WHERE quality_rank <= 3
      ORDER BY source, quality_rank"""))

  /** Token quotas for c08 — binding for every language at sf0.01 (each
    * stratum holds more tokens than its quota), so the op's cut logic is
    * exercised on all strata. */
  val TokenQuotas: Seq[(String, Long)] = Seq(
    "en" -> 4000L, "de" -> 1500L, "es" -> 1200L, "fr" -> 1200L, "zh" -> 800L)

  /** Token-quota mixing: per-language token budgets filled in deterministic
    * hash order (the recipe-shaped mix — "N tokens of X"), reported as
    * kept docs + kept tokens per language. Overshoot is bounded by one
    * document per stratum; the oracle restates the identical running-sum
    * cut. */
  val c08TokenQuotaMix = GraftQuery(
    "c08_token_quota_mix",
    (s, dir) =>
      Curation.tokenQuotaMix(table(s, dir, "documents"), "lang", "doc_id",
          TextAnalysis.tokenCount(col("text")).cast("bigint"), TokenQuotas)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept_docs"), sum(col("doc_tokens")).as("kept_tokens"))
        .orderBy(col("lang")),
    Some {
      val dim = TokenQuotas.map { case (l, q) => s"('$l', $q)" }.mkString(", ")
      s"""
      WITH quotas(lang, token_quota) AS (VALUES $dim),
      sized AS (
        SELECT d.doc_id, d.lang, q.token_quota,
               CAST(len(list_filter(string_split_regex(d.text, '\\s+'), t -> t <> '')) AS BIGINT) AS doc_tokens
        FROM documents d JOIN quotas q ON d.lang = q.lang),
      run AS (
        SELECT lang, token_quota, doc_tokens,
               SUM(doc_tokens) OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        FROM sized)
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS kept_docs,
             CAST(SUM(doc_tokens) AS BIGINT) AS kept_tokens
      FROM run
      WHERE running - doc_tokens < token_quota
      GROUP BY lang
      ORDER BY lang"""
    })

  /** Benchmark decontamination: each non-src0 document's LONG-shingle
    * (40-char ≈ 13-token verbatim run) overlap with the src0 "benchmark"
    * set — the pre-training hygiene scan. The eval vocabulary broadcasts
    * (benchmarks are small); the corpus never shuffles its payloads. Flag
    * threshold 0.5: half a doc's distinct long shingles appearing verbatim
    * in the benchmark marks it contaminated. */
  val c09Decontamination = GraftQuery(
    "c09_decontamination",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      Dedup.contaminationScan(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"), "doc_id", "text")
        .withColumn("contamination",
          round(col("eval_hits").cast("double") / col("n_shingles").cast("double"), 6))
        .withColumn("contaminated", col("contamination") >= 0.5)
        .select(col("doc_id"), col("n_shingles"), col("eval_hits"),
          col("contamination"), col("contaminated"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH codes_t AS (
        SELECT doc_id, source, ${DedupQueries.duckCodesSql} AS codes, text FROM documents),
      hs_t AS (
        SELECT doc_id, source, list_distinct(${DedupQueries.duckShingleHashesN(40)}) AS hset
        FROM codes_t),
      eval_h AS (
        SELECT DISTINCT unnest(hset) AS h FROM hs_t WHERE source = 'src0'),
      corpus AS (
        SELECT doc_id, len(hset) AS n_shingles, unnest(hset) AS h
        FROM hs_t WHERE source <> 'src0'),
      hits AS (
        SELECT c.doc_id, c.n_shingles,
               CAST(SUM(CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS eval_hits
        FROM corpus c LEFT JOIN eval_h e ON c.h = e.h
        GROUP BY c.doc_id, c.n_shingles)
      SELECT doc_id, CAST(n_shingles AS INT) AS n_shingles, eval_hits,
             round(CAST(eval_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) AS contamination,
             round(CAST(eval_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) >= 0.5 AS contaminated
      FROM hits
      ORDER BY doc_id"""))

  /** Decontamination with a bloom pre-filter on the probe side (the
    * runtime-filter pattern, [[graft.operators.Dedup.bloomContaminationScan]]):
    * the eval vocabulary folds into one fixed-size sketch; corpus shingles
    * that fail the codegen'd probe never reach the membership join. No
    * false negatives, so the result is bit-identical to the exact c09 scan
    * — and the oracle is the SAME SQL: DuckDB recomputes the exact answer,
    * proving the bloom path prunes without dropping a single hit. */
  val c12BloomDecontamination = GraftQuery(
    "c12_bloom_decontamination",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      Dedup.bloomContaminationScan(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"), "doc_id", "text",
          expectedEvalShingles = 100000L)
        .withColumn("contamination",
          round(col("eval_hits").cast("double") / col("n_shingles").cast("double"), 6))
        .withColumn("contaminated", col("contamination") >= 0.5)
        .select(col("doc_id"), col("n_shingles"), col("eval_hits"),
          col("contamination"), col("contaminated"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH codes_t AS (
        SELECT doc_id, source, ${DedupQueries.duckCodesSql} AS codes, text FROM documents),
      hs_t AS (
        SELECT doc_id, source, list_distinct(${DedupQueries.duckShingleHashesN(40)}) AS hset
        FROM codes_t),
      eval_h AS (
        SELECT DISTINCT unnest(hset) AS h FROM hs_t WHERE source = 'src0'),
      corpus AS (
        SELECT doc_id, len(hset) AS n_shingles, unnest(hset) AS h
        FROM hs_t WHERE source <> 'src0'),
      hits AS (
        SELECT c.doc_id, c.n_shingles,
               CAST(SUM(CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS eval_hits
        FROM corpus c LEFT JOIN eval_h e ON c.h = e.h
        GROUP BY c.doc_id, c.n_shingles)
      SELECT doc_id, CAST(n_shingles AS INT) AS n_shingles, eval_hits,
             round(CAST(eval_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) AS contamination,
             round(CAST(eval_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) >= 0.5 AS contaminated
      FROM hits
      ORDER BY doc_id"""))

  /** Adaptive per-stratum threshold: keep each source's docs at or above
    * that source's own median length — per-stratum quantile gates, the way
    * production quality cutoffs are actually set. One |strata|-row exact
    * percentile aggregate broadcast back as a per-row filter; the corpus
    * never reshuffles. (At 100 TB the agg swaps to approx_percentile —
    * same plan shape; exact is what the oracle can hash-match.) */
  val c11AdaptiveThreshold = GraftQuery(
    "c11_adaptive_threshold",
    (s, dir) =>
      Curation.adaptiveThreshold(table(s, dir, "documents"), "source", col("n_chars"), 0.5)
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(col("stratum_threshold"), 6).as("stratum_threshold"))
        .orderBy(col("doc_id")),
    Some("""
      WITH thr AS (
        SELECT source, quantile_cont(n_chars, 0.5) AS t FROM documents GROUP BY source)
      SELECT d.doc_id, d.source, d.n_chars, round(t, 6) AS stratum_threshold
      FROM documents d JOIN thr USING (source)
      WHERE d.n_chars >= t
      ORDER BY d.doc_id"""))

  /** Quality-keeper cluster resolution: where c05 keeps each near-dup
    * cluster's MIN id (cheap, arbitrary), this keeps its BEST document —
    * argmax of the t03 quality score, id tie-break — which is what
    * production dedup actually wants (the near-dups differ in cruft;
    * keep the cleanest). One row_number window over the (tiny) cluster
    * membership table; the corpus itself only contributes per-row quality
    * scores. Ordering compares the ROUNDED score so both engines rank on
    * identical values. */
  val c13QualityKeeper = GraftQuery(
    "c13_quality_keeper",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = table(s, dir, "documents")
      val labels = Curation.connectedComponents(
        Dedup.lshNearDupPairs(docs, "doc_id", "text", 0.5))
      val quality = docs.select(col("doc_id").as("member_id"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col("member_id").asc)
      labels.join(quality, "member_id")
        .withColumn("rk", row_number().over(w))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .filter(col("rk") === 1)
        .select(col("cluster_id"), col("member_id").as("keeper_id"),
          col("quality").as("keeper_quality"), col("cluster_size"))
        .orderBy(col("cluster_id"))
    },
    Some(s"""
      WITH RECURSIVE ${DedupQueries.duckLshPairCtes},
      edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM lsh_pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM lsh_pairs),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      labels AS (
        SELECT src AS member_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
      qbase AS (
        SELECT doc_id,
          CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS DOUBLE) AS n_tok,
          CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
            / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
          CAST(len(list_filter(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''),
            t -> t IN ('the','a','of','and','to','in','is','it','that','for',
                       'el','la','de','y','que','los','un','es','en','se',
                       'der','die','das','und','ist','ein','zu','den','mit','nicht',
                       'le','la','de','et','est','les','un','une','du','pour'))) AS DOUBLE) AS stop_hits
        FROM documents),
      quality AS (
        SELECT doc_id AS member_id,
               round(least(n_tok / 50.0, 1.0) * 0.4 + (1.0 - punct_ratio) * 0.3
                     + stop_hits / greatest(n_tok, 1.0) * 0.3, 6) AS quality
        FROM qbase),
      ranked AS (
        SELECT l.cluster_id, l.member_id, q.quality,
               row_number() OVER (PARTITION BY l.cluster_id
                 ORDER BY q.quality DESC, l.member_id ASC) AS rk,
               COUNT(*) OVER (PARTITION BY l.cluster_id) AS cluster_size
        FROM labels l JOIN quality q USING (member_id))
      SELECT cluster_id, member_id AS keeper_id, quality AS keeper_quality,
             CAST(cluster_size AS BIGINT) AS cluster_size
      FROM ranked WHERE rk = 1
      ORDER BY cluster_id"""))

  /** Deterministic 80/10/10 train/val/test split by content-stable hash —
    * split membership is a pure function of doc_id, so reruns, engines,
    * and any partition layout agree (the property that keeps eval data out
    * of training forever). Per-row CASE over the md5 prefix; the rollup is
    * one tiny aggregate. */
  val c14HashSplit = GraftQuery(
    "c14_hash_split",
    (s, dir) =>
      Curation.hashSplit(table(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("bigint")).as("n_tokens"),
          min(col("doc_id")).as("min_doc_id"))
        .orderBy(col("split")),
    Some {
      val t80 = Curation.rateThreshold(0.8)
      val t90 = Curation.rateThreshold(0.9)
      val t100 = Curation.rateThreshold(1.0)
      s"""
      WITH labeled AS (
        SELECT doc_id, text,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '$t80' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '$t90' THEN 'val'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '$t100' THEN 'test'
                    ELSE 'rest' END AS split
        FROM documents)
      SELECT split,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))) AS BIGINT) AS n_tokens,
             MIN(doc_id) AS min_doc_id
      FROM labeled
      GROUP BY split
      ORDER BY split"""
    })

  /** RAG/training-style overlapping token-window chunking: 32-token windows
    * advancing by 24 (8-token overlap so no boundary cuts context a window
    * doesn't also see whole). One row per chunk with its index, length, and
    * re-joined text. Map-only (per-row generate + slice, all codegen
    * built-ins, no shuffle) — chunking 100 TB runs at scan speed and
    * parallelizes with input splits. */
  val c15ChunkWindows = GraftQuery(
    "c15_chunk_windows",
    (s, dir) =>
      TextAnalysis.chunkWindows(table(s, dir, "documents"), "doc_id", "text",
          size = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS t
        FROM documents),
      ch AS (
        SELECT doc_id, t,
               greatest(1, CAST(ceil((len(t) - 32) / 24.0) AS BIGINT) + 1) AS nch
        FROM toks)
      SELECT doc_id,
             unnest(range(0, nch)) AS chunk_idx,
             unnest(list_transform(range(0, nch),
               i -> CAST(len(list_slice(t, CAST(i*24+1 AS INT), CAST(i*24+32 AS INT))) AS INT))) AS chunk_tokens,
             unnest(list_transform(range(0, nch),
               i -> array_to_string(list_slice(t, CAST(i*24+1 AS INT), CAST(i*24+32 AS INT)), ' '))) AS chunk_text
      FROM ch
      ORDER BY doc_id, chunk_idx"""))

  /** Temperature-2 source mixing: per-source targets ∝ √count (flattens
    * head sources, up-samples tail), exact integer targets, deterministic
    * hash-order prefix selection. 300-row total budget. */
  val c16TemperatureMix = GraftQuery(
    "c16_temperature_mix",
    (s, dir) =>
      Curation.temperatureMix(table(s, dir, "documents"), "source", "doc_id", 300L)
        .select(col("doc_id"), col("source"), col("mix_rank"))
        .orderBy(col("doc_id")),
    Some("""
      WITH c AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(round(sqrt(COUNT(*)), 9) AS DECIMAL(28,9)) AS w9
        FROM documents GROUP BY source),
      t AS (SELECT SUM(w9) AS tot FROM c),
      tg AS (
        SELECT source,
               least(cnt, CAST(floor(CAST(w9 AS DOUBLE) / CAST(tot AS DOUBLE) * 300)
                 AS BIGINT)) AS n_s
        FROM c, t),
      r AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS mix_rank
        FROM documents)
      SELECT r.doc_id, r.source, r.mix_rank
      FROM r JOIN tg ON r.source = tg.source
      WHERE r.mix_rank <= tg.n_s
      ORDER BY r.doc_id"""))

  /** k-anonymity audit over (lang, source, n_chars-decile) quasi-identifier
    * tuples: every combination with fewer than 5 members is flagged — the
    * privacy release gate complementing t08's direct-identifier scrub. */
  val c17KAnonymity = GraftQuery(
    "c17_k_anonymity",
    (s, dir) =>
      Curation.kAnonymityAudit(
          table(s, dir, "documents")
            .select(col("lang"), col("source"),
              floor(col("n_chars") / 100).cast("bigint").as("chars_bucket")),
          Seq("lang", "source", "chars_bucket"), 5L)
        .orderBy(col("lang"), col("source"), col("chars_bucket")),
    Some("""
      SELECT lang, source,
             CAST(floor(n_chars / 100.0) AS BIGINT) AS chars_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             COUNT(*) < 5 AS at_risk
      FROM documents
      GROUP BY 1, 2, 3
      ORDER BY lang, source, chars_bucket"""))

  /** Ensemble quality rank: three independent per-row signals (heuristic
    * quality score, hashed-classifier score, type-token ratio) converted
    * to per-language percentile ranks and averaged — the ensemble-filter
    * practice that makes curation robust to any single signal's blind
    * spot, with per-stratum ranking so languages are not compared on one
    * scale. Ties are impossible (doc_id tie-break), so percent_rank is a
    * pure function of the corpus; at 100 TB the exact per-stratum window
    * swaps for approx_percentile bucketing exactly as c11 documents. */
  val c18QualityEnsemble = GraftQuery(
    "c18_quality_ensemble",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = TextAnalysis.tokens(col("text"))
      def rankOf(sig: org.apache.spark.sql.Column) =
        percent_rank().over(Window.partitionBy(col("lang")).orderBy(sig, col("doc_id")))
      table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text")).as("s_quality"),
          TextAnalysis.hashedLinearScoreMilli(toks).as("s_clf"),
          TextAnalysis.distinctTokenFrac(toks).as("s_ttr"))
        .select(col("doc_id"), col("lang"),
          round((rankOf(col("s_quality")) + rankOf(col("s_clf")) + rankOf(col("s_ttr"))) / 3.0, 6)
            .as("ensemble_rank"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH base AS (
        SELECT doc_id, lang, text,
          CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS DOUBLE) AS n_tok,
          CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
            / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
          CAST(len(list_filter(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''),
            t -> t IN ('the','a','of','and','to','in','is','it','that','for',
                       'el','la','de','y','que','los','un','es','en','se',
                       'der','die','das','und','ist','ein','zu','den','mit','nicht',
                       'le','la','de','et','est','les','un','une','du','pour'))) AS DOUBLE) AS stop_hits
        FROM documents),
      sig AS (
        SELECT doc_id, lang,
               round(least(n_tok / 50.0, 1.0) * 0.4 + (1.0 - punct_ratio) * 0.3
                     + stop_hits / greatest(n_tok, 1.0) * 0.3, 6) AS s_quality,
               CAST(COALESCE(list_sum(list_transform(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''), tok ->
                 ((${DedupQueries.duckPoly(
                   "list_transform(range(1, length(tok)+1), i -> CAST(ascii(substr(tok, CAST(i AS INT), 1)) AS BIGINT))")}
                   % 1024) * 2654435761) % 1000000007 % 2001 - 1000)), 0) AS BIGINT) AS s_clf,
               CASE WHEN len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) = 0 THEN 1.0
                    ELSE len(list_distinct(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')))
                         / CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS DOUBLE) END AS s_ttr
        FROM base)
      SELECT doc_id, lang,
             round((percent_rank() OVER (PARTITION BY lang ORDER BY s_quality, doc_id)
                  + percent_rank() OVER (PARTITION BY lang ORDER BY s_clf, doc_id)
                  + percent_rank() OVER (PARTITION BY lang ORDER BY s_ttr, doc_id)) / 3.0, 6)
               AS ensemble_rank
      FROM sig
      ORDER BY doc_id"""))

  /** Cross-source n-gram overlap matrix (the corpus-level decontamination
    * diagnostic run BEFORE mixing sources: high overlap between a training
    * source and a benchmark source means leakage; c09/c12 then remove it
    * doc-by-doc): distinct (source, 8-gram) pairs, self-joined on the gram,
    * exact Jaccard per source pair.
    *
    * Scale shape: the (source, gram) DISTINCT is the one big shuffle (gram-
    * keyed, map-side combined). The self-join fans out ≤ |sources| rows per
    * gram — bounded by construction, no df-cap needed (unlike document-level
    * d02, where one gram can hit 10⁶ DOCS, a gram here hits at most every
    * SOURCE once). Pair counts are |sources|²-bounded, so the final agg is
    * tiny. */
  val c19SourceOverlap = GraftQuery(
    "c19_source_overlap",
    (s, dir) => {
      val grams = table(s, dir, "documents")
        .select(col("source"),
          explode(TextAnalysis.wordNgrams(TextAnalysis.tokens(col("text")), 8)).as("gram"))
        .distinct()
      val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val a = grams.select(col("source").as("src_a"), col("gram"))
      val b = grams.select(col("source").as("src_b"), col("gram"))
      a.join(b, Seq("gram")).filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("overlap"))
        .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))), Seq("src_a"))
        .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("overlap"), col("n_a"), col("n_b"),
          round(col("overlap").cast("double")
            / (col("n_a") + col("n_b") - col("overlap")).cast("double"), 6).as("jaccard"))
        .orderBy(col("src_a"), col("src_b"))
    },
    Some("""
      WITH toks AS (
        SELECT source, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS t
        FROM documents),
      g0 AS (
        SELECT source,
               unnest(list_transform(range(0, greatest(len(t) - 7, 0)),
                 i -> array_to_string(list_slice(t, CAST(i+1 AS INT), CAST(i+8 AS INT)), ' '))) AS gram
        FROM toks),
      g AS (SELECT DISTINCT source, gram FROM g0),
      sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY source),
      ov AS (
        SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS overlap
        FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, overlap, sa.n AS n_a, sb.n AS n_b,
             round(CAST(overlap AS DOUBLE) / CAST(sa.n + sb.n - overlap AS DOUBLE), 6) AS jaccard
      FROM ov
      JOIN sz sa ON ov.src_a = sa.source
      JOIN sz sb ON ov.src_b = sb.source
      ORDER BY src_a, src_b"""))

  /** Weighted sampling without replacement ([[Curation.weightedSample]],
    * A-ES): 100 docs drawn ∝ n_chars — longer documents proportionally
    * likelier, no duplicates, deterministic from the md5 key. The oracle
    * restates the exponential-score formula; 9-decimal score rounding +
    * doc_id tie-break make the top-k cut engine-exact. */
  val c20WeightedSample = GraftQuery(
    "c20_weighted_sample",
    (s, dir) =>
      Curation.weightedSample(table(s, dir, "documents"), "doc_id",
          col("n_chars"), k = 100)
        .select(col("doc_id"), col("source"), col("n_chars"), col("es_score"))
        .orderBy(col("es_score"), col("doc_id")),
    Some("""
      WITH scored AS (
        SELECT doc_id, source, n_chars,
               round(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   AS DOUBLE) + 1.0) / 4294967296.0)
                 / CAST(n_chars AS DOUBLE), 9) AS es_score
        FROM documents)
      SELECT doc_id, source, n_chars, es_score
      FROM scored
      ORDER BY es_score ASC, doc_id ASC
      LIMIT 100"""))

  /** l-diversity audit ([[Curation.lDiversityAudit]]), k-anonymity's
    * attribute-disclosure complement (c17 pairs with it): (lang, source)
    * groups whose length-band sensitive attribute takes < 3 distinct
    * values are flagged even when the group itself is large. */
  val c21LDiversity = GraftQuery(
    "c21_l_diversity",
    (s, dir) =>
      Curation.lDiversityAudit(table(s, dir, "documents"),
          Seq("lang", "source"), expr("n_chars div 500"), l = 3)
        .orderBy(col("lang"), col("source")),
    Some("""
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT n_chars // 500) AS BIGINT) AS distinct_sensitive,
             COUNT(DISTINCT n_chars // 500) < 3 AS at_risk
      FROM documents
      GROUP BY lang, source
      ORDER BY lang, source"""))

  /** Recipe for c23: sources cycle through 2.5 / 1 / 0.5 / 0 epochs —
    * up-sampled, kept, half-sampled, and excluded strata in one run. */
  private val epochRecipe: Seq[(String, Int)] =
    (0 until 20).map(i => (s"src$i", Seq(2500, 1000, 500, 0)(i % 4)))

  /** Source-repetition epoch mixing ([[Curation.epochMix]]) — the
    * data-recipe operator: ⌊epochs⌋ full passes per row plus a
    * deterministic md5-sampled fractional epoch, with the salted hash as
    * the global interleave order. Recipes in integer milli-epochs; the
    * oracle restates the explode + threshold rule verbatim. */
  val c23EpochMix = GraftQuery(
    "c23_epoch_mix",
    (s, dir) =>
      Curation.epochMix(
          table(s, dir, "documents").select(col("doc_id"), col("source")),
          "source", "doc_id", epochRecipe)
        .select(col("doc_id"), col("source"), col("epoch"), col("interleave_key"))
        .orderBy(col("doc_id"), col("epoch")),
    Some {
      val recipeValues = epochRecipe.map { case (s2, m) =>
        val thr = Curation.rateThreshold((m % 1000) / 1000.0)
        s"('$s2', ${m / 1000}, '$thr')"
      }.mkString(", ")
      val maxEpoch = epochRecipe.map(_._2 / 1000).max + 1
      s"""
      WITH recipe(source, full_epochs, frac_thr) AS (SELECT * FROM (VALUES $recipeValues)),
      epochs AS (SELECT CAST(unnest(range(1, $maxEpoch + 1)) AS BIGINT) AS epoch),
      exploded AS (
        SELECT d.doc_id, d.source, e.epoch, r.full_epochs, r.frac_thr
        FROM documents d JOIN recipe r USING (source)
        CROSS JOIN epochs e
        WHERE e.epoch <= r.full_epochs + 1),
      keyed AS (
        SELECT doc_id, source, epoch, full_epochs, frac_thr,
               md5(CAST(doc_id AS VARCHAR) || '#e' || CAST(epoch AS VARCHAR)) AS interleave_key
        FROM exploded)
      SELECT doc_id, source, epoch, interleave_key
      FROM keyed
      WHERE epoch <= full_epochs OR substr(interleave_key, 1, 3) < frac_thr
      ORDER BY doc_id, epoch"""
    })

  /** Deterministic contrastive negative sampling: 3 hash-ring partners per
    * document, rings per 16-way hash bucket so the rank window never needs
    * a global total order. The oracle replays bucket, md5 rank, and the
    * ring-shift arithmetic value-for-value. */
  val c24NegativePairs = GraftQuery(
    "c24_negative_pairs",
    (s, dir) =>
      Curation.negativePairs(table(s, dir, "documents").select(col("doc_id")),
          "doc_id", k = 3, buckets = 16)
        .orderBy(col("doc_id"), col("neg_j")),
    Some("""
      WITH b AS (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS bucket,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents),
      ranked AS (
        SELECT doc_id, bucket,
               CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS BIGINT) AS r,
               CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS n
        FROM b),
      wanted AS (
        SELECT doc_id, bucket, CAST(j AS INT) AS neg_j,
               ((r - 1 + j * greatest(n // 4, 1)) % n) + 1 AS want
        FROM ranked, range(1, 4) t(j)),
      resolved AS (
        SELECT w.doc_id, w.neg_j, m.doc_id AS neg_id
        FROM wanted w JOIN ranked m ON w.bucket = m.bucket AND w.want = m.r
        WHERE m.doc_id <> w.doc_id)
      SELECT doc_id, neg_j, neg_id FROM resolved
      ORDER BY doc_id, neg_j"""))

  /** DSIR importance resampling (Xie et al. 2023): average unigram
    * log-likelihood ratio of target (src1–src3) vs raw corpus, Gumbel-top-k
    * draw ∝ exp(score/τ) with md5-derived (layout-stable) noise. One token
    * shuffle to vocab counts → broadcast back → doc-keyed decimal-sum
    * score → global top-k; linear in corpus tokens at any scale. */
  val c25ImportanceResample = GraftQuery(
    "c25_importance_resample",
    (s, dir) =>
      Curation.importanceResample(
          table(s, dir, "documents"), "doc_id", "text",
          col("source").isin("src1", "src2", "src3"), k = 100)
        .select(col("sample_rank"), col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("sample_rank")),
    Some("""
      WITH occurrences AS (
        SELECT doc_id, source,
               unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
        FROM documents),
      terms AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf,
               max(CASE WHEN source IN ('src1','src2','src3') THEN 1 ELSE 0 END) AS is_tgt
        FROM occurrences GROUP BY doc_id, term),
      vocab AS (
        SELECT term,
               CAST(SUM(tf) AS BIGINT) AS cnt_raw,
               CAST(SUM(CASE WHEN is_tgt = 1 THEN tf ELSE 0 END) AS BIGINT) AS cnt_tgt
        FROM terms GROUP BY term),
      tot AS (
        SELECT CAST(SUM(cnt_raw) AS DOUBLE) AS n_raw,
               CAST(SUM(cnt_tgt) AS DOUBLE) AS n_tgt,
               CAST(COUNT(*) AS DOUBLE) AS v
        FROM vocab),
      c AS (
        SELECT doc_id, tf,
               CAST(round(CAST(tf AS DOUBLE) *
                 ln(((CAST(cnt_tgt AS DOUBLE) + 1.0) / (n_tgt + v))
                  / ((CAST(cnt_raw AS DOUBLE) + 1.0) / (n_raw + v))), 9)
                 AS DECIMAL(28,9)) AS c9
        FROM terms JOIN vocab USING (term), tot),
      scored AS (
        SELECT doc_id, CAST(SUM(c9) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) AS score
        FROM c GROUP BY doc_id),
      u AS (
        SELECT doc_id, score,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|dsir'), 1, 8))::BIGINT + 0.5)
                 / 4294967296.0 AS uniform
        FROM scored),
      keyed AS (
        SELECT doc_id, score,
               round(score / 0.05, 9) + round(-ln(-ln(uniform)), 9) AS gkey
        FROM u)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY gkey DESC, doc_id) AS INT) AS sample_rank,
             doc_id, round(score, 6) AS score
      FROM keyed
      ORDER BY gkey DESC, doc_id
      LIMIT 100"""))

  /** Leakage-safe train/val/test split: near-duplicate documents must land
    * in the SAME split, or eval examples leak into training as paraphrases
    * (the standard contamination failure a plain per-doc hash split — c14 —
    * cannot prevent). Split membership is decided by md5 of the document's
    * near-dup CLUSTER representative (LSH pairs → connected components;
    * singletons represent themselves), so every member of a cluster
    * inherits one verdict, deterministically across reruns and engines.
    *
    * Scale shape: the graph work runs only on the near-dup PAIR set (docs
    * with at least one near-dup — a small fraction of any deduped corpus),
    * labels join back to the corpus on doc_id (broadcast in the common
    * regime, plain hash join otherwise), and the split itself is the c14
    * per-row CASE — no corpus-sized shuffle beyond that one join. */
  val c26LeakageSafeSplit = GraftQuery(
    "c26_leakage_safe_split",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text", 0.5)
      val labels = Curation.connectedComponents(pairs)
        .withColumnRenamed("member_id", "doc_id")
      val keyed = docs.select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("split_key"))
      Curation.hashSplit(keyed, "split_key",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy(col("doc_id"))
    },
    Some {
      val t80 = Curation.rateThreshold(0.8)
      val t90 = Curation.rateThreshold(0.9)
      val t100 = Curation.rateThreshold(1.0)
      s"""
      WITH RECURSIVE ${DedupQueries.duckLshPairCtes},
      edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM lsh_pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM lsh_pairs),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      labels AS (
        SELECT src AS member_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
      keyed AS (
        SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS split_key
        FROM documents d LEFT JOIN labels l ON d.doc_id = l.member_id)
      SELECT doc_id, split_key,
             CASE WHEN substr(md5(CAST(split_key AS VARCHAR)), 1, 3) < '$t80' THEN 'train'
                  WHEN substr(md5(CAST(split_key AS VARCHAR)), 1, 3) < '$t90' THEN 'val'
                  WHEN substr(md5(CAST(split_key AS VARCHAR)), 1, 3) < '$t100' THEN 'test'
                  ELSE 'rest' END AS split
      FROM keyed
      ORDER BY doc_id"""
    })

  /** Per-source corpus health report (c27) — the dataset-card statistics a
    * curation pipeline publishes per release: document/token volume, token
    * length distribution (mean + exact interpolated median), exact-dup rate
    * (normalized-text fingerprint collisions, the d01 signal as a RATE),
    * and language breadth. One hash-agg shuffle keyed by source; every
    * per-doc input (token count, fingerprint) is a per-row map, so the
    * report costs one corpus scan at any scale. (The exact median sorts
    * per-group values inside the aggregate; at 100 TB swap for
    * approx_percentile, same plan shape — the exactness is what lets the
    * DuckDB oracle hash-match, exactly as c11 documents.) */
  val c27CorpusReport = GraftQuery(
    "c27_corpus_report",
    (s, dir) => {
      val base = table(s, dir, "documents").select(col("source"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tok"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      base.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          round(avg(col("n_tok")), 6).as("mean_tokens"),
          round(percentile(col("n_tok"), lit(0.5)), 6).as("p50_tokens"),
          round((count(lit(1)) - countDistinct(col("fp"))).cast("double")
            / count(lit(1)).cast("double"), 6).as("exact_dup_rate"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy(col("source"))
    },
    Some("""
      WITH base AS (
        SELECT source, lang,
               CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS BIGINT) AS n_tok,
               md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        FROM documents)
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             round(AVG(n_tok), 6) AS mean_tokens,
             round(quantile_cont(n_tok, 0.5), 6) AS p50_tokens,
             round(CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS exact_dup_rate,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM base
      GROUP BY source
      ORDER BY source"""))

  /** Quality-threshold yield sweep (c28): document and token survival at
    * every candidate quality cutoff (0.0 … 0.9) — the operating-point
    * curve a pipeline reads to price quality against volume BEFORE fixing
    * a gate ("0.6 keeps 80 % of tokens; 0.7 keeps 45 %"). One corpus scan
    * computes (quality, tokens) per doc; the 10-row threshold grid
    * broadcasts; the agg shuffles ≤ 10·|partitions| partial rows. The
    * same sweep composes with any scoring column (t20 xent, t12
    * classifier margin). */
  val c28QualitySweep = GraftQuery(
    "c28_quality_sweep",
    (s, dir) => {
      val base = table(s, dir, "documents").select(
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tok"))
      val grid = s.range(0, 10).select((col("id") / 10.0).as("threshold"))
      base.crossJoin(broadcast(grid))
        .filter(col("quality") >= col("threshold"))
        .groupBy(col("threshold"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          // round-6 scores summed as DECIMAL: the mean is partitioning-exact
          round(sum(col("quality").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .cast("double") / count(lit(1)).cast("double"), 6).as("mean_quality"))
        .orderBy(col("threshold"))
    },
    Some("""
      WITH base AS (
        SELECT round(least(CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS DOUBLE) / 50.0, 1.0) * 0.4
                 + (1.0 - CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                          / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
                 + CAST(len(list_filter(list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
                     t -> t IN ('the','a','of','and','to','in','is','it','that','for',
                                'el','la','de','y','que','los','un','es','en','se',
                                'der','die','das','und','ist','ein','zu','den','mit','nicht',
                                'le','la','de','et','est','les','un','une','du','pour'))) AS DOUBLE)
                   / greatest(CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS DOUBLE), 1.0) * 0.3,
                 6) AS quality,
               CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS BIGINT) AS n_tok
        FROM documents),
      grid AS (SELECT i / 10.0 AS threshold FROM range(0, 10) t(i))
      SELECT threshold,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             round(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS mean_quality
      FROM base JOIN grid ON quality >= threshold
      GROUP BY threshold
      ORDER BY threshold"""))

  /** Deterministic epoch shuffle + sharding ([[Curation.epochShuffle]]):
    * the data-loader order step — every doc gets a shard and a dense
    * 0-based position within it, both pure functions of (doc_id, epoch),
    * so epoch 2 is a fresh reproducible permutation of epoch 1 and any
    * worker recomputes its own shard's order with no coordination.
    * Deliberately NO global total order (the 100 TB anti-pattern): shard
    * assignment is a salted-md5 map, within-shard order one window per
    * shard (~n/shards rows each). The oracle replays key, shard and
    * position value-for-value. */
  val c29EpochShuffle = GraftQuery(
    "c29_epoch_shuffle",
    (s, dir) =>
      Curation.epochShuffle(
          table(s, dir, "documents").select(col("doc_id")),
          "doc_id", epoch = 2L, numShards = 8)
        .select(col("doc_id"), col("shard"), col("pos_in_shard"))
        .orderBy(col("shard"), col("pos_in_shard")),
    Some("""
      WITH k AS (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR) || '#e2') AS key,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#e2'), 1, 8))::BIGINT
                 % 8 AS INT) AS shard
        FROM documents)
      SELECT doc_id, shard,
             CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1
               AS INT) AS pos_in_shard
      FROM k
      ORDER BY shard, pos_in_shard"""))

  /** GPT-style concat-and-chunk dataloader index
    * ([[Curation.concatChunk]]): docs concatenate in deterministic hash
    * order per shard, the token stream chunks into 512-token windows, and
    * every (doc, chunk) slice carries its exact offsets — docs crossing
    * chunk boundaries emit one row per chunk they touch. DuckDB replays
    * the cumulative positions and the slice arithmetic verbatim. */
  val c30ConcatChunk = GraftQuery(
    "c30_concat_chunk",
    (s, dir) =>
      Curation.concatChunk(table(s, dir, "documents"), "doc_id",
          TextAnalysis.tokenCount(col("text")), chunkTokens = 512, shards = 8)
        .select(col("shard").cast("bigint").as("shard"), col("doc_id"),
          col("seq_id"), col("doc_off"), col("chunk_off"), col("span"))
        .orderBy(col("shard"), col("seq_id"), col("chunk_off"), col("doc_id")),
    Some("""
      WITH sized AS (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
               CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS BIGINT) AS doc_tokens
        FROM documents),
      pos AS (
        SELECT *, CAST(SUM(doc_tokens) OVER (PARTITION BY shard
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - doc_tokens AS BIGINT) AS doc_start
        FROM sized WHERE doc_tokens > 0),
      x AS (
        SELECT shard, doc_id, doc_tokens, doc_start,
               unnest(generate_series(doc_start // 512, (doc_start + doc_tokens - 1) // 512)) AS seq_id
        FROM pos)
      SELECT CAST(shard AS BIGINT) AS shard, doc_id, seq_id,
             greatest(0, seq_id * 512 - doc_start) AS doc_off,
             greatest(0, doc_start - seq_id * 512) AS chunk_off,
             least(doc_start + doc_tokens, (seq_id + 1) * 512)
               - greatest(doc_start, seq_id * 512) AS span
      FROM x
      ORDER BY shard, seq_id, chunk_off, doc_id"""))

  /** The quality-gate predicate SQL shared by the c06 funnel and the c31
    * incremental replay (t07 thresholds over the token list column `t`). */
  private def duckQualityGate: String = """
        round(CASE WHEN len(t) = 0 THEN 1.0
                ELSE CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) END, 6) >= 0.35
          AND round(CASE WHEN len(t) < 2 THEN 0.0
                ELSE CAST(list_aggregate(list_transform(
                       list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])),
                       bg -> len(list_filter(
                         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]),
                         x -> x = bg))), 'max') AS DOUBLE) * 2.0
                     / CAST(len(t) AS DOUBLE) END, 6) <= 0.12"""

  /** Day-N INCREMENTAL curation end-to-end against the AT-REST near-dup
    * index ([[graft.pipeline.CurationJob.runIncremental]] over the
    * `curated_shingles`/`curated_postings` tables the day-0 bootstrap
    * ships): the corpus splits deterministically into a standing two-thirds
    * (day-0 [[graft.pipeline.CurationJob.run]]) and a batch third, the
    * batch goes through all six incremental stages — exact dedup within
    * itself, exact anti-join against curated fingerprints, LSH near-dup
    * within itself (star components, min-id keeper), near-dup against the
    * curated INDEX (band probes, standing corpus never re-pairs), the
    * quality gate, the weighted mix — and the final curated corpus must
    * equal DuckDB's from-scratch restatement of day-0 funnel ∪ incremental
    * survivors. This is the oracle gate for the index path itself: a
    * posting/shingle table that drifted from the documents would change
    * stage 4's drop set and break the hash. */
  val c31IncrementalCuration = GraftQuery(
    "c31_incremental_curated_corpus",
    (s, dir) => {
      val scratch = java.nio.file.Files.createTempDirectory("graft-c31")
      val lake = new graft.pipeline.Lakehouse(s, scratch.toString)
      val docs = table(s, dir, "documents")
      val r0 = graft.pipeline.CurationJob.run(lake,
        docs.filter(col("doc_id") % 3 =!= 0), MixWeights, optimize = false,
        now = java.sql.Timestamp.valueOf("2025-06-01 00:00:00"), runId = "c31-day0")
      require(r0.status == "success", s"c31 day0 failed: ${r0.error}")
      require(lake.exists("curated", "curated_postings"),
        "day-0 bootstrap did not ship the at-rest index")
      val r1 = graft.pipeline.CurationJob.runIncremental(lake,
        docs.filter(col("doc_id") % 3 === 0), MixWeights, optimize = false,
        now = java.sql.Timestamp.valueOf("2025-06-02 00:00:00"), runId = "c31-day1")
      require(r1.status == "success", s"c31 day1 failed: ${r1.error}")
      val res = lake.table("curated", "curated_documents")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
      // collect + drop the scratch lakehouse (StorageQueries discipline)
      val rows = java.util.Arrays.asList(res.collect(): _*)
      val out = s.createDataFrame(rows, res.schema)
      val w = java.nio.file.Files.walk(scratch)
      try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
      finally w.close()
      out
    },
    Some {
      val dim = MixWeights
        .map { case (l, r) => s"('$l', '${Curation.rateThreshold(r)}')" }
        .mkString(", ")
      val fp = "md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))"
      s"""
      WITH RECURSIVE
      stand AS MATERIALIZED (SELECT * FROM documents WHERE doc_id % 3 <> 0),
      batch AS MATERIALIZED (SELECT * FROM documents WHERE doc_id % 3 = 0),
      ${DedupQueries.duckLshPairCtesOver("stand", "s_")},
      s_edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM s_lsh_pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM s_lsh_pairs),
      s_reach(src, dst) AS (
        SELECT DISTINCT src, src FROM s_edges
        UNION
        SELECT r.src, e.dst FROM s_reach r JOIN s_edges e ON r.dst = e.src),
      s_labels AS (
        SELECT src AS member_id, MIN(dst) AS cluster_id FROM s_reach GROUP BY src),
      s_ntok AS (
        SELECT doc_id, lang, source, text,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
        FROM stand),
      s_keep AS (SELECT MIN(doc_id) AS doc_id FROM stand GROUP BY $fp),
      s1 AS (SELECT n.* FROM s_ntok n JOIN s_keep USING (doc_id)),
      s2 AS (
        SELECT * FROM s1
        WHERE doc_id NOT IN
          (SELECT member_id FROM s_labels WHERE member_id <> cluster_id)),
      s3 AS (SELECT * FROM s2 WHERE $duckQualityGate),
      weights(lang, accept_below) AS (VALUES $dim),
      cur AS MATERIALIZED (
        SELECT s3.* FROM s3 JOIN weights w ON s3.lang = w.lang
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < w.accept_below),
      b_ntok AS (
        SELECT doc_id, lang, source, text,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
        FROM batch),
      b_keep AS (SELECT MIN(doc_id) AS doc_id FROM batch GROUP BY $fp),
      b1 AS (SELECT n.* FROM b_ntok n JOIN b_keep USING (doc_id)),
      curfp AS (SELECT DISTINCT $fp AS cfp FROM cur),
      b2 AS MATERIALIZED (SELECT * FROM b1 WHERE $fp NOT IN (SELECT cfp FROM curfp)),
      ${DedupQueries.duckLshPairCtesOver("b2", "b_")},
      b_edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM b_lsh_pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM b_lsh_pairs),
      b_reach(src, dst) AS (
        SELECT DISTINCT src, src FROM b_edges
        UNION
        SELECT r.src, e.dst FROM b_reach r JOIN b_edges e ON r.dst = e.src),
      b_labels AS (
        SELECT src AS member_id, MIN(dst) AS cluster_id FROM b_reach GROUP BY src),
      b3 AS (
        SELECT * FROM b2
        WHERE doc_id NOT IN
          (SELECT member_id FROM b_labels WHERE member_id <> cluster_id)),
      ${DedupQueries.duckLshPairCtesOver("cur", "c_")},
      x_cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM b_bands a JOIN c_bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
        WHERE a.doc_id IN (SELECT doc_id FROM b3)),
      x_dup AS (
        SELECT DISTINCT id_a AS doc_id FROM (
          SELECT id_a,
                 CAST(len(list_intersect(ha.hset, hb.hset)) AS DOUBLE) AS shared,
                 len(ha.hset) AS na, len(hb.hset) AS nb
          FROM x_cand
          JOIN b_hs_t ha ON id_a = ha.doc_id
          JOIN c_hs_t hb ON id_b = hb.doc_id) z
        WHERE shared / CAST(na + nb - shared AS DOUBLE) >= 0.5),
      b4 AS (SELECT * FROM b3 WHERE doc_id NOT IN (SELECT doc_id FROM x_dup)),
      b5 AS (SELECT * FROM b4 WHERE $duckQualityGate),
      b6 AS (
        SELECT b5.* FROM b5 JOIN weights w ON b5.lang = w.lang
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < w.accept_below),
      final AS (
        SELECT doc_id, lang, source FROM cur
        UNION ALL
        SELECT doc_id, lang, source FROM b6)
      SELECT doc_id, lang, source FROM final ORDER BY doc_id"""
    })

  val all: Seq[GraftQuery] =
    Seq(c01HashSample, c02StratifiedSample, c03WeightedMix, c04PackSequences,
      c05NearDupClusters, c06CurationFunnel, c07QualityTopPerSource,
      c08TokenQuotaMix, c09Decontamination, c11AdaptiveThreshold,
      c12BloomDecontamination, c13QualityKeeper, c14HashSplit, c15ChunkWindows,
      c16TemperatureMix, c17KAnonymity, c18QualityEnsemble, c19SourceOverlap,
      c20WeightedSample, c21LDiversity, c23EpochMix, c24NegativePairs,
      c25ImportanceResample, c26LeakageSafeSplit, c27CorpusReport,
      c28QualitySweep, c29EpochShuffle, c30ConcatChunk, c31IncrementalCuration)
}
