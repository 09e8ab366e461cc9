package graft.queries

import graft.Graft.table
import graft.operators.Curation
import graft.operators.TextAnalysis._
import org.apache.spark.sql.functions._

/** Text-analysis operator queries over the `documents` table — the
  * training-data-pipeline surface (language ID, quality scoring, token
  * counting, fingerprinting) the reference's lakehouse would need at 100 TB.
  *
  * All of `TextAnalysis` is built from codegen'd `functions._` combinators
  * (no UDFs), so these plans are single-pass, shuffle-free per-row maps —
  * they scale linearly with input splits. Each oracle mirrors the arithmetic
  * exactly (same op order, double math, global regex) so DuckDB hash-matches.
  */
object TextQueries {

  /** Token counting + punctuation density + document fingerprint (rolling
    * normalized-text hash). Per-row, no shuffle. */
  val t01TokenStats = GraftQuery(
    "t01_token_stats",
    (s, dir) =>
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          tokenCount(col("text")).as("token_count"),
          length(col("text")).as("char_len"),
          punctCount(col("text")).as("punct_count"),
          fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS INT) AS token_count,
             CAST(length(text) AS INT) AS char_len,
             CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS INT) AS punct_count,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
      FROM documents
      ORDER BY doc_id"""))

  /** Stopword-hit language ID vs the dataset's labeled lang — confusion
    * matrix shape. Argmax with deterministic list-order tie-break. */
  val t02LangId = GraftQuery(
    "t02_lang_id",
    (s, dir) =>
      table(s, dir, "documents")
        .select(col("lang"), langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("doc_count"))
        .orderBy(col("lang"), col("lang_pred")),
    Some("""
      WITH scored AS (
        SELECT lang,
          len(list_filter(list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
              t -> t IN ('the','a','of','and','to','in','is','it','that','for'))) AS en_hits,
          len(list_filter(list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
              t -> t IN ('el','la','de','y','que','los','un','es','en','se'))) AS es_hits,
          len(list_filter(list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
              t -> t IN ('der','die','das','und','ist','ein','zu','den','mit','nicht'))) AS de_hits,
          len(list_filter(list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
              t -> t IN ('le','la','de','et','est','les','un','une','du','pour'))) AS fr_hits
        FROM documents),
      labeled AS (
        SELECT lang,
          CASE WHEN en_hits >= greatest(en_hits, es_hits, de_hits, fr_hits)
                    AND greatest(en_hits, es_hits, de_hits, fr_hits) >= 1 THEN 'en'
               WHEN es_hits >= greatest(en_hits, es_hits, de_hits, fr_hits)
                    AND greatest(en_hits, es_hits, de_hits, fr_hits) >= 1 THEN 'es'
               WHEN de_hits >= greatest(en_hits, es_hits, de_hits, fr_hits)
                    AND greatest(en_hits, es_hits, de_hits, fr_hits) >= 1 THEN 'de'
               WHEN fr_hits >= greatest(en_hits, es_hits, de_hits, fr_hits)
                    AND greatest(en_hits, es_hits, de_hits, fr_hits) >= 1 THEN 'fr'
               ELSE 'und' END AS lang_pred
        FROM scored)
      SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS doc_count
      FROM labeled
      GROUP BY lang, lang_pred
      ORDER BY lang, lang_pred"""))

  /** Quality score ∈ [0,1] (token volume + punctuation density + stopword
    * rate), bucketed to a distribution so the check is robust yet exact. */
  val t03Quality = GraftQuery(
    "t03_quality_score",
    (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id")),
    Some("""
      WITH base AS (
        SELECT doc_id,
          CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS DOUBLE) AS n_tok,
          CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
            / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
          CAST(len(list_filter(list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
            t -> t IN ('the','a','of','and','to','in','is','it','that','for',
                       'el','la','de','y','que','los','un','es','en','se',
                       'der','die','das','und','ist','ein','zu','den','mit','nicht',
                       'le','la','de','et','est','les','un','une','du','pour'))) AS DOUBLE) AS stop_hits
        FROM documents)
      SELECT doc_id,
             round(least(n_tok / 50.0, 1.0) * 0.4 + (1.0 - punct_ratio) * 0.3
                   + stop_hits / greatest(n_tok, 1.0) * 0.3, 6) AS quality
      FROM base
      ORDER BY doc_id"""))

  /** BPE-ish subword token counting next to whitespace words: the
    * LLM-budgeting view of document length (punctuation/digits cost
    * tokens). Same regex on both engines. */
  val t04BpeTokens = GraftQuery(
    "t04_bpe_token_count",
    (s, dir) =>
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          tokenCount(col("text")).as("word_count"),
          bpeIshTokenCount(col("text")).as("bpe_ish_count"))
        .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS INT) AS word_count,
             CAST(len(regexp_extract_all(text, '$BpeIshPattern', 0)) AS INT) AS bpe_ish_count
      FROM documents
      ORDER BY doc_id"""))

  /** TF-IDF top terms per document: tokenize → term frequencies → document
    * frequencies → idf join → top-3 terms by tf·idf (ties broken on term).
    *
    * Scale shape — each stage picks the no-shuffle option where one exists:
    *   - tf is PER-ROW (a document's tokens all live in its own row):
    *     [[graft.sql.TokenCounts]] computes the term→count map in one
    *     compiled pass and `explode(map)` yields (doc, term, tf) with NO
    *     exchange. The relational spelling (explode tokens → groupBy) would
    *     shuffle the per-doc vocabulary of every document.
    *   - df aggregates those rows by term — vocabulary-sized shuffle with
    *     map-side combine (unavoidable: df is a corpus-global statistic).
    *   - idf joins back BROADCAST (vocabulary ≪ corpus — the standard
    *     regime; if a corpus ever breaks that, this join degrades to a hash
    *     join on term, still skew-free since tf rows are distinct per doc).
    *   - per-doc top-3 via the bounded [[graft.sql.TopKStrings]] partial
    *     aggregate: each map task ships ≤ 3 (term, score) pairs per doc;
    *     the window idiom would shuffle every (doc, term) pair.
    * Natural log on both engines; scores rounded after ranking on exact
    * doubles. */
  val t05TfIdf = GraftQuery(
    "t05_tfidf_top_terms",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      // corpus size as a broadcast 1-row scalar, not a driver-side action —
      // the whole query stays one lazy plan
      val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      def tokenCounts(c: org.apache.spark.sql.Column) = org.apache.spark.sql.graft.ColumnShim.column(
        graft.sql.TokenCounts(org.apache.spark.sql.graft.ColumnShim.expression(c)))
      val tf = docs.select(col("doc_id"),
        explode(tokenCounts(tokens(lower(col("text"))))).as(Seq("term", "tf")))
      val df = tf.groupBy(col("term"))
        .agg(count(lit(1)).as("doc_freq"))
        .crossJoin(broadcast(nDocs))
        .withColumn("idf", log((col("n_docs") + 1.0) / (col("doc_freq") + lit(1.0))))
        .drop("n_docs")
      val scored = tf.join(broadcast(df), "term")
        .withColumn("tfidf", col("tf").cast("double") * col("idf"))
      val topAgg = org.apache.spark.sql.graft.ColumnShim.column(
        graft.sql.TopKStrings(
          org.apache.spark.sql.graft.ColumnShim.expression(col("tfidf")),
          org.apache.spark.sql.graft.ColumnShim.expression(col("term")),
          3).toAggregateExpression())
      scored.groupBy(col("doc_id"))
        .agg(topAgg.as("top"))
        .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "hit")))
        .select(col("doc_id"), (col("pos") + 1).cast("bigint").as("rank"),
          col("hit.key").as("term"), round(col("hit.score"), 6).as("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""
      WITH terms AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
        FROM documents),
      tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM terms GROUP BY 1, 2),
      df AS (
        SELECT term, COUNT(*) AS doc_freq,
               ln(((SELECT COUNT(*) FROM documents) + 1.0) / (COUNT(*) + 1.0)) AS idf
        FROM tf GROUP BY term),
      scored AS (
        SELECT doc_id, term, CAST(tf AS DOUBLE) * idf AS tfidf
        FROM tf JOIN df USING (term)),
      ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
        FROM scored)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, round(tfidf, 6) AS tfidf
      FROM ranked
      WHERE rank <= 3
      ORDER BY doc_id, rank"""),
    bench = true)

  /** Sentence segmentation via the native [[graft.sql.SentenceSplit]]
    * Generator — row fan-out through the Generate operator (UDTF shape),
    * not a per-row array materialization. Oracle restates the same split
    * contract with row_number over the original order. */
  val t06Sentences = GraftQuery(
    "t06_sentence_split",
    (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          org.apache.spark.sql.graft.ColumnShim.column(
            graft.sql.SentenceSplit(
              org.apache.spark.sql.graft.ColumnShim.expression(col("text")))))
        .withColumn("sentence_len", length(col("sentence")))
        .orderBy(col("doc_id"), col("sentence_idx")),
    Some("""
      WITH parts AS (
        SELECT doc_id, i, trim(p[CAST(i AS INT)]) AS sentence
        FROM (SELECT doc_id, string_split_regex(text, '[.!?]+') AS p FROM documents),
             LATERAL unnest(range(1, len(p) + 1)) AS t(i)),
      kept AS (
        SELECT doc_id, sentence,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) AS INT) AS sentence_idx
        FROM parts WHERE sentence <> '')
      SELECT doc_id, sentence_idx, sentence, CAST(length(sentence) AS INT) AS sentence_len
      FROM kept
      ORDER BY doc_id, sentence_idx"""))

  /** Gopher-style repetition quality filter: type-token ratio, top-token
    * share, top-bigram share, and the keep/drop verdict a curation pipeline
    * would gate on. All per-row via the native TokenCounts map — no
    * shuffle, single pass over the corpus (the oracle recomputes counts the
    * O(n·distinct) relational way; the metrics are identical). */
  val t07RepetitionFilter = GraftQuery(
    "t07_repetition_filter",
    (s, dir) => {
      val toks = tokens(col("text"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          size(toks).as("n_tok"),
          round(distinctTokenFrac(toks), 6).as("distinct_frac"),
          round(topTokenFrac(toks), 6).as("top_word_frac"),
          round(topBigramFrac(toks), 6).as("top_bigram_frac"))
        .withColumn("keep",
          col("distinct_frac") >= 0.35 && col("top_bigram_frac") <= 0.12)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS t
        FROM documents),
      m AS (
        SELECT doc_id,
               CAST(len(t) AS INT) AS n_tok,
               round(CASE WHEN len(t) = 0 THEN 1.0
                     ELSE CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) END, 6) AS distinct_frac,
               round(CASE WHEN len(t) = 0 THEN 0.0
                     ELSE CAST(list_aggregate(list_transform(list_distinct(t),
                            w -> len(list_filter(t, x -> x = w))), 'max') AS DOUBLE)
                          / CAST(len(t) AS DOUBLE) END, 6) AS top_word_frac,
               round(CASE WHEN len(t) < 2 THEN 0.0
                     ELSE CAST(list_aggregate(list_transform(
                            list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])),
                            bg -> len(list_filter(
                              list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]),
                              x -> x = bg))), 'max') AS DOUBLE) * 2.0
                          / CAST(len(t) AS DOUBLE) END, 6) AS top_bigram_frac
        FROM toks)
      SELECT doc_id, n_tok, distinct_frac, top_word_frac, top_bigram_frac,
             (distinct_frac >= 0.35 AND top_bigram_frac <= 0.12) AS keep
      FROM m
      ORDER BY doc_id"""))

  /** Pattern redaction (the PII-scrub shape): count matches, scrub them,
    * fingerprint the scrubbed text. The corpus carries no synthetic PII, so
    * the oracle-checked instantiation scrubs a denylist term pattern that
    * DOES occur; the email/phone presets ([[TextAnalysis.redactEmails]])
    * share this exact code path and are spec-tested on synthetic PII
    * strings in TextAnalysisSpec. Pure per-row regexp — no shuffle. */
  val t08Redaction = GraftQuery(
    "t08_pattern_redaction",
    (s, dir) => {
      val pat = "\\b(key|value)\\b"
      table(s, dir, "documents")
        .select(col("doc_id"),
          patternHits(col("text"), pat).as("hits"),
          md5(redact(col("text"), pat, "<TOK>").cast("binary")).as("redacted_fp"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\b(key|value)\b', 0)) AS INT) AS hits,
             md5(regexp_replace(text, '\b(key|value)\b', '<TOK>', 'g')) AS redacted_fp
      FROM documents
      ORDER BY doc_id"""))

  /** Winnowing fingerprint (MOSS): distinct minima of every 8-window over
    * the rolling 5-gram hash sequence — any shared substring of length
    * ≥ 12 chars leaves a common hash, at ~22% of the full shingle-set
    * storage. The near-dup INDEX format for overlap detection at scale;
    * per-row map, no shuffle. Oracle restates the identical windows over
    * the identical portable polynomial hashes. The sorted hash set is
    * emitted as ONE comma-joined string, not an array column — flat-typed
    * output any row comparator can sort/hash (an array cell crashed the
    * r05 driver comparator's pandas sort). */
  val t09WinnowFingerprint = GraftQuery(
    "t09_winnow_fingerprint",
    (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws(",", winnowFingerprint(col("text"), k = 5, w = 8).cast("array<string>"))
            .as("fingerprint"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH codes_t AS (
        SELECT doc_id, ${DedupQueries.duckCodesSql} AS codes, text FROM documents),
      hs_t AS (
        SELECT doc_id, ${DedupQueries.duckShingleHashesN(5)} AS hs FROM codes_t)
      SELECT doc_id,
             array_to_string(list_transform(
               list_sort(list_distinct(list_transform(
                 range(1, greatest(len(hs) - 7, 1) + 1),
                 i -> list_aggregate(hs[i:i+7], 'min')))),
               x -> CAST(x AS VARCHAR)), ',') AS fingerprint
      FROM hs_t
      ORDER BY doc_id"""))

  /** BM25 retrieval scoring (Robertson/Lucene idf variant, k1=1.2,
    * b=0.75) for a fixed 3-term query: top 20 documents by score.
    *
    * Scale shape: ONE corpus pass computes the tiny stats row (N, avgdl,
    * per-term df) which broadcasts back; scoring is then per-row
    * arithmetic over the native [[graft.sql.TokenCounts]] term-frequency
    * map (tf lookups, no explode, no shuffle of token occurrences), and
    * the top-k is TakeOrderedAndProject. Both engines compute the
    * identical double formula; ranking compares the ROUNDED score. */
  val t10Bm25 = GraftQuery(
    "t10_bm25",
    (s, dir) =>
      graft.operators.TextAnalysis.bm25(table(s, dir, "documents"), "doc_id", "text",
          Seq("join", "filter", "customer"))
        .select(col("doc_id"), round(col("bm25"), 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20),
    Some("""
      WITH toks_t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        FROM documents),
      stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
               AVG(CAST(len(toks) AS DOUBLE)) AS avgdl,
               SUM(CASE WHEN list_contains(toks, 'join') THEN 1.0 ELSE 0.0 END) AS df_0,
               SUM(CASE WHEN list_contains(toks, 'filter') THEN 1.0 ELSE 0.0 END) AS df_1,
               SUM(CASE WHEN list_contains(toks, 'customer') THEN 1.0 ELSE 0.0 END) AS df_2
        FROM toks_t),
      scored AS (
        SELECT doc_id,
          ln((n_docs - df_0 + 0.5) / (df_0 + 0.5) + 1.0)
            * (CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) * 2.2)
            / (CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE)
               + 1.2 * (0.25 + 0.75 * CAST(len(toks) AS DOUBLE) / avgdl))
          + ln((n_docs - df_1 + 0.5) / (df_1 + 0.5) + 1.0)
            * (CAST(len(list_filter(toks, x -> x = 'filter')) AS DOUBLE) * 2.2)
            / (CAST(len(list_filter(toks, x -> x = 'filter')) AS DOUBLE)
               + 1.2 * (0.25 + 0.75 * CAST(len(toks) AS DOUBLE) / avgdl))
          + ln((n_docs - df_2 + 0.5) / (df_2 + 0.5) + 1.0)
            * (CAST(len(list_filter(toks, x -> x = 'customer')) AS DOUBLE) * 2.2)
            / (CAST(len(list_filter(toks, x -> x = 'customer')) AS DOUBLE)
               + 1.2 * (0.25 + 0.75 * CAST(len(toks) AS DOUBLE) / avgdl)) AS raw
        FROM toks_t, stats)
      SELECT doc_id, round(raw, 6) AS bm25
      FROM scored
      ORDER BY round(raw, 6) DESC, doc_id
      LIMIT 20"""))

  /** Unigram cross-entropy quality score — the CCNet-style "perplexity
    * filtering" signal with the corpus's own unigram model as the LM proxy:
    * xent(doc) = −Σ_t tf·ln(p(t)) / Σ_t tf, where p(t) is the corpus
    * unigram probability. Low = in-distribution prose, high = unusual
    * token mix; curation gates on it exactly like the t03 heuristic score.
    *
    * Scale shape: per-doc tf is the native per-row map (no token-occurrence
    * shuffle — explode emits one row per DISTINCT term per doc); the
    * vocabulary aggregate is a vocab-sized shuffle with map-side combine;
    * the unigram model broadcasts back. Cross-engine determinism: per-term
    * contributions are rounded to 9 decimals and summed as DECIMAL(28,9) —
    * exact, order-independent addition (the float-sum-order trap the
    * GraftQuery contract bans) — then one final double division. */
  val t11UnigramXent = GraftQuery(
    "t11_unigram_xent",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val docs = table(s, dir, "documents")
      val tf = docs.select(col("doc_id"),
        explode(termFreqs(tokens(lower(col("text"))))).as(Seq("term", "tf")))
      val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
      val tot = vocab.agg(sum(col("cnt")).cast("double").as("n_total"))
      val contrib = col("tf").cast("double") *
        log(col("cnt").cast("double") / col("n_total"))
      tf.join(broadcast(vocab), "term").crossJoin(broadcast(tot))
        .withColumn("c9", round(contrib, 9).cast(DecimalType(28, 9)))
        .groupBy(col("doc_id"))
        .agg(round(-sum(col("c9")).cast("double") / sum(col("tf")).cast("double"), 6)
          .as("unigram_xent"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH occurrences AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
        FROM documents),
      terms AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM occurrences GROUP BY doc_id, term),
      vocab AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM terms GROUP BY term),
      tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total FROM vocab),
      c AS (
        SELECT doc_id, tf,
               CAST(round(CAST(tf AS DOUBLE) * ln(CAST(cnt AS DOUBLE) / n_total), 9)
                 AS DECIMAL(28,9)) AS c9
        FROM terms JOIN vocab USING (term), tot)
      SELECT doc_id,
             round(-CAST(SUM(c9) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE), 6) AS unigram_xent
      FROM c GROUP BY doc_id
      ORDER BY doc_id""")).copy(bench = true)

  /** fastText-style hashed-feature linear quality classifier: each token
    * hashes to one of 1024 buckets and contributes a fixed integer
    * milli-weight; the document score is the integer sum (one fused codegen
    * pass — [[graft.sql.HashedLinearScore]]), the decision is its sign.
    * The weight table here is a fixed pseudo-random projection — the engine
    * owns the hashing/scoring plumbing; swapping in trained weights changes
    * a broadcast array, not the plan. Integer summation keeps the score
    * independent of token order and partitioning, so the oracle restates it
    * exactly — the checked output is all-integer, no float rounding at all.
    * Per-row, shuffle-free — scores 100 TB at scan speed. */
  val t12QualityClassifier = GraftQuery(
    "t12_quality_classifier",
    (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          hashedLinearScoreMilli(col("toks")).as("score_milli"))
        .select(col("doc_id"), col("n_tokens"), col("score_milli"),
          (col("score_milli") > 0).as("keep"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
        FROM documents),
      scored AS (
        SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
               CAST(COALESCE(list_sum(list_transform(t, tok ->
                 ((${DedupQueries.duckPoly(
                   "list_transform(range(1, length(tok)+1), i -> CAST(ascii(substr(tok, CAST(i AS INT), 1)) AS BIGINT))")}
                   % ${ClassifierDim}) * ${graft.sql.HashedLinearScore.Mix})
                   % ${graft.sql.HashedLinearScore.P} % 2001 - 1000)), 0) AS BIGINT) AS score_milli
        FROM toks)
      SELECT doc_id, n_tokens, score_milli,
             score_milli > 0 AS keep
      FROM scored
      ORDER BY doc_id"""))

  /** Bigram conditional cross-entropy under the corpus model
    * (−Σ tf·ln P(w₂|w₁) / Σ tf) — the next-order CCNet-style perplexity
    * proxy above t11: low = in-distribution word SEQUENCES, catching
    * shuffled/boilerplate text whose unigram profile looks normal.
    *
    * Same scale shape as t11: per-doc bigram tf is the native per-row map
    * over [[wordBigrams]] (one row per DISTINCT bigram per doc — no
    * occurrence shuffle), the model is a vocab-sized aggregate broadcast
    * back (a production deployment prunes it to top-K bigrams, same as
    * t11's note), and per-bigram contributions are rounded to 9 decimals
    * and summed as DECIMAL(28,9) — exact, order-independent. Docs with
    * < 2 tokens have no bigrams and surface with a NULL score (left join
    * keeps the output total over the corpus). */
  val t13BigramXent = GraftQuery(
    "t13_bigram_xent",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val docs = table(s, dir, "documents")
      val tf = docs.select(col("doc_id"),
        explode(termFreqs(wordBigrams(tokens(lower(col("text")))))).as(Seq("bg", "tf")))
      val model = tf.groupBy(col("bg")).agg(sum(col("tf")).as("cnt_bg"))
        .withColumn("w1", substring_index(col("bg"), " ", 1))
      val prefix = model.groupBy(col("w1")).agg(sum(col("cnt_bg")).as("cnt_w1"))
      val contrib = col("tf").cast("double") *
        log(col("cnt_bg").cast("double") / col("cnt_w1").cast("double"))
      val perDoc = tf.join(broadcast(model), "bg").join(broadcast(prefix), "w1")
        .withColumn("c9", round(contrib, 9).cast(DecimalType(28, 9)))
        .groupBy(col("doc_id"))
        .agg(round(-sum(col("c9")).cast("double") / sum(col("tf")).cast("double"), 6)
          .as("bigram_xent"))
      docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS t
        FROM documents),
      bgs AS (
        SELECT doc_id,
               unnest(CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)),
                   i -> t[CAST(i AS INT)] || ' ' || t[CAST(i+1 AS INT)])
                 ELSE [] END) AS bg
        FROM toks),
      tf AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS tf FROM bgs GROUP BY 1, 2),
      model AS (SELECT bg, CAST(SUM(tf) AS BIGINT) AS cnt_bg FROM tf GROUP BY bg),
      prefix AS (
        SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(cnt_bg) AS BIGINT) AS cnt_w1
        FROM model GROUP BY 1),
      c AS (
        SELECT tf.doc_id, tf.tf,
               CAST(round(CAST(tf.tf AS DOUBLE)
                 * ln(CAST(m.cnt_bg AS DOUBLE) / CAST(p.cnt_w1 AS DOUBLE)), 9)
                 AS DECIMAL(28,9)) AS c9
        FROM tf JOIN model m USING (bg)
        JOIN prefix p ON split_part(tf.bg, ' ', 1) = p.w1),
      x AS (
        SELECT doc_id,
               round(-CAST(SUM(c9) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE), 6) AS bigram_xent
        FROM c GROUP BY doc_id)
      SELECT d.doc_id, x.bigram_xent
      FROM documents d LEFT JOIN x USING (doc_id)
      ORDER BY d.doc_id"""))

  /** Corpus rank-frequency (Zipf) statistics: vocabulary size, total
    * tokens, and the log-log OLS slope over the top-100 terms — the
    * standard corpus-health diagnostic (natural text ≈ −1; synthetic or
    * template-heavy corpora deviate hard).
    *
    * Determinism: the slope's log coordinates are rounded to 9 decimals and
    * summed as DECIMAL (the t11 pattern) — the OLS sums are exact and
    * order-independent, so the slope hash-matches cross-engine. Scale
    * shape: term counting is one map-combined hash agg; the top-100 cut is
    * `orderBy.limit` (TakeOrdered — each map task ships ≤100 rows), and
    * ranking happens on the 100-row result, never on the full vocabulary. */
  val t14ZipfSlope = GraftQuery(
    "t14_zipf_slope",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = org.apache.spark.sql.types.DecimalType(18, 9)
      val freqs = table(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      val top = freqs.orderBy(col("freq").desc, col("term").asc).limit(100)
      val ranked = top
        .withColumn("rank", row_number().over(
          Window.orderBy(col("freq").desc, col("term").asc)))
        .withColumn("x", round(log(col("rank").cast("double")), 9).cast(dec))
        .withColumn("y", round(log(col("freq").cast("double")), 9).cast(dec))
      val sums = ranked.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
        max(when(col("rank") === 1, col("term"))).as("top_term"),
        max(when(col("rank") === 1, col("freq"))).as("top_freq"))
      val corpus = freqs.agg(
        count(lit(1)).as("vocab_size"), sum(col("freq")).as("total_tokens"))
      corpus.crossJoin(broadcast(sums)).select(
        col("vocab_size"), col("total_tokens"), col("top_term"), col("top_freq"),
        round((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")), 6)
          .as("zipf_slope"))
    },
    Some("""
      WITH toks AS (
        SELECT list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS t
        FROM documents),
      f AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(t) AS term FROM toks)
        GROUP BY term),
      top AS (
        SELECT term, freq,
               row_number() OVER (ORDER BY freq DESC, term ASC) AS rank
        FROM f ORDER BY freq DESC, term ASC LIMIT 100),
      xy AS (
        SELECT term, freq, rank,
               CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
               CAST(round(ln(CAST(freq AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
        FROM top),
      s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx, SUM(x*y) AS sxy,
               max(CASE WHEN rank = 1 THEN term END) AS top_term,
               max(CASE WHEN rank = 1 THEN freq END) AS top_freq
        FROM xy),
      v AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(freq) AS BIGINT) AS total_tokens
        FROM f)
      SELECT v.vocab_size, v.total_tokens, s.top_term, s.top_freq,
             round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope
      FROM v, s"""))

  /** Document novelty / uniqueness scoring: the fraction of a document's
    * distinct word 8-grams that appear in NO other document (corpus
    * df = 1) — the uniqueness signal curation pipelines weigh against
    * boilerplate mass (a doc of template text scores ~0, original prose
    * ~1). Same n-gram machinery as c19's overlap matrix, pointed at
    * per-document df instead of per-source pairs.
    *
    * Scale shape: distinct (doc, gram) explode → ONE gram-keyed df
    * aggregate → join back on gram → per-doc counts; both shuffles key on
    * the gram/doc, no hot keys (a gram's fan-out IS its df, and the
    * novelty signal only needs df=1 vs df>1). Docs with < 8 tokens emit
    * no grams and are absent — deterministic on both engines. */
  val t15Novelty = GraftQuery(
    "t15_novelty",
    (s, dir) => {
      val grams = table(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(
          graft.operators.TextAnalysis.wordNgrams(
            graft.operators.TextAnalysis.tokens(col("text")), 8))).as("gram"))
      val dfreq = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      grams.join(dfreq, "gram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
        .withColumn("novelty", round(col("n_unique") / col("n_grams"), 6))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS t
        FROM documents),
      g0 AS (
        SELECT doc_id,
               unnest(list_transform(range(0, greatest(len(t) - 7, 0)),
                 i -> array_to_string(list_slice(t, CAST(i+1 AS INT), CAST(i+8 AS INT)), ' '))) AS gram
        FROM toks),
      g AS (SELECT DISTINCT doc_id, gram FROM g0),
      dfreq AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM g GROUP BY gram),
      agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
        FROM g JOIN dfreq USING (gram)
        GROUP BY doc_id)
      SELECT doc_id, n_grams, n_unique,
             round(CAST(n_unique AS DOUBLE) / n_grams, 6) AS novelty
      FROM agg
      ORDER BY doc_id"""))

  /** Blocklist phrase filtering: token-boundary multi-word phrase hits per
    * document — boilerplate markers, policy phrases, eval canaries. The
    * oracle enumerates every token position per (doc, phrase) pair and
    * slice-compares (the naive quadratic scan); the engine runs the
    * inverted first-token broadcast join of [[TextAnalysis.phraseHits]],
    * so the hash match proves the shapes equivalent. One phrase is absent
    * from the corpus by construction (no-match path). */
  val t16Blocklist = GraftQuery(
    "t16_blocklist_phrases",
    (s, dir) =>
      graft.operators.TextAnalysis.phraseHits(
          table(s, dir, "documents"), "doc_id", "text",
          Seq("table hash", "customer join", "slow query", "lorem ipsum dolor"))
        .orderBy(col("doc_id"), col("phrase")),
    Some("""
      WITH p AS (
        SELECT * FROM (VALUES ('table hash'), ('customer join'), ('slow query'),
                              ('lorem ipsum dolor')) AS t(phrase)),
      pt AS (
        SELECT phrase, list_filter(string_split_regex(phrase, '\s+'), t -> t <> '') AS ptoks
        FROM p),
      toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        FROM documents),
      hits AS (
        SELECT d.doc_id, pt.phrase, CAST(i + 1 AS BIGINT) AS pos
        FROM toks d, pt, range(0, 100000) r(i)
        WHERE i + len(pt.ptoks) <= len(d.toks)
          AND list_slice(d.toks, CAST(i + 1 AS INT), CAST(i + len(pt.ptoks) AS INT)) = pt.ptoks)
      SELECT doc_id, phrase, CAST(COUNT(*) AS BIGINT) AS n_hits, MIN(pos) AS first_pos
      FROM hits
      GROUP BY doc_id, phrase
      ORDER BY doc_id, phrase"""))

  /** Pairwise source-vocabulary JS divergence ([[TextAnalysis
    * .sourceJsDivergence]]): the mixture-design distance matrix. The
    * oracle replays probabilities, the intersection-join terms, AND the
    * algebraic disjoint-mass recovery — value-for-value. */
  val t17JsDivergence = GraftQuery(
    "t17_source_js_divergence",
    (s, dir) =>
      graft.operators.TextAnalysis.sourceJsDivergence(
          table(s, dir, "documents"), "source", "text")
        .orderBy(col("src_a"), col("src_b")),
    Some("""
      WITH counts AS (
        SELECT source AS src, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT source,
                unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS tok
              FROM documents)
        GROUP BY source, tok),
      totals AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS tot FROM counts GROUP BY src),
      probs AS (
        SELECT c.src, c.tok, CAST(c.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
        FROM counts c JOIN totals t USING (src)),
      joined AS (
        SELECT a.src AS src_a, b.src AS src_b,
               CAST(round(a.p * ln(2.0 * a.p / (a.p + b.p))
                        + b.p * ln(2.0 * b.p / (a.p + b.p)), 9) AS DECIMAL(28,9)) AS term,
               CAST(round(a.p, 9) AS DECIMAL(28,9)) AS pa9,
               CAST(round(b.p, 9) AS DECIMAL(28,9)) AS pb9
        FROM probs a JOIN probs b ON a.tok = b.tok AND a.src < b.src)
      SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_common_tokens,
             round(0.5 * (CAST(SUM(term) AS DOUBLE)
                        + (1.0 - CAST(SUM(pa9) AS DOUBLE)) * ln(2.0)
                        + (1.0 - CAST(SUM(pb9) AS DOUBLE)) * ln(2.0)), 6) AS js
      FROM joined
      GROUP BY src_a, src_b
      ORDER BY src_a, src_b"""))

  /** MATTR lexical diversity (Covington & McFall 2010, moving-average
    * type-token ratio): mean distinct-fraction over every sliding 50-token
    * window — unlike t07's GLOBAL distinct_frac, MATTR is length-invariant,
    * the property that makes it usable as a corpus-wide quality filter.
    * Docs shorter than the window fall back to plain TTR. Per-row
    * higher-order functions only (transform/sequence/slice/array_distinct —
    * all codegen'd): no shuffle, no UDF; the window-distinct sums are
    * integers so the oracle restates the arithmetic exactly. The O(n·w)
    * per-row cost is a constant-factor scan at any corpus size. */
  val t18Mattr = GraftQuery(
    "t18_mattr",
    (s, dir) => {
      val toks = tokens(lower(col("text")))
      val n = size(toks)
      val ttr = size(array_distinct(toks)).cast("double") / n.cast("double")
      table(s, dir, "documents")
        .select(col("doc_id"), n.as("n_tok"),
          when(n > 0, round(ttr, 6)).as("ttr"),
          round(mattr(toks, 50), 6).as("mattr"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
        FROM documents)
      SELECT doc_id,
             CAST(len(tk) AS INT) AS n_tok,
             CASE WHEN len(tk) > 0
                  THEN round(CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE), 6)
             END AS ttr,
             CASE WHEN len(tk) >= 50 THEN
                    round(CAST(list_aggregate(list_transform(range(1, len(tk) - 48),
                            i -> CAST(len(list_distinct(list_slice(tk, i, i + 49))) AS BIGINT)), 'sum') AS DOUBLE)
                          / (CAST(len(tk) - 49 AS DOUBLE) * 50), 6)
                  WHEN len(tk) > 0
                  THEN round(CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE), 6)
             END AS mattr
      FROM t
      ORDER BY doc_id"""))

  /** RAKE keyword extraction (t19, Rose et al. 2010): candidate phrases are
    * the maximal runs between stopword delimiters; each word scores
    * degree/frequency over the doc's phrase occurrences (degree = sum of
    * containing-phrase lengths — co-occurrence weight); a phrase scores the
    * sum of its word scores, top-3 per doc with a total tie order. Every
    * shuffle is doc-keyed (word stats, phrase scores, the top-3 window) —
    * per-doc work bounded by doc length, linear across the corpus. Word
    * scores are round-9/DECIMAL-summed per phrase so the ranking and the
    * emitted score are engine-exact. */
  val t19RakeKeywords = GraftQuery(
    "t19_rake_keywords",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val stopRe = "\\b(?:the|a|of|and|to|in|is|it|that|for)\\b"
      val occ = table(s, dir, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), stopRe)).as("chunk"))
        .select(col("doc_id"), tokens(col("chunk")).as("words"))
        .filter(size(col("words")) > 0)
        .select(col("doc_id"), col("words"),
          array_join(col("words"), " ").as("phrase"), size(col("words")).as("n_words"))
      val wstat = occ
        .select(col("doc_id"), col("n_words"), explode(col("words")).as("word"))
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("freq"), sum(col("n_words")).as("degree"))
      val scored = occ.dropDuplicates("doc_id", "phrase")
        .select(col("doc_id"), col("phrase"), explode(col("words")).as("word"))
        .join(wstat, Seq("doc_id", "word"))
        .groupBy(col("doc_id"), col("phrase"))
        .agg(sum(round(col("degree").cast("double") / col("freq").cast("double"), 9)
          .cast(DecimalType(28, 9))).as("s9"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("s9").desc, col("phrase").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast("bigint").as("rank"), col("phrase"),
          round(col("s9").cast("double"), 6).as("rake_score"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""
      WITH phr AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(text),
                 '\b(?:the|a|of|and|to|in|is|it|that|for)\b')) AS chunk
        FROM documents),
      occ AS (
        SELECT doc_id,
               list_filter(string_split_regex(chunk, '\s+'), t -> t <> '') AS words
        FROM phr),
      pnz AS (
        SELECT doc_id, words, array_to_string(words, ' ') AS phrase,
               CAST(len(words) AS BIGINT) AS n_words
        FROM occ WHERE len(words) > 0),
      wstat AS (
        SELECT doc_id, w AS word,
               CAST(COUNT(*) AS BIGINT) AS freq, CAST(SUM(n_words) AS BIGINT) AS degree
        FROM (SELECT doc_id, n_words, unnest(words) AS w FROM pnz) z
        GROUP BY doc_id, w),
      dp AS (SELECT DISTINCT doc_id, phrase, words FROM pnz),
      score AS (
        SELECT t.doc_id, t.phrase,
               SUM(CAST(round(CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE), 9)
                 AS DECIMAL(28,9))) AS s9
        FROM (SELECT doc_id, phrase, unnest(words) AS w FROM dp) t
        JOIN wstat ON t.doc_id = wstat.doc_id AND t.w = wstat.word
        GROUP BY t.doc_id, t.phrase),
      ranked AS (
        SELECT doc_id, phrase, s9,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY s9 DESC, phrase ASC) AS rank
        FROM score)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, phrase,
             round(CAST(s9 AS DOUBLE), 6) AS rake_score
      FROM ranked
      WHERE rank <= 3
      ORDER BY doc_id, rank"""))

  /** Stupid-backoff bigram LM score under a HELD-OUT model (Brants et al.
    * 2007): the model is trained on the md5-hash half of the corpus and
    * scores EVERY document — unlike t13 (model = scored corpus), unseen
    * bigrams genuinely occur, which is the shape of real perplexity
    * filtering where the LM is trained on a reference corpus (CCNet trains
    * on Wikipedia and scores Common Crawl). Per bigram occurrence:
    * P = cnt(w₁w₂)/cnt(w₁·) when the model saw the bigram, else backoff
    * 0.4·(cnt(w₂)+1)/(N+V) (add-one smoothed unigram — also covers
    * words the model never saw). Score = −Σ tf·ln P / Σ tf; NULL for
    * < 2-token docs.
    *
    * Scale shape: same as t11/t13 — per-doc bigram tf is the native
    * per-row map (no occurrence shuffle), the trained model is a
    * vocab-sized aggregate over HALF the corpus broadcast back, and
    * contributions are rounded to 9 decimals and summed as DECIMAL(28,9)
    * (exact, order-independent). The train-half filter is the c14 md5 rule
    * — a pure per-row predicate, so "train the model" is one scan-side
    * subset, not a separate pipeline. */
  val t20BackoffXent = GraftQuery(
    "t20_backoff_xent",
    (s, dir) =>
      heldOutBackoffXent(table(s, dir, "documents"), "doc_id", "text", trainRate = 0.5)
        .orderBy(col("doc_id")),
    Some {
      val t50 = Curation.rateThreshold(0.5)
      s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
        FROM documents),
      train AS (
        SELECT * FROM toks
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '$t50'),
      tr_occ AS (SELECT unnest(t) AS term FROM train),
      uni AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt_w2 FROM tr_occ GROUP BY term),
      totals AS (
        SELECT CAST(SUM(cnt_w2) AS DOUBLE) AS n_train,
               CAST(COUNT(*) AS DOUBLE) AS v_train
        FROM uni),
      tr_bgs AS (
        SELECT unnest(CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)),
                   i -> t[CAST(i AS INT)] || ' ' || t[CAST(i+1 AS INT)])
                 ELSE [] END) AS bg
        FROM train),
      bg_model AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt_bg FROM tr_bgs GROUP BY bg),
      prefix AS (
        SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(cnt_bg) AS BIGINT) AS cnt_w1
        FROM bg_model GROUP BY 1),
      bgs AS (
        SELECT doc_id,
               unnest(CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)),
                   i -> t[CAST(i AS INT)] || ' ' || t[CAST(i+1 AS INT)])
                 ELSE [] END) AS bg
        FROM toks),
      tf AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS tf FROM bgs GROUP BY 1, 2),
      c AS (
        SELECT tf.doc_id, tf.tf,
               CAST(round(CAST(tf.tf AS DOUBLE) * ln(
                 CASE WHEN m.cnt_bg IS NOT NULL
                      THEN CAST(m.cnt_bg AS DOUBLE) / CAST(p.cnt_w1 AS DOUBLE)
                      ELSE 0.4 * (CAST(COALESCE(u.cnt_w2, 0) AS DOUBLE) + 1.0)
                           / (t.n_train + t.v_train) END), 9)
                 AS DECIMAL(28,9)) AS c9
        FROM tf
        LEFT JOIN bg_model m USING (bg)
        LEFT JOIN prefix p ON split_part(tf.bg, ' ', 1) = p.w1
        LEFT JOIN uni u ON split_part(tf.bg, ' ', 2) = u.term,
        totals t),
      x AS (
        SELECT doc_id,
               round(-CAST(SUM(c9) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE), 6) AS backoff_xent
        FROM c GROUP BY doc_id)
      SELECT d.doc_id, x.backoff_xent
      FROM documents d LEFT JOIN x USING (doc_id)
      ORDER BY d.doc_id"""
    }).copy(bench = true)

  /** Per-language tokenizer fertility (t21): BPE-ish subword tokens per
    * whitespace word and per character, by language — the budgeting stat
    * that decides how many TRAINING tokens a language's bytes actually
    * cost (fertility ≫ 1 languages eat budget; the standard multilingual
    * tokenizer-health metric). Sums are exact BIGINTs (ratios computed
    * once at the end), one lang-keyed agg over a single scan — the t04
    * per-row counters aggregated one level up. */
  val t21TokenizerFertility = GraftQuery(
    "t21_tokenizer_fertility",
    (s, dir) =>
      table(s, dir, "documents")
        .select(col("lang"),
          tokenCount(col("text")).cast("bigint").as("words"),
          bpeIshTokenCount(col("text")).cast("bigint").as("bpe"),
          length(col("text")).cast("bigint").as("chars"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("bpe")).as("bpe_tokens"),
          sum(col("words")).as("word_tokens"),
          round(sum(col("bpe")).cast("double") / sum(col("words")).cast("double"), 6)
            .as("fertility"),
          round(sum(col("bpe")).cast("double") / sum(col("chars")).cast("double"), 6)
            .as("tokens_per_char"))
        .orderBy(col("lang")),
    Some(s"""
      WITH base AS (
        SELECT lang,
               CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS words,
               CAST(len(regexp_extract_all(text, '$BpeIshPattern', 0)) AS BIGINT) AS bpe,
               CAST(length(text) AS BIGINT) AS chars
        FROM documents)
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
             CAST(SUM(words) AS BIGINT) AS word_tokens,
             round(CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(words) AS DOUBLE), 6) AS fertility,
             round(CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(chars) AS DOUBLE), 6) AS tokens_per_char
      FROM base
      GROUP BY lang
      ORDER BY lang"""))

  /** Gopher-style composite document quality rules (t22, Rae et al. 2021
    * §A1.1, thresholds scaled to the fixture's short docs): word count in
    * [10, 1000], mean word length in [3, 10], symbol-to-word ratio ('#'
    * chars + '...' runs) ≤ 0.1, ≥ 80% of words containing an alphabetic
    * character, and ≥ 2 distinct English stopwords present (the
    * boilerplate/gibberish gate). Emits each metric AND each rule verdict
    * so a pipeline can audit WHICH rule kills a doc, plus the composite
    * keep. Pure per-row map over one scan — scan-speed at any scale; every
    * metric is integer arithmetic divided once, so the oracle matches
    * exactly. */
  val t22GopherRules = GraftQuery(
    "t22_gopher_rules",
    (s, dir) => {
      val toks = tokens(col("text"))
      val nw = size(toks).cast("bigint")
      val nwSafe = greatest(nw, lit(1L)).cast("double")
      val meanLen = aggregate(transform(toks, t => length(t)), lit(0),
        (acc, x) => acc + x).cast("double") / nwSafe
      val symbols = (length(regexp_replace(col("text"), "[^#]", "")) +
        (length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
        .cast("double")
      val symbolRatio = symbols / nwSafe
      val alphaFrac = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nwSafe
      val stopList = graft.operators.TextAnalysis.Stopwords.head._2
      val stopPresent = size(filter(lit(stopList.toArray),
        w => array_contains(toks, w))).cast("bigint")
      table(s, dir, "documents")
        .select(col("doc_id"), nw.as("n_words"),
          round(meanLen, 6).as("mean_word_len"),
          round(symbolRatio, 6).as("symbol_ratio"),
          round(alphaFrac, 6).as("alpha_frac"),
          stopPresent.as("stop_present"),
          (nw >= 10 && nw <= 1000).as("r_words"),
          (meanLen >= 3.0 && meanLen <= 10.0).as("r_word_len"),
          (symbolRatio <= 0.1).as("r_symbols"),
          (alphaFrac >= 0.8).as("r_alpha"),
          (stopPresent >= 2).as("r_stopwords"))
        .withColumn("keep",
          col("r_words") && col("r_word_len") && col("r_symbols")
            && col("r_alpha") && col("r_stopwords"))
        .orderBy(col("doc_id"))
    },
    Some {
      val stopSql = graft.operators.TextAnalysis.Stopwords.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""
      WITH base AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
        FROM documents),
      m AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_words,
               CAST(GREATEST(len(t), 1) AS DOUBLE) AS nw_safe,
               CAST(COALESCE(list_aggregate(list_transform(t, tok -> length(tok)), 'sum'), 0) AS DOUBLE) AS len_sum,
               CAST(length(regexp_replace(text, '[^#]', '', 'g'))
                 + (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) // 3
                 AS DOUBLE) AS symbols,
               CAST(len(list_filter(t, tok -> regexp_matches(tok, '[A-Za-z]'))) AS DOUBLE) AS alpha_words,
               CAST(len(list_filter($stopSql, w -> list_contains(t, w))) AS BIGINT) AS stop_present
        FROM base),
      r AS (
        SELECT doc_id, n_words,
               len_sum / nw_safe AS mean_word_len_raw,
               symbols / nw_safe AS symbol_ratio_raw,
               alpha_words / nw_safe AS alpha_frac_raw,
               stop_present
        FROM m)
      SELECT doc_id, n_words,
             round(mean_word_len_raw, 6) AS mean_word_len,
             round(symbol_ratio_raw, 6) AS symbol_ratio,
             round(alpha_frac_raw, 6) AS alpha_frac,
             stop_present,
             n_words >= 10 AND n_words <= 1000 AS r_words,
             mean_word_len_raw >= 3.0 AND mean_word_len_raw <= 10.0 AS r_word_len,
             symbol_ratio_raw <= 0.1 AS r_symbols,
             alpha_frac_raw >= 0.8 AS r_alpha,
             stop_present >= 2 AS r_stopwords,
             (n_words >= 10 AND n_words <= 1000)
               AND (mean_word_len_raw >= 3.0 AND mean_word_len_raw <= 10.0)
               AND symbol_ratio_raw <= 0.1
               AND alpha_frac_raw >= 0.8
               AND stop_present >= 2 AS keep
      FROM r
      ORDER BY doc_id"""
    })

  /** T5-style deterministic span corruption
    * ([[TextAnalysis.spanCorrupt]], Raffel et al. 2020 §3.1.4): 5-token
    * blocks, block b masked iff md5(doc:b) mod 100 < 15 — corruption is a
    * pure function of (doc, position), so every epoch/engine reproduces
    * it. The hash gate covers counts AND the md5 of the corrupted input
    * and sentinel target strings, so block slicing, sentinel ordinals and
    * join spacing are all value-pinned. Per-row HOF work, no shuffle. */
  val t23SpanCorruption = GraftQuery(
    "t23_span_corruption",
    (s, dir) =>
      spanCorrupt(table(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("n_blocks"),
          col("n_sentinels"), col("n_masked_tokens"),
          md5(col("corrupted").cast("binary")).as("corrupted_md5"),
          md5(col("target").cast("binary")).as("target_md5"))
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        FROM documents),
      b AS (
        SELECT doc_id, toks, len(toks) AS n,
               CAST(ceil(len(toks) / 5.0) AS INT) AS nb
        FROM t),
      f AS (
        SELECT doc_id, toks, n, nb,
               list_transform(range(0, nb), bi ->
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                    CAST(bi AS VARCHAR)), 1, 8))::BIGINT % 100 < 15) AS flags
        FROM b)
      SELECT doc_id,
             CAST(n AS INT) AS n_tokens,
             nb AS n_blocks,
             CAST(len(list_filter(flags, x -> x)) AS INT) AS n_sentinels,
             CAST(coalesce(list_sum(list_transform(range(0, nb), bi ->
               CASE WHEN flags[CAST(bi AS INT) + 1]
                 THEN least(5, n - bi * 5) ELSE 0 END)), 0) AS INT) AS n_masked_tokens,
             md5(coalesce(array_to_string(list_transform(range(0, nb), bi ->
               CASE WHEN flags[CAST(bi AS INT) + 1]
                 THEN '<extra_id_' || CAST(len(list_filter(flags[1:CAST(bi AS INT)],
                   x -> x)) AS VARCHAR) || '>'
                 ELSE array_to_string(list_slice(toks, CAST(bi AS INT) * 5 + 1,
                   CAST(bi AS INT) * 5 + 5), ' ')
               END), ' '), '')) AS corrupted_md5,
             md5(coalesce(array_to_string(list_transform(
               list_filter(range(0, nb), bi -> flags[CAST(bi AS INT) + 1]), bi ->
               '<extra_id_' || CAST(len(list_filter(flags[1:CAST(bi AS INT)],
                 x -> x)) AS VARCHAR) || '> ' ||
               array_to_string(list_slice(toks, CAST(bi AS INT) * 5 + 1,
                 CAST(bi AS INT) * 5 + 5), ' ')), ' '), '')) AS target_md5
      FROM f
      ORDER BY doc_id"""))

  val all: Seq[GraftQuery] =
    Seq(t01TokenStats, t02LangId, t03Quality, t04BpeTokens, t05TfIdf, t06Sentences,
      t07RepetitionFilter, t08Redaction, t09WinnowFingerprint, t10Bm25,
      t11UnigramXent, t12QualityClassifier, t13BigramXent, t14ZipfSlope,
      t15Novelty, t16Blocklist, t17JsDivergence, t18Mattr, t19RakeKeywords,
      t20BackoffXent, t21TokenizerFertility, t22GopherRules, t23SpanCorruption)
}
