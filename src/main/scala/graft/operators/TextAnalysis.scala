package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting.
  *
  * Everything here is a pure `Column` combinator over built-in codegen'd
  * functions — no UDFs — so plans stay inside whole-stage codegen and
  * distribute trivially (per-row, no shuffle).
  */
object TextAnalysis {

  /** Whitespace tokenizer (regex split, empty tokens dropped).
    * `array_remove(_, "")` rather than the HOF `filter(_ =!= "")`: the two
    * are value-identical on split output (split arrays carry no nulls, and
    * removal equals the ≠"" predicate), but ArrayRemove is codegen'd while
    * ArrayFilter is CodegenFallback — a HOF here would interpret once per
    * row in every text query's hot path. */
  def tokens(text: Column): Column =
    array_remove(split(text, "\\s+"), "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segmentation regex: word pieces (letter runs), number
    * runs, and single non-space symbols — the pre-tokenization split GPT-2
    * style BPE applies before merges. Counting these approximates LLM token
    * counts far better than whitespace words (punctuation and numbers cost
    * tokens). Portable POSIX classes so the oracle regex is identical. */
  val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Count of BPE-ish pieces via regexp_extract_all (codegen'd, per-row). */
  def bpeIshTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeIshPattern), lit(0)))

  /** Characters that count as punctuation for quality scoring. */
  val PunctClass = "[^.,!?;:]"

  def punctCount(text: Column): Column =
    length(regexp_replace(text, PunctClass, ""))

  /** Per-language stopword lists for the n-gram/stopword language heuristic.
    * Deliberately small + fixed: the heuristic must be reproducible in the
    * oracle engine, not linguistically complete.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "un", "es", "en", "se"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "est", "les", "un", "une", "du", "pour"))

  /** Count of tokens belonging to `words` (duplicates counted). */
  def wordlistHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(w => w: Any): _*)))

  /** Stopword-count language ID: argmax over per-language hit counts with a
    * deterministic priority tie-break (list order), 'und' (undetermined) when
    * no list scores ≥ 1.
    */
  def langId(text: Column): Column = {
    val scores = Stopwords.map { case (lang, words) => lang -> wordlistHits(text, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), els) =>
      when(score >= best && best >= 1, lang).otherwise(els)
    }
  }

  /** Quality score ∈ [0,1]: token volume, low punctuation density, natural
    * stopword rate. Pure double arithmetic → engine-reproducible.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val punctRatio = punctCount(text).cast("double") / greatest(length(text), lit(1)).cast("double")
    val stopRatio = wordlistHits(text, Stopwords.flatMap(_._2)).cast("double") / greatest(nTok, lit(1.0))
    round(least(nTok / 50.0, lit(1.0)) * 0.4 + (lit(1.0) - punctRatio) * 0.3 + stopRatio * 0.3, 6)
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase text.
    * The exact-dedup key (Dedup.exactDedup groups on this).
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Winnowing fingerprint (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS algorithm): the distinct minima of every `w`-window over the
    * rolling `k`-gram hash sequence, sorted. Guarantees: any shared
    * substring of length ≥ w+k−1 contributes at least one common
    * fingerprint hash, while storage shrinks to ~2/(w+1) of the full
    * shingle set — the standard near-dup INDEX for plagiarism/overlap
    * detection at corpus scale (build an inverted index on ~22% of the
    * hashes instead of all of them).
    *
    * Selection by min VALUE makes the paper's tie-break rule moot for a
    * value-set fingerprint (equal candidates contribute the same hash), so
    * the composition below — windows via `sequence`, minima via
    * `slice`+`array_min`, all codegen'd built-ins — is exact, O(m·w) per
    * row with w constant. Per-row map, no shuffle, no UDF. The rolling
    * hash itself is the native [[graft.sql.ShingleHashes]] pass. */
  def winnowFingerprint(text: Column, k: Int = 5, w: Int = 8): Column = {
    require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
    val hs = Dedup.shingleHashes(text, k) // position-ordered, ≥1 entry
    val mins = transform(
      sequence(lit(0), greatest(size(hs) - w, lit(0))),
      i => array_min(slice(hs, i + 1, lit(w))))
    array_sort(array_distinct(mins))
  }

  // ---- repetition / quality-filter metrics (Gopher-style) -----------------

  /** Per-row term-frequency map via the native one-pass expression — the
    * building block for repetition metrics (no shuffle; the relational
    * explode+groupBy spelling would exchange every token occurrence). */
  def termFreqs(toks: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.sql.TokenCounts(org.apache.spark.sql.graft.ColumnShim.expression(toks)))

  /** Adjacent word bigrams as strings; empty array when < 2 tokens. */
  def wordBigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + lit(1)))))
      .otherwise(array().cast("array<string>"))

  /** Overlapping word n-grams as strings ([[wordBigrams]] generalized);
    * empty array when < n tokens. Codegen'd built-ins only. */
  def wordNgrams(toks: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Type-token ratio: distinct tokens / total tokens (1.0 for empty). */
  def distinctTokenFrac(toks: Column): Column =
    when(size(toks) === 0, lit(1.0))
      .otherwise(size(termFreqs(toks)).cast("double") / size(toks).cast("double"))

  /** Share of tokens taken by the single most frequent token. */
  def topTokenFrac(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(array_max(map_values(termFreqs(toks))).cast("double") / size(toks).cast("double"))

  /** Share of tokens covered by the most frequent adjacent bigram
    * (occurrences × 2 / tokens) — the classic repeated-phrase signal. */
  def topBigramFrac(toks: Column): Column =
    when(size(toks) < 2, lit(0.0))
      .otherwise(array_max(map_values(termFreqs(wordBigrams(toks)))).cast("double") * 2.0
        / size(toks).cast("double"))

  /** Stupid-backoff bigram LM score under a model trained on the md5-hash
    * `trainRate` fraction of the corpus (Brants et al. 2007), scoring EVERY
    * document: P = cnt(w₁w₂)/cnt(w₁·) for model bigrams, else
    * 0.4·(cnt(w₂)+1)/(N+V). Returns (idCol, backoff_xent) — NULL for
    * < 2-token docs. At trainRate = 1.0 every scored bigram is in the
    * model, so this reduces EXACTLY to the t13 conditional bigram
    * cross-entropy (the property the spec pins).
    *
    * Scale shape: per-doc bigram tf is the native per-row map, the trained
    * model is a vocab-sized aggregate over the train subset broadcast back,
    * contributions are rounded to 9 decimals and summed as DECIMAL(28,9)
    * (exact, order-independent). */
  def heldOutBackoffXent(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, trainRate: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.operators.Curation
    val toks = tokens(lower(col(textCol)))
    val train = docs.filter(
      substring(Curation.hashKey(col(idCol)), 1, 3) <
        lit(Curation.rateThreshold(trainRate)))
    val uni = train.select(explode(termFreqs(toks)).as(Seq("w2", "tf")))
      .groupBy(col("w2")).agg(sum(col("tf")).as("cnt_w2"))
    val totals = uni.agg(sum(col("cnt_w2")).cast("double").as("n_train"),
      count(lit(1)).cast("double").as("v_train"))
    val bgModel = train.select(explode(termFreqs(wordBigrams(toks))).as(Seq("bg", "tf")))
      .groupBy(col("bg")).agg(sum(col("tf")).as("cnt_bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val prefix = bgModel.groupBy(col("w1")).agg(sum(col("cnt_bg")).as("cnt_w1"))
    val tf = docs.select(col(idCol),
        explode(termFreqs(wordBigrams(toks))).as(Seq("bg", "tf")))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    val p = when(col("cnt_bg").isNotNull,
        col("cnt_bg").cast("double") / col("cnt_w1").cast("double"))
      .otherwise(lit(0.4) * (coalesce(col("cnt_w2"), lit(0L)).cast("double") + 1.0)
        / (col("n_train") + col("v_train")))
    val perDoc = tf
      .join(broadcast(bgModel.select(col("bg"), col("cnt_bg"), col("w1"))), Seq("bg"), "left")
      .join(broadcast(prefix), Seq("w1"), "left")
      .join(broadcast(uni), Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("c9", round(col("tf").cast("double") * log(p), 9)
        .cast(DecimalType(28, 9)))
      .groupBy(col(idCol))
      .agg(round(-sum(col("c9")).cast("double") / sum(col("tf")).cast("double"), 6)
        .as("backoff_xent"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
  }

  // ---- retrieval scoring --------------------------------------------------

  /** BM25 scores (Robertson/Lucene idf variant) for a fixed term list over
    * a (id, text) corpus: returns (idCol, bm25). ONE corpus pass computes
    * the stats row (N, avgdl, per-term df), broadcast back; scoring is
    * per-row arithmetic over the native [[termFreqs]] map — tf lookups,
    * no explode, no shuffle of token occurrences. Query terms are a
    * LITERAL list by design (a search/filter predicate, not data), which
    * is what keeps df computation a row-free aggregate. */
  def bm25(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = tokens(lower(col(textCol)))
    val statCols =
      count(lit(1)).cast("double").as("n_docs") +:
        avg(size(toks).cast("double")).as("avgdl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(toks, t), 1.0).otherwise(0.0)).as(s"df_$i")
        }
    val stats = docs.agg(statCols.head, statCols.tail: _*)
    val dl = size(toks).cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = coalesce(element_at(termFreqs(toks), lit(t)), lit(0L)).cast("double")
      val idf = log((col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5) + 1.0)
      idf * (tf * lit(k1 + 1.0)) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("avgdl")))
    }.reduce(_ + _)
    docs.crossJoin(broadcast(stats))
      .select(col(idCol), score.as("bm25"))
  }

  // ---- PII / pattern redaction --------------------------------------------

  /** Email address pattern, restricted to syntax both Java regex and RE2
    * (the oracle engine) interpret identically. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone pattern (3-3-4 digit groups with -, ., or
    * space separators, optional +1 / parenthesized area code). */
  val PhonePattern = "(\\+1[- .]?)?(\\([0-9]{3}\\)|[0-9]{3})[- .][0-9]{3}[- .][0-9]{4}"

  /** Count of non-overlapping matches of `pattern`. */
  def patternHits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Replace every match of `pattern` with `replacement` — the scrub
    * primitive behind PII redaction. Pure per-row regexp (codegen'd),
    * no shuffle. */
  def redact(text: Column, pattern: String, replacement: String): Column =
    regexp_replace(text, pattern, replacement)

  def redactEmails(text: Column): Column = redact(text, EmailPattern, "<EMAIL>")
  def redactPhones(text: Column): Column = redact(text, PhonePattern, "<PHONE>")

  // ---- within-document repetition removal ---------------------------------

  /** Within-document block dedup (the Gopher-style intra-doc repetition
    * CLEANER, where t07 is only the detector): split each document into
    * non-overlapping `blockTokens`-token blocks, keep the FIRST occurrence
    * of each distinct block, and rebuild the text in original order —
    * boilerplate that repeats inside one document (headers, navigation,
    * copy-paste loops) is removed without touching cross-document content.
    *
    * Returns (idCol, text_deduped, n_blocks, n_dropped). Pipeline: per-row
    * generate (block explode) → ONE window keyed by (doc, block) → ordered
    * rebuild keyed by doc. Both shuffles are doc-local (the doc id is in
    * every key), so the operator scales with documents, never corpus-wide
    * state — and block comparison is exact string equality, so an oracle
    * restates it verbatim. */
  def dedupBlocksWithinDoc(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      blockTokens: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(blockTokens > 0, s"blockTokens must be positive, got $blockTokens")
    val blocks = chunkWindows(df, idCol, textCol, size = blockTokens, stride = blockTokens)
      .select(col(idCol), col("chunk_idx"), col("chunk_text"))
    val firstSeen = Window.partitionBy(col(idCol), col("chunk_text"))
      .orderBy(col("chunk_idx"))
    blocks
      .withColumn("occ", row_number().over(firstSeen))
      .groupBy(col(idCol))
      .agg(
        array_join(array_sort(collect_list(when(col("occ") === 1,
            struct(col("chunk_idx"), col("chunk_text"))))).getField("chunk_text"), " ")
          .as("text_deduped"),
        count(lit(1)).as("n_blocks"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("n_dropped"))
  }

  // ---- hashed-feature linear classifier -----------------------------------

  /** Feature-space width of the hashed classifier (fixed so oracles restate
    * it; a real deployment sizes this to the trained model). */
  val ClassifierDim = 1024

  /** fastText-style quality-classifier score in integer milli-units: each
    * token hashes (portable poly hash) to one of [[ClassifierDim]] buckets
    * and contributes that bucket's fixed milli-weight; the result is the sum
    * as a LONG. One fused codegen pass per row
    * ([[graft.sql.HashedLinearScore]]) — no HOFs, no shuffle; integer
    * summation makes the score order- and partitioning-independent.
    * `hashedLinearScoreMilliHof` is the interpreted `functions._` parity
    * composition the spec checks value-identity against. */
  def hashedLinearScoreMilli(toks: Column, dim: Int = ClassifierDim): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.sql.HashedLinearScore(
        org.apache.spark.sql.graft.ColumnShim.expression(toks), dim))

  /** Interpreted HOF composition of the same score (parity-spec reference). */
  def hashedLinearScoreMilliHof(toks: Column, dim: Int = ClassifierDim): Column =
    aggregate(
      transform(toks, t =>
        (pmod(graft.operators.Dedup.polyHashStr(t), lit(dim.toLong)) * lit(graft.sql.HashedLinearScore.Mix))
          % lit(graft.sql.HashedLinearScore.P) % lit(2001L) - lit(1000L)),
      lit(0L), (acc, w) => acc + w)

  // ---- token-window chunking ----------------------------------------------

  /** RAG/training-style overlapping token-window chunking: split each
    * document's token array into windows of `size` tokens advancing by
    * `stride` (< size ⇒ overlap of size − stride tokens, so no boundary ever
    * cuts context that a window doesn't also see whole). Returns one row per
    * chunk: (idCol, chunk_idx, chunk_tokens, chunk_text).
    *
    * A document of n tokens yields `max(1, ⌈(n − size)/stride⌉ + 1)` chunks —
    * the last window may be short, and an empty document still yields its
    * one empty chunk (curation funnels count documents, not bytes).
    *
    * Per-row generate (`explode` over a `sequence`) + `slice`/`array_join`:
    * all codegen built-ins, no shuffle — chunking 100 TB is a map-only
    * stage that scales with input splits. */
  def chunkWindows(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val n = org.apache.spark.sql.functions.size(col("toks")).cast("long")
    val nChunks = greatest(lit(1L),
      ceil((n - lit(size.toLong)).cast("double") / lit(stride.toDouble)).cast("long") + lit(1L))
    val start = col("chunk_idx") * lit(stride.toLong)
    val chunk = slice(col("toks"), (start + lit(1L)).cast("int"), lit(size))
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0L), nChunks - lit(1L))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        org.apache.spark.sql.functions.size(chunk).as("chunk_tokens"),
        array_join(chunk, " ").as("chunk_text"))
  }

  /** CROSS-document block dedup (the corpus-level sibling of
    * [[dedupBlocksWithinDoc]], RefinedWeb-style exact substring removal at
    * block granularity): non-overlapping `blockTokens`-token blocks over
    * the whole corpus, only the globally FIRST occurrence of each distinct
    * block (ordered by (doc, position)) survives, and each document is
    * rebuilt from its surviving blocks in order. A block repeated inside
    * one document dedupes too — strict superset of the within-doc cleaner.
    *
    * Scale shape: chunking is map-only; the first-occurrence window is ONE
    * hash shuffle keyed on block CONTENT — the same shuffle exact dedup
    * (d01) does per document, at block granularity. Skew appears only if a
    * single block dominates the corpus (boilerplate); the mitigation is the
    * same df-cap used by d02/d09 — drop blocks above a document-frequency
    * ceiling to a separate boilerplate report before the window. The
    * rebuild groups by doc id (second shuffle, keyed on the doc).
    */
  def dedupBlocksAcrossDocs(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      blockTokens: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(blockTokens > 0, s"blockTokens must be positive, got $blockTokens")
    val blocks = chunkWindows(df, idCol, textCol, size = blockTokens, stride = blockTokens)
      .select(col(idCol), col("chunk_idx"), col("chunk_text"))
    val firstSeen = Window.partitionBy(col("chunk_text"))
      .orderBy(col(idCol), col("chunk_idx"))
    blocks
      .withColumn("occ", row_number().over(firstSeen))
      .groupBy(col(idCol))
      .agg(
        array_join(array_sort(collect_list(when(col("occ") === 1,
            struct(col("chunk_idx"), col("chunk_text"))))).getField("chunk_text"), " ")
          .as("text_deduped"),
        count(lit(1)).as("n_blocks"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Blocklist phrase matching: which documents contain which banned
    * multi-word phrases, on lowercase token boundaries ("big order" does
    * NOT match "big orders"). The filtering/compliance primitive of a
    * curation pipeline — boilerplate markers, policy phrases, eval-set
    * canaries.
    *
    * The naive spelling is |phrases| regexes per document — O(N·len) per
    * row, untenable when the blocklist is 10⁵ entries. This is the
    * inverted shape instead: documents explode to (pos, token) once,
    * FIRST tokens of the (broadcast) blocklist equi-join against them,
    * and each candidate position verifies the full phrase with one
    * `slice` comparison against the doc's token array. Work scales with
    * occurrences of first tokens, not phrases × documents, and the
    * blocklist join is a broadcast — the corpus never shuffles; all of a
    * document's exploded rows stay in its input partition, so the partial
    * aggregate collapses each (doc, phrase) group to one row before the
    * output exchange.
    *
    * Returns one row per (doc, phrase) hit: (idCol, phrase, n_hits,
    * first_pos) — 1-based token position of the first occurrence. */
  def phraseHits(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "phrases must be non-empty")
    val norm = phrases.map(p => p.toLowerCase.trim.split("\\s+").toSeq)
    require(norm.forall(_.nonEmpty), "phrases must contain at least one token")
    val spark = docs.sparkSession
    import spark.implicits._
    val phr = norm.map(ts => (ts.mkString(" "), ts, ts.head, ts.size))
      .toDF("phrase", "p_toks", "p_first", "p_len")
    val toks = docs.select(col(idCol), tokens(lower(col(textCol))).as("__graft_toks"))
    toks
      .select(col(idCol), col("__graft_toks"),
        posexplode(col("__graft_toks")).as(Seq("__graft_pos", "__graft_tok")))
      .join(broadcast(phr), col("__graft_tok") === col("p_first"))
      .filter(slice(col("__graft_toks"), col("__graft_pos") + 1, col("p_len")) === col("p_toks"))
      .groupBy(col(idCol), col("phrase"))
      .agg(count(lit(1)).as("n_hits"),
        (min(col("__graft_pos")) + 1).cast("bigint").as("first_pos"))
  }

  /** Pairwise Jensen–Shannon divergence between the unigram distributions
    * of every two sources — the vocabulary-level distance a mixture
    * designer reads before weighting sources ([[Curation.temperatureMix]]'s
    * diagnostic sibling; c19's n-gram overlap measures shared SEQUENCES,
    * this measures shared WORD USAGE). Natural-log JS: symmetric, finite
    * even for disjoint vocabularies, bounded by ln 2.
    *
    * The textbook shape needs p and q aligned on the UNION of both
    * vocabularies — a full-outer join per pair. This uses only the
    * INTERSECTION join: tokens present in a but not b contribute exactly
    * `p_a·ln 2` to JS, so their total is recoverable algebraically as
    * `(1 − Σ_common p_a)·ln 2` from the same aggregate. One token-keyed
    * equi self-join (fan-out per token bounded by sources², with sources
    * per corpus small; shard by language first when they are not), one
    * pair-keyed aggregate.
    *
    * Determinism: probabilities are exact long-count ratios; every summed
    * quantity is rounded to 9 decimals and accumulated as DECIMAL(28,9)
    * (order-independent), then one double expression produces the score,
    * rounded to 6 — the engine's standard float-reduction discipline.
    *
    * Returns (src_a, src_b, n_common_tokens, js) for src_a < src_b.
    * Pairs sharing NO token are absent from the output (their JS is
    * exactly ln 2 — maximal). */
  def sourceJsDivergence(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val counts = docs
      .select(col(srcCol).as("__graft_src"),
        explode(tokens(lower(col(textCol)))).as("__graft_tok"))
      .groupBy(col("__graft_src"), col("__graft_tok"))
      .agg(count(lit(1)).as("__graft_cnt"))
    val totals = counts.groupBy(col("__graft_src"))
      .agg(sum(col("__graft_cnt")).as("__graft_tot"))
    val probs = counts.join(totals, "__graft_src")
      .select(col("__graft_src"), col("__graft_tok"),
        (col("__graft_cnt").cast("double") / col("__graft_tot").cast("double")).as("__graft_p"))
    val a = probs.select(col("__graft_src").as("src_a"), col("__graft_tok").as("tok"),
      col("__graft_p").as("pa"))
    val b = probs.select(col("__graft_src").as("src_b"), col("__graft_tok").as("tok"),
      col("__graft_p").as("pb"))
    val ln2 = math.log(2.0)
    a.join(b, Seq("tok")).filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(col("pa") * log(lit(2.0) * col("pa") / (col("pa") + col("pb")))
          + col("pb") * log(lit(2.0) * col("pb") / (col("pa") + col("pb"))), 9)
          .cast(DecimalType(28, 9)).as("term"),
        round(col("pa"), 9).cast(DecimalType(28, 9)).as("pa9"),
        round(col("pb"), 9).cast(DecimalType(28, 9)).as("pb9"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_common_tokens"),
        round((lit(0.5) * (sum(col("term")).cast("double")
          + (lit(1.0) - sum(col("pa9")).cast("double")) * ln2
          + (lit(1.0) - sum(col("pb9")).cast("double")) * ln2)), 6).as("js"))
  }

  /** Moving-average type-token ratio (MATTR, Covington & McFall 2010):
    * mean distinct-token fraction over every sliding `window`-token span.
    * Unlike a global distinct/n TTR this is length-invariant, which is what
    * makes it usable as a corpus-wide lexical-diversity filter. Docs
    * shorter than the window fall back to plain TTR; empty docs yield null.
    * Pure higher-order-function expression (sequence/transform/slice/
    * array_distinct): per-row, no shuffle, no UDF; the per-window distinct
    * counts sum as integers so the value is engine- and order-exact. The
    * O(n·window) per-row cost is a constant-factor scan at any corpus
    * size. The sequence() upper bound only evaluates under the n >= window
    * branch (CaseWhen evaluates lazily), so short docs never build a
    * descending sequence. */
  def mattr(toks: Column, window: Int): Column = {
    require(window >= 2, s"window must be >= 2, got $window")
    val n = size(toks)
    val nWin = n - lit(window - 1)
    val winDistinct = transform(sequence(lit(1), nWin),
      i => size(array_distinct(slice(toks, i, lit(window)))).cast("long"))
    val sumD = aggregate(winDistinct, lit(0L), (acc, x) => acc + x)
    val ttr = size(array_distinct(toks)).cast("double") / n.cast("double")
    when(n >= window, sumD.cast("double") / (nWin.cast("double") * window))
      .otherwise(when(n > 0, ttr))
  }

  /** T5-style DETERMINISTIC span corruption (Raffel et al. 2020 §3.1.4,
    * hash-derandomized): tokens group into fixed `blockTokens`-wide
    * blocks; block b of document d is masked iff
    * md5(d:b) mod 100 < noisePct — a pure function of (doc, position), so
    * every epoch/engine/layout reproduces the same corruption and an
    * external oracle restates it. The corrupted input replaces each
    * masked block with its ordinal sentinel `<extra_id_k>`; the target is
    * the sentinel-prefixed masked content — the denoising pair a
    * span-corruption pretraining objective consumes.
    *
    * Everything is codegen'd higher-order Column work over the token
    * array (transform/filter/aggregate/array_join — no UDF): per-row
    * O(blocks²) for the ordinal prefix counts, no shuffle. Output adds
    * (n_tokens, n_blocks, n_sentinels, n_masked_tokens, corrupted,
    * target). */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 5, noisePct: Int = 15): DataFrame = {
    require(blockTokens >= 1 && noisePct >= 0 && noisePct <= 100,
      s"bad blockTokens=$blockTokens noisePct=$noisePct")
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nBlocks = ceil(n.cast("double") / blockTokens).cast("int")
    val blockIds = when(nBlocks > 0, sequence(lit(0), nBlocks - 1))
      .otherwise(array().cast("array<int>"))
    def masked(b: Column): Column =
      pmod(conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        b.cast("string")).cast("binary")), 1, 8), 16, 10).cast("bigint"),
        lit(100L)) < lit(noisePct.toLong)
    def blockStr(b: Column): Column =
      array_join(slice(toks, b * blockTokens + 1, lit(blockTokens)), " ")
    def blockLen(b: Column): Column =
      least(lit(blockTokens), n - b * blockTokens)
    // ordinal sentinel index = masked blocks strictly before b
    def sentIdx(flags: Column, b: Column): Column =
      size(filter(slice(flags, lit(1), b), f => f))
    df.withColumn("__flags", transform(blockIds, b => masked(b)))
      .withColumn("n_tokens", n.cast("int"))
      .withColumn("n_blocks", nBlocks)
      .withColumn("n_sentinels", size(filter(col("__flags"), f => f)))
      .withColumn("n_masked_tokens",
        aggregate(blockIds, lit(0),
          (acc, b) => acc + when(element_at(col("__flags"), b + 1), blockLen(b))
            .otherwise(lit(0))))
      .withColumn("corrupted",
        array_join(transform(blockIds, b =>
          when(element_at(col("__flags"), b + 1),
            concat(lit("<extra_id_"), sentIdx(col("__flags"), b).cast("string"), lit(">")))
            .otherwise(blockStr(b))), " "))
      .withColumn("target",
        array_join(transform(filter(blockIds, b => element_at(col("__flags"), b + 1)),
          b => concat(lit("<extra_id_"), sentIdx(col("__flags"), b).cast("string"),
            lit("> "), blockStr(b))), " "))
      .drop("__flags")
  }
}
