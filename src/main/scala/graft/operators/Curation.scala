package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation primitives for large-scale training-data pipelines:
  * deterministic content-hash sampling, stratified sampling, weighted source
  * mixing, token-budget sequence packing, and near-dup cluster resolution
  * (connected components over a dedup pair graph).
  *
  * Determinism contract: every sampling decision is a pure function of the
  * row's stable key (md5 hex), never of partitioning, row order, or RNG
  * state — so a 1000-executor run, a re-run after failure, and the DuckDB
  * oracle all select the identical subset. This is the property
  * `df.sample()` does NOT have (its output depends on partition layout),
  * which is why production pipelines hash-sample instead.
  */
object Curation {

  /** Hex md5 of a column's string form — the stable per-row sampling key.
    * Spark md5 takes binary; the cast chain matches DuckDB's md5(VARCHAR)
    * byte-for-byte (UTF-8). */
  def hashKey(c: Column): Column = md5(c.cast("string").cast("binary"))

  /** Deterministic shard id in [0, shards) from the md5 key: the first 8
    * hex digits as a 32-bit value (0..2³²-1), mod shards. Works for ANY key
    * type and is portable across engines — the value is always
    * nonnegative, so Spark's pmod and an oracle's % agree (a raw numeric
    * `key % shards` diverges on negative keys: pmod yields 0..shards-1,
    * SQL % yields negatives). 32 draw bits keep the modulo bias below
    * shards/2³² (< 1 ppm at 4096 shards) and let a deployment ask for any
    * Int shard count — both limits of the earlier 16-bit draw. */
  def hashShard(c: Column, shards: Int): Column = {
    require(shards > 0, s"shards must be positive, got $shards")
    pmod(conv(substring(hashKey(c), 1, 8), 16, 10).cast("bigint"), lit(shards.toLong))
      .cast("int")
  }

  /** Working columns this module may add to its input. Ops fail fast when
    * the input already carries one of these names instead of silently
    * overwriting it or tripping an ambiguous-reference analysis error
    * downstream. (Output-facing names stay unprefixed — they are the op's
    * documented result schema; truly internal ones carry the __graft_
    * prefix and never escape.) */
  private def requireFresh(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input DataFrame already has column(s) ${clash.mkString(", ")} " +
        "reserved by this curation operator; rename them first")
  }

  /** Quantized acceptance threshold: a 3-hex-digit prefix string such that
    * `substr(md5, 1, 3) < threshold` keeps ≈ `rate` of rows (granularity
    * 1/4096). Lexicographic compare on fixed-width hex prefixes is
    * identical in any engine — no hex→int conversion needed. Rates ≥ 1.0
    * map to "g", which every hex prefix sorts below. */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0.0, s"rate must be >= 0, got $rate")
    val quantized = math.round(rate * 4096)
    // quantized == 4096 (any rate ≥ 1 - 1/8192) must ALSO map to keep-all:
    // f"%03x" of 4096 would emit the 4-char "1000", which sorts BELOW most
    // 3-char hex prefixes and silently inverts the filter to ~6% kept
    if (quantized >= 4096) "g" else f"$quantized%03x"
  }

  /** Deterministic Bernoulli sample: keep rows whose key's 3-hex-digit md5
    * prefix sorts below the quantized rate threshold. Pure per-row filter —
    * no shuffle, pushes into the scan's data filters. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(substring(hashKey(col(keyCol)), 1, 3) < rateThreshold(rate))

  /** WEIGHTED sampling without replacement, A-ES shape (Efraimidis &
    * Spirakis 2006): row i draws u_i ∈ (0,1] deterministically from its md5
    * key (first 8 hex digits, +1, ÷2³²) and scores e_i = −ln(u_i)/w_i; the
    * k SMALLEST scores are the sample — distributionally equivalent to k
    * sequential weighted draws without replacement, but embarrassingly
    * parallel. The score is a pure row function (no RNG, no state), so the
    * selection is rerun/engine/layout invariant like every sampler here;
    * scores round to 9 decimals (the t11 float-portability discipline)
    * with the key as tie-break. Scale: `orderBy.limit(k)` compiles to
    * TakeOrdered — each map task ships ≤k rows, no global sort. */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireFresh(df, "es_score")
    val v = conv(substring(hashKey(col(keyCol)), 1, 8), 16, 10).cast("bigint")
    val u = (v.cast("double") + 1.0) / 4294967296.0
    df.withColumn("es_score", round(-log(u) / weight.cast("double"), 9))
      .orderBy(col("es_score").asc, col(keyCol).asc)
      .limit(k)
  }

  /** Per-stratum deterministic top-n: rank rows inside each stratum by
    * (hash, key) — a stable shuffle order — and keep the first n. One hash
    * shuffle on the stratum column; n rows per stratum survive the window,
    * so skewed strata cost sort time, not output size. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFresh(df, "sample_rank")
    val w = Window.partitionBy(col(stratumCol)).orderBy(hashKey(col(keyCol)), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w)).filter(col("sample_rank") <= n)
  }

  /** Temperature-scaled source mixing at temperature T=2 (T5 §3.4.4 /
    * multilingual-sampling shape): stratum s gets a target share
    * ∝ √count_s, which flattens the head sources and up-samples the tail
    * without inverting the order. Targets are exact integers
    * (`n_s = min(count_s, ⌊total·√c_s / Σ√c⌋)`), and the rows chosen are
    * the deterministic hash-order prefix per stratum — rerun/engine/layout
    * invariant, so an oracle selects the byte-identical subset.
    *
    * Determinism discipline: √count is IEEE-exact, per-stratum weights are
    * rounded to 9 decimals and summed as DECIMAL(28,9) (order-independent),
    * then ONE double division per stratum. T=2 on purpose: general 1/T
    * powers route through libm `pow`, whose last-ulp varies by engine.
    *
    * Scale shape: the stats side is a strata-sized aggregate broadcast
    * back; selection is c02's per-stratum hash-order window. For strata of
    * billions of rows prefer rate-based acceptance ([[weightedMix]] with
    * these weights) — it trades exact counts for a sort-free scan. */
  def temperatureMix(df: DataFrame, stratumCol: String, keyCol: String,
      totalTarget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(totalTarget > 0, s"totalTarget must be positive, got $totalTarget")
    requireFresh(df, "mix_rank", "__graft_mix_n")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__w9", round(sqrt(col("__c")), 9).cast(DecimalType(28, 9)))
    val tot = counts.agg(sum(col("__w9")).as("__tot"))
    val targets = counts.crossJoin(broadcast(tot))
      .select(col(stratumCol),
        least(col("__c"),
          floor(col("__w9").cast("double") / col("__tot").cast("double")
            * totalTarget).cast("long")).as("__graft_mix_n"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(hashKey(col(keyCol)), col(keyCol))
    df.join(broadcast(targets), stratumCol)
      .withColumn("mix_rank", row_number().over(w))
      .filter(col("mix_rank") <= col("__graft_mix_n"))
      .drop("__graft_mix_n")
  }

  /** Source-repetition epoch mixing — the data-recipe operator ("wiki ×
    * 2.5 epochs, web × 1, junk × 0"): every row of stratum s is emitted
    * ⌊epochs(s)⌋ times plus one more with probability frac(epochs(s)),
    * decided by the deterministic md5-prefix rule ([[hashSample]]'s
    * quantized threshold) over the (key, epoch)-salted hash — so the
    * fractional epoch is a fresh deterministic subsample, not a re-use of
    * another sampler's decisions. Epochs are INTEGER MILLI-EPOCHS
    * (2500 = 2.5): no float recipe arithmetic exists anywhere, and the
    * oracle restates thresholds verbatim.
    *
    * The emitted `interleave_key` (the salted md5) is the global shuffle
    * order for downstream packing: sorting by it interleaves epochs and
    * sources uniformly instead of streaming epoch after epoch — at
    * training time that's the difference between a shuffled corpus and
    * curriculum-by-accident.
    *
    * Plan: recipes are a handful of rows — broadcast join; the explode
    * fan-out per row is ⌈epochs⌉, bounded by the recipe; no shuffle at
    * all until a downstream consumer keys one. Returns the input columns
    * plus (epoch, interleave_key). */
  def epochMix(df: DataFrame, stratumCol: String, keyCol: String,
      epochsMilli: Seq[(String, Int)]): DataFrame = {
    require(epochsMilli.nonEmpty, "epochMix needs at least one recipe row")
    require(epochsMilli.forall(_._2 >= 0), "epochs_milli must be >= 0")
    require(epochsMilli.map(_._1).distinct.size == epochsMilli.size,
      "duplicate stratum in recipe")
    requireFresh(df, "epoch", "interleave_key")
    val spark = df.sparkSession
    import spark.implicits._
    val dim = epochsMilli
      .map { case (s2, m) => (s2, (m / 1000).toLong, rateThreshold((m % 1000) / 1000.0)) }
      .toDF(stratumCol, "__full", "__frac_thr")
    df.join(broadcast(dim), stratumCol)
      .withColumn("epoch", explode(sequence(lit(1L), col("__full") + 1)))
      .withColumn("interleave_key",
        md5(concat(col(keyCol).cast("string"), lit("#e"), col("epoch").cast("string"))
          .cast("binary")))
      .filter(col("epoch") <= col("__full") ||
        substring(col("interleave_key"), 1, 3) < col("__frac_thr"))
      .drop("__full", "__frac_thr")
  }

  /** k-anonymity audit (Sweeney 2002): group by the quasi-identifier
    * columns and flag every combination carried by fewer than `k` rows —
    * the groups whose members a release would re-identify. Returns
    * (quasi-identifier cols…, group_size, at_risk). The PII-redaction
    * step (t08) scrubs direct identifiers; this is the complementary
    * release gate for indirect ones. One hash-aggregate shuffle on the
    * quasi-identifier tuple — the d01 exact-dedup scale shape. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("at_risk", col("group_size") < k)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007), the k-anonymity
    * complement: a quasi-identifier group is at risk when its SENSITIVE
    * attribute takes fewer than `l` distinct values — group size alone
    * (k-anonymity) doesn't stop attribute disclosure when everyone in the
    * group shares the same sensitive value. Same single hash-agg shuffle as
    * [[kAnonymityAudit]]; exact distinct per group (at 100 TB swap in
    * approx_count_distinct for the audit pass, keep exact for enforcement
    * decisions). */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: Column, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityAudit needs at least one quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(sensitiveCol).as("distinct_sensitive"))
      .withColumn("at_risk", col("distinct_sensitive") < l)
  }

  /** k-anonymity ENFORCEMENT by suppression: drop every row whose
    * quasi-identifier combination has fewer than `k` members, so the
    * released frame is k-anonymous by construction. The audit's flagged
    * groups anti-join back against the corpus — same single-shuffle shape;
    * the at-risk group list is tiny and broadcasts. */
  def kAnonymitySuppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val risky = kAnonymityAudit(df, quasiCols, k)
      .filter(col("at_risk")).select(quasiCols.map(col): _*)
    df.join(broadcast(risky), quasiCols, "left_anti")
  }

  /** Weighted mix: per-stratum acceptance rates applied via the same
    * hash-prefix rule. `weights` is broadcast as an inline dimension (the
    * reference's S4 VALUES-dim pattern); unlisted strata default to rate 0
    * (dropped) so the mix is a whitelist. */
  def weightedMix(df: DataFrame, stratumCol: String, keyCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    requireFresh(df, "__graft_accept_below")
    val dim = weights.map { case (s, r) => (s, rateThreshold(r)) }
      .toDF(stratumCol, "__graft_accept_below")
    df.join(broadcast(dim), stratumCol)
      .filter(substring(hashKey(col(keyCol)), 1, 3) < col("__graft_accept_below"))
      .drop("__graft_accept_below")
  }

  /** Token-budget sequence packing, sharded: assign each doc to a shard
    * ([[hashShard]] of its key — any key type, engine-portable), order
    * within the shard by (hash, key), and cut greedy bins where the running
    * token total passes `budget`. A doc lands in the bin its PREVIOUS
    * running total points at, so every bin except a shard's last holds
    * ≥ budget tokens' worth of docs.
    *
    * Scale shape: the window is partitioned by shard — shards pack in
    * parallel and the per-shard sort is the only cost, so throughput scales
    * by raising `shards` (a real packer uses thousands). A single global
    * ordered window would serialize the corpus through one partition —
    * exactly the anti-pattern this avoids. */
  def packSequences(df: DataFrame, keyCol: String, tokenCol: Column,
      budget: Int, shards: Int, tokenOutCol: String = "doc_tokens"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFresh(df, "shard", tokenOutCol, "running", "bin")
    val shard = hashShard(col(keyCol), shards)
    val w = Window.partitionBy(shard).orderBy(hashKey(col(keyCol)), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn(tokenOutCol, tokenCol)
      .withColumn("running", sum(col(tokenOutCol)).over(w))
      .withColumn("bin", floor((col("running") - col(tokenOutCol)) / budget))
  }

  /** GPT-style CONCAT-AND-CHUNK index: documents concatenate in
    * deterministic hash order within each shard and the token stream
    * chunks into fixed `chunkTokens` windows — one output row per
    * (document, chunk) SLICE, the exact map a pretraining dataloader
    * needs to assemble training sequences. Documents CROSS chunk
    * boundaries (contrast [[packSequences]], which assigns each doc only
    * its starting bin). Columns added: `shard`, `doc_tokens`,
    * `doc_start` (the doc's position in its shard's token stream),
    * `seq_id` (chunk number within the shard), `doc_off` (first token of
    * the slice within the doc), `chunk_off` (where the slice lands inside
    * the chunk), `span` (slice length). Invariants: per (shard, seq_id)
    * the spans tile [0, chunkTokens) exactly (a shard's final chunk may
    * be short); per doc the slices tile [0, doc_tokens). Zero-token docs
    * drop BEFORE the window (they would otherwise emit a descending
    * `sequence(start, start-1)`).
    * Scale: one bounded window per shard — the sharded-stream discipline,
    * no global total order — plus a per-row explode of
    * O(doc_tokens / chunkTokens) slices. */
  def concatChunk(df: DataFrame, keyCol: String, tokenCol: Column,
      chunkTokens: Int, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    requireFresh(df, "shard", "doc_tokens", "doc_start", "seq_id", "doc_off",
      "chunk_off", "span")
    val L = lit(chunkTokens.toLong)
    val w = Window.partitionBy(col("shard")).orderBy(hashKey(col(keyCol)), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("doc_tokens", tokenCol.cast("bigint"))
      .filter(col("doc_tokens") > 0)
      .withColumn("shard", hashShard(col(keyCol), shards))
      .withColumn("doc_start", sum(col("doc_tokens")).over(w) - col("doc_tokens"))
      .withColumn("seq_id", explode(sequence(
        floor(col("doc_start") / L),
        floor((col("doc_start") + col("doc_tokens") - lit(1L)) / L))))
      .withColumn("doc_off", greatest(lit(0L), col("seq_id") * L - col("doc_start")))
      .withColumn("chunk_off", greatest(lit(0L), col("doc_start") - col("seq_id") * L))
      .withColumn("span",
        least(col("doc_start") + col("doc_tokens"), (col("seq_id") + lit(1L)) * L)
          - greatest(col("doc_start"), col("seq_id") * L))
  }

  /** Token-quota mixing: take documents per stratum in deterministic hash
    * order until the stratum's TOKEN budget fills — how LLM data recipes
    * are actually specified ("N tokens of source X"), vs the rate-based
    * [[weightedMix]]. A doc is kept iff the running total BEFORE it is
    * under budget, so overshoot is bounded by one document and a stratum
    * with less data than its quota contributes everything it has. One
    * bounded window shuffle on the stratum; quotas broadcast as an inline
    * dim. Unlisted strata drop (whitelist, like weightedMix). */
  def tokenQuotaMix(df: DataFrame, stratumCol: String, keyCol: String,
      tokenCol: Column, quotas: Seq[(String, Long)],
      tokenOutCol: String = "doc_tokens"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    requireFresh(df, tokenOutCol, "__graft_token_quota", "__graft_running")
    val dim = quotas.toDF(stratumCol, "__graft_token_quota")
    val w = Window.partitionBy(col(stratumCol)).orderBy(hashKey(col(keyCol)), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(dim), stratumCol)
      .withColumn(tokenOutCol, tokenCol)
      .withColumn("__graft_running", sum(col(tokenOutCol)).over(w))
      .filter(col("__graft_running") - col(tokenOutCol) < col("__graft_token_quota"))
      .drop("__graft_token_quota", "__graft_running")
  }

  /** Deterministic train/val/test split: label every row by where its
    * 3-hex-digit md5 prefix falls among the cumulative rate thresholds.
    * The same contract as [[hashSample]] — a pure function of the row's
    * key, independent of partitioning, run order, and engine — which is
    * exactly what a split must be: a document's split membership may never
    * change across reruns or engines, or eval data leaks into training.
    * Fractions are quantized to 1/4096 like all hash-rate ops here.
    * `splits` are (label, fraction) in priority order; fractions must sum
    * to ≤ 1; rows past the last threshold get the final label when the sum
    * is 1 (or `defaultLabel` otherwise). Per-row CASE, no shuffle. */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      labelOutCol: String = "split", defaultLabel: String = "rest"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split fractions must sum to <= 1")
    requireFresh(df, labelOutCol)
    val bucket = substring(hashKey(col(keyCol)), 1, 3)
    val cumulative = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val labeled = splits.map(_._1).zip(cumulative.map(rateThreshold))
      .foldRight(lit(defaultLabel): Column) { case ((label, upper), els) =>
        when(bucket < upper, lit(label)).otherwise(els)
      }
    df.withColumn(labelOutCol, labeled)
  }

  /** Per-stratum ADAPTIVE threshold filter: compute quantile `q` of
    * `valueCol` within each stratum and keep rows at or above their own
    * stratum's threshold — how production quality gates are actually set
    * ("keep the top half of each language"), vs a single global cutoff
    * that a verbose language would dominate.
    *
    * Shape: one partial-aggregating shuffle to a |strata|-row stats frame,
    * broadcast back, per-row filter — the corpus itself never reshuffles.
    * The exact interpolated percentile here sorts each stratum's values
    * inside the aggregate; at 100 TB swap the agg for `approx_percentile`
    * (same plan shape, bounded state) — exactness is what lets the DuckDB
    * oracle hash-match (`quantile_cont` interpolates identically). */
  def adaptiveThreshold(df: DataFrame, stratumCol: String, valueCol: Column,
      q: Double, thresholdOutCol: String = "stratum_threshold"): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    requireFresh(df, thresholdOutCol)
    val stats = df.groupBy(col(stratumCol))
      .agg(percentile(valueCol, lit(q)).as(thresholdOutCol))
    df.join(broadcast(stats), stratumCol)
      .filter(valueCol >= col(thresholdOutCol))
  }

  /** Per-stratum top-n by a SCORE (descending, key tie-break) — the
    * "keep the best n of each source" selection, vs [[stratifiedSample]]'s
    * unbiased hash order. Same single-shuffle bounded-output shape. */
  def qualityTopN(df: DataFrame, stratumCol: String, scoreCol: Column,
      keyCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFresh(df, "quality_rank")
    val w = Window.partitionBy(col(stratumCol)).orderBy(scoreCol.desc, col(keyCol))
    df.withColumn("quality_rank", row_number().over(w)).filter(col("quality_rank") <= n)
  }

  /** THE curation funnel, shared by the oracle-checked query (c06) and the
    * production job (pipeline.CurationJob) so the two can never
    * desynchronize: over a (doc_id, text, lang) corpus, returns the named
    * stages in order — raw → exact-dedup keepers → near-dup cluster drop
    * (LSH pairs → connected components, non-canonical members removed) →
    * repetition quality gate → weighted language mix. Stage DataFrames are
    * lazy except the connected-components label propagation (bounded
    * iterative joins; see [[connectedComponents]]). */
  def curationFunnel(
      docs: DataFrame,
      weights: Seq[(String, Double)],
      minJaccard: Double,
      minDistinctFrac: Double,
      maxTopBigramFrac: Double,
      /** optional hashed-classifier gate: keep docs whose t12 linear score
        * exceeds this milli-threshold (None = stage off — default keeps the
        * historical 5-stage funnel shape and every existing oracle). */
      classifierMinScoreMilli: Option[Long] = None,
      /** optional DSIR stage ((isTarget predicate, k)): after the quality
        * gates, keep only the k docs [[importanceResample]] draws toward
        * the target distribution — budget-driven target-conditioned
        * selection as a funnel stage (None = stage off). */
      dsirTarget: Option[(Column, Int)] = None): Seq[(String, DataFrame)] = {
    val toks = TextAnalysis.tokens(col("text"))
    val keepers = docs
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val s1 = docs.join(keepers, Seq("doc_id"), "left_semi")
    val nonCanonical = connectedComponents(
        Dedup.lshNearDupPairs(docs, "doc_id", "text", minJaccard))
      .filter(col("member_id") =!= col("cluster_id"))
      .select(col("member_id").as("doc_id"))
    val s2 = s1.join(nonCanonical, Seq("doc_id"), "left_anti")
    val s3 = s2.filter(
      round(TextAnalysis.distinctTokenFrac(toks), 6) >= minDistinctFrac &&
        round(TextAnalysis.topBigramFrac(toks), 6) <= maxTopBigramFrac)
    val heuristic = Seq("raw" -> docs, "exact_dedup" -> s1,
      "neardup_clusters" -> s2, "quality_filter" -> s3)
    val gated = classifierMinScoreMilli match {
      case Some(minScore) =>
        // per-row fused codegen score (same per-row cost class as s3's
        // heuristics — adds no shuffle to the funnel)
        heuristic :+ ("classifier_gate" ->
          s3.filter(TextAnalysis.hashedLinearScoreMilli(toks) > minScore))
      case None => heuristic
    }
    val resampled = dsirTarget match {
      case Some((isTarget, k)) =>
        // the selection is computed over the gate survivors (scores against
        // the POST-quality raw distribution — the DSIR paper's setting) and
        // applied as a semi-join, so stage rows keep the document schema
        gated :+ ("importance_resample" ->
          gated.last._2.join(
            importanceResample(gated.last._2, "doc_id", "text", isTarget, k)
              .select(col("doc_id")),
            Seq("doc_id"), "left_semi"))
      case None => gated
    }
    resampled :+
      ("weighted_mix" -> weightedMix(resampled.last._2, "lang", "doc_id", weights))
  }

  /** Per-stage (stage_idx, stage, docs, tokens) attrition rows for a funnel
    * — one plan; shared shuffle subtrees are deduplicated by ReuseExchange. */
  def funnelStats(stages: Seq[(String, DataFrame)]): DataFrame =
    stages.zipWithIndex.map { case ((name, df), idx) =>
      df.agg(count(lit(1)).as("docs"),
          coalesce(sum(TextAnalysis.tokenCount(col("text")).cast("bigint")), lit(0L)).as("tokens"))
        .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
          col("docs"), col("tokens"))
    }.reduce(_ unionAll _)

  /** Connected components in O(log n) rounds via alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014) — the scale
    * replacement for min-label propagation, whose round count is the graph
    * DIAMETER (a 10⁶-doc duplication chain = 10⁶ shuffles; star
    * contraction closes it in ~20).
    *
    * Each round:
    *   - large-star: every node points its LARGER neighbors at the minimum
    *     of its neighborhood (incl. itself);
    *   - small-star: every node points its smaller-or-equal neighbors and
    *     itself at that minimum.
    * Both preserve connectivity and strictly shrink non-star structure;
    * the fixpoint is a star per component rooted at its minimum id.
    * Each half-round is one groupBy(min) + one self-join on the node id —
    * partial-aggregating, no hot keys beyond component roots (the root's
    * degree grows toward component size, which is the output's own
    * cardinality — inherent, and far past where propagation dies).
    *
    * Convergence is detected by an (edge-count, xxhash-sum) fingerprint —
    * one tiny aggregate per round, no edge-set collect. Returns
    * (member_id, cluster_id = component min). */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIter: Int = 30): DataFrame = {
    // canonical directed edges u -> v with u > v (drop self-loops/dups)
    var edges = pairs
      .select(col(idA).cast("bigint").as("a"), col(idB).cast("bigint").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val allNodes = edges.select(col("u").as("member_id"))
      .union(edges.select(col("v").as("member_id")))
      .distinct()
      .localCheckpoint(true)

    def fingerprint(e: DataFrame): (Long, Long) = {
      // bit_xor: order-independent, overflow-free under ANSI mode (a SUM of
      // 64-bit hashes throws ARITHMETIC_OVERFLOW there)
      val r = e.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    def canonical(e: DataFrame): DataFrame =
      e.filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct()

    def bidirectional(e: DataFrame): DataFrame =
      e.select(col("u").as("x"), col("v").as("y"))
        .union(e.select(col("v").as("x"), col("u").as("y")))

    // large-star: x re-points its LARGER neighbors at min(Γ(x) ∪ {x})
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = bidirectional(e)
      val mins = nbrs.groupBy(col("x"))
        .agg(least(min(col("y")), first(col("x"))).as("m"))
      canonical(nbrs.join(mins, "x").filter(col("y") > col("x"))
        .select(col("y").as("a"), col("m").as("b")))
    }

    // small-star: x re-points its smaller-or-equal neighbors AND itself at
    // min(Γ≤(x) ∪ {x}) — every canonical edge processed once, from its
    // larger endpoint
    def smallStar(e: DataFrame): DataFrame = {
      val small = bidirectional(e).filter(col("y") <= col("x"))
      val mins = small.groupBy(col("x"))
        .agg(least(min(col("y")), first(col("x"))).as("m"))
      canonical(
        small.join(mins, "x").select(col("y").as("a"), col("m").as("b"))
          .union(mins.select(col("x").as("a"), col("m").as("b"))))
    }

    var fp = fingerprint(edges)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nfp = fingerprint(next)
      converged = nfp == fp
      edges = next
      fp = nfp
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents star contraction did not converge after $maxIter rounds; " +
          "raise maxIter (expected rounds ~ log2 of the largest component)")
    // fixpoint: edges are (member -> root) stars; roots label themselves
    allNodes.join(edges.select(col("u").as("member_id"), col("v").as("cluster_id")),
        Seq("member_id"), "left")
      .select(col("member_id"), coalesce(col("cluster_id"), col("member_id")).as("cluster_id"))
  }

  /** The previous min-label-propagation implementation, kept as the
    * executable specification the star contraction is tested against
    * (and as the simpler reference for small graphs). Round count is the
    * graph diameter. */
  def connectedComponentsPropagation(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIter: Int = 30): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("neighbor_label"))
      val updated = labels.join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("neighbor_label"), col("label"))).as("new_label"))
        .localCheckpoint(true)
      changed = updated.filter(col("new_label") < col("label")).count()
      labels = updated.select(col("id"), col("new_label").as("label"))
      iter += 1
    }
    // Unconverged labels are WRONG labels (a component split across
    // cluster_ids — a dedup pipeline would then keep near-duplicates as
    // "canonical"); failing loudly beats silently degrading. Components
    // with diameter > maxIter need a higher bound or a star-contraction
    // variant — propagation distance is the knob, not correctness.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter iterations " +
          s"($changed labels still improving); raise maxIter for deep chain components")
    labels.select(col("id").as("member_id"), col("label").as("cluster_id"))
  }

  /** Deterministic contrastive negative sampling: `k` pseudo-random
    * partners per row — the negatives a contrastive/embedding training
    * run pairs each anchor with. Rerun- and engine-invariant (no RNG
    * state): rows land in `buckets` hash groups, are ranked inside their
    * bucket by md5, and partner j of the rank-r row is the row at rank
    * `(r-1 + j·max(n/(k+1), 1)) mod n + 1` — a ring shift, so pairing is
    * uniform-ish, has no fixed point for j·step ≢ 0 (mod n), and every
    * row serves as a negative for ≈ k others (balanced usage, unlike
    * independent sampling which leaves a Poisson tail of unused rows).
    *
    * 100 TB posture: the ring is PER BUCKET, so the rank window keys on
    * the bucket (no global total order, no single-partition window) and
    * the rank→id resolution is a (bucket, rank) equi-join of two
    * bucket-partitioned sides. Self-pairs (possible only in degenerate
    * buckets with n ≤ k·step ≈ n) are dropped, never emitted.
    *
    * Returns (idCol, neg_j, neg_id). */
  def negativePairs(df: DataFrame, idCol: String, k: Int, buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val b = df.select(col(idCol), hashShard(col(idCol), buckets).as("__graft_bucket"),
      hashKey(col(idCol)).as("__graft_h"))
    val w = Window.partitionBy(col("__graft_bucket"))
    val ranked = b
      .withColumn("__graft_r", row_number().over(w.orderBy(col("__graft_h"), col(idCol))))
      .withColumn("__graft_n", count(lit(1)).over(w))
    val step = greatest(expr("__graft_n div " + (k + 1)), lit(1L))
    val wanted = ranked
      .select(col(idCol), col("__graft_bucket"), col("__graft_r"), col("__graft_n"),
        explode(sequence(lit(1), lit(k))).as("neg_j"))
      .select(col(idCol), col("__graft_bucket"), col("neg_j"),
        (pmod(col("__graft_r") - 1 + col("neg_j") * step, col("__graft_n")) + 1)
          .as("__graft_want"))
    val members = ranked.select(col("__graft_bucket").as("m_bucket"),
      col("__graft_r").as("m_r"), col(idCol).as("neg_id"))
    wanted
      .join(members, col("__graft_bucket") === col("m_bucket") &&
        col("__graft_want") === col("m_r"))
      .filter(col("neg_id") =!= col(idCol))
      .select(col(idCol), col("neg_j"), col("neg_id"))
  }

  /** DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * its average unigram log-likelihood ratio between a TARGET sub-corpus
    * (rows where `isTarget`) and the full RAW corpus — Laplace-smoothed
    * over the raw vocabulary — then draw `k` docs without replacement with
    * probability ∝ exp(score/temperature) via the Gumbel-top-k trick. The
    * Gumbel noise is derived from md5(key)||"|dsir", NOT an RNG, so the
    * draw is layout-/rerun-stable and an oracle can restate it exactly.
    *
    * Scale shape: token occurrences shuffle ONCE into the two vocab count
    * tables (vocab-sized → broadcast back); per-doc scoring is a broadcast
    * join + one doc-keyed aggregation; the final selection is a global
    * top-k (TakeOrdered — k rows per map task to the driver-side heap, no
    * full sort). Nothing is quadratic and no model state lives on the
    * driver. Cross-engine determinism follows the t11 pattern: per-term
    * contributions rounded to 9 decimals and summed as DECIMAL(28,9), so
    * float addition order never matters.
    *
    * Output: (sample_rank, key, score) — score is the raw (unrounded)
    * average log ratio; callers round for display.
    */
  def importanceResample(docs: DataFrame, keyCol: String, textCol: String,
      isTarget: Column, k: Int, temperature: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(k >= 1, s"k must be >= 1, got $k")
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    requireFresh(docs, "sample_rank", "score", "__graft_term", "__graft_tf",
      "__graft_is_target", "__graft_gkey")
    val tf = docs.select(col(keyCol), isTarget.as("__graft_is_target"),
      explode(TextAnalysis.termFreqs(TextAnalysis.tokens(lower(col(textCol)))))
        .as(Seq("__graft_term", "__graft_tf")))
    val vocab = tf.groupBy(col("__graft_term")).agg(
      sum(col("__graft_tf")).as("__graft_cnt_raw"),
      sum(when(col("__graft_is_target"), col("__graft_tf")).otherwise(lit(0L)))
        .as("__graft_cnt_tgt"))
    val tot = vocab.agg(
      sum(col("__graft_cnt_raw")).cast("double").as("__graft_n_raw"),
      sum(col("__graft_cnt_tgt")).cast("double").as("__graft_n_tgt"),
      count(lit(1)).cast("double").as("__graft_v"))
    // ln of the smoothed ratio — op order mirrored verbatim in the oracle
    val ratio = log(
      ((col("__graft_cnt_tgt").cast("double") + 1.0d) / (col("__graft_n_tgt") + col("__graft_v"))) /
      ((col("__graft_cnt_raw").cast("double") + 1.0d) / (col("__graft_n_raw") + col("__graft_v"))))
    val scored = tf.join(broadcast(vocab), "__graft_term").crossJoin(broadcast(tot))
      .withColumn("__graft_c9",
        round(col("__graft_tf").cast("double") * ratio, 9).cast(DecimalType(28, 9)))
      .groupBy(col(keyCol))
      .agg((sum(col("__graft_c9")).cast("double") /
        sum(col("__graft_tf")).cast("double")).as("score"))
    // deterministic uniform in (0,1) from the salted md5; Gumbel = -ln(-ln u)
    val u = (conv(substring(md5(concat(col(keyCol).cast("string"), lit("|dsir"))
        .cast("binary")), 1, 8), 16, 10).cast("double") + 0.5d) / 4294967296.0d
    val keyed = scored.withColumn("__graft_gkey",
      round(col("score") / temperature, 9) + round(-log(-log(u)), 9))
    keyed
      .orderBy(col("__graft_gkey").desc, col(keyCol))
      .limit(k)
      .withColumn("sample_rank",
        row_number().over(Window.orderBy(col("__graft_gkey").desc, col(keyCol))))
      .select(col("sample_rank"), col(keyCol), col("score"))
  }

  /** Deterministic EPOCH SHUFFLE + sharding — the training-order
    * randomization step every epoch of a data loader needs: each row gets
    * a shard in [0, numShards) and a position within it, both pure
    * functions of (key, epoch), so changing the epoch salt reshuffles the
    * whole corpus reproducibly and any worker can recompute its shard's
    * order with no coordination.
    *
    * Scale posture: there is deliberately NO global total order — a
    * 100 TB global sort-and-enumerate is the anti-pattern (single
    * ordering bottleneck); shard assignment is an embarrassingly-parallel
    * map (salted md5, [[hashShard]]) and the within-shard order is one
    * window per shard key (each shard ~n/numShards rows — pick numShards
    * so a shard fits a task, exactly like data-loader file shards).
    * Epoch-salted md5 keys make the result rerun/layout/engine invariant.
    *
    * Output: input columns + (shard INT, pos_in_shard INT), positions
    * 0-based and dense within each shard. */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Long, numShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0, s"numShards must be positive, got $numShards")
    requireFresh(df, "shard", "pos_in_shard")
    val salted = concat(col(keyCol).cast("string"), lit(s"#e$epoch"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(hashKey(salted), col(keyCol))
    df.withColumn("shard", hashShard(salted, numShards))
      .withColumn("pos_in_shard", row_number().over(w) - 1)
  }
}
