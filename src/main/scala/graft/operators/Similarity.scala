package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two plans with identical output semantics on the candidates they score:
  *
  *   - [[bruteForceTopK]] — exact: score every (query, corpus) pair. The
  *     query side is broadcast, so the corpus is scanned ONCE with no
  *     shuffle of corpus rows; the only shuffle is the per-query top-k
  *     window over n_corpus × n_query score rows. With a bounded query set
  *     (the usual ANN-serving shape) this survives a 100× corpus scale-up:
  *     cost is one pass + a shuffle linear in corpus size.
  *   - [[lshTopK]] — approximate scale path: a random-hyperplane-style sign
  *     bucket key per vector; only same-bucket pairs are scored (a hash
  *     bucket equi-join replaces the cross product — the same
  *     candidate-generation shape as MinHash-LSH dedup). Recall is tunable
  *     via the number of sign bits (fewer bits → bigger buckets → higher
  *     recall, more work).
  *
  * All math is explicit double folds (`aggregate`/`zip_with`) with a fixed
  * left-to-right order, so any engine reproduces bit-identical cosines —
  * the DuckDB oracle hash-matches full results, not just shapes.
  *
  * The sign planes are axis-difference planes (sign of e[i]−e[j] for fixed
  * index pairs) rather than sampled Gaussian hyperplanes: deterministic,
  * engine-portable, and still a locality-sensitive family for cosine on
  * centered data. Swap in seeded random planes for production recall.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as doubles, left fold — native codegen'd loop
    * ([[graft.sql.FloatVecDot]]), bit-identical to [[dotHof]]. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.sql.FloatVecDot(
        org.apache.spark.sql.graft.ColumnShim.expression(a),
        org.apache.spark.sql.graft.ColumnShim.expression(b)))

  /** HOF composition of the same fold — the executable specification the
    * native expression is tested against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ as double (dot(a, a) = squared norm, same fold order as the
    * transform/aggregate HOF it replaces). */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Multi-table random-hyperplane LSH configuration: L=12 hash tables of
    * b=8 sign bits each, query-side multi-probe at Hamming radius 1.
    *
    * Tuned on the fixture corpus (top-5 neighbors sit at cosine ≈ 0.3 over a
    * ≈ 0.0 background — θ/π ≈ 0.39, so per-bit collision ≈ 0.61 vs 0.5: a
    * genuinely hard, low-contrast ANN regime): measured recall@5 = 0.70
    * while scoring ≈ 36% of the corpus per query. Recall levers, in order:
    * more tables (L), wider probe radius, fewer bits — each trades candidate
    * volume for recall without ever growing a single bucket (buckets stay
    * ≈ n/2^b, so no hot keys).
    *
    * Plane coefficients are pseudo-Gaussian, derived with integer-only
    * arithmetic (portable polynomial hash → two mid-square rounds →
    * sum-of-4-uniform-slices CLT) so a SQL oracle restates the identical
    * planes as integer literals. Linear-hash coefficients are NOT usable
    * here: a polynomial hash is linear in its input chars, so coefficients
    * at adjacent indices differ by a constant (lattice correlation) and the
    * "random" planes come out near-parallel — measured recall drops by
    * ≈ 25 points. The mid-square rounds break the linearity.
    */
  val PlaneTables = 12
  val PlaneBits = 8
  val EmbeddingDim = 64

  private val P = graft.sql.Defaults.P
  private def ph(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
  private def sq(x: Long): Long = (x * x) % P

  /** Integer coefficient seed in [0, 39996]: Σ of 4 mid-square uniform
    * slices. The oracle interpolates these integers verbatim. */
  def planeCoefficientInt(t: Int, j: Int, i: Int): Long = {
    var y = sq(sq(ph(s"${t}_${j}_${i}")))
    var s = 0L
    var r = 0
    while (r < 4) {
      y = sq((y + r + 1) % P)
      s += y % 10000
      r += 1
    }
    s
  }

  /** The double coefficient both engines compute: (int − 20000) / 10000. */
  def planeCoefficient(t: Int, j: Int, i: Int): Double =
    (planeCoefficientInt(t, j, i) - 20000L) / 10000.0

  /** Flat (L·b) × dim coefficient matrix, table-major. */
  lazy val Planes: Seq[Seq[Double]] =
    for (t <- 0 until PlaneTables; j <- 0 until PlaneBits)
      yield (0 until EmbeddingDim).map(i => planeCoefficient(t, j, i))

  /** All L bucket keys of an embedding in one compiled pass
    * ([[graft.sql.SignPlaneKeys]]). */
  def tableKeys(vec: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.sql.SignPlaneKeys(
        org.apache.spark.sql.graft.ColumnShim.expression(vec), Planes, PlaneBits))

  /** Symmetric int8 quantization scale: max|x| / 127 (1.0 for an all-zero
    * vector so the quantizer stays total). The storage-side op a training
    * pipeline runs on embedding columns — 4× smaller vectors at a bounded,
    * measurable reconstruction error. */
  def int8Scale(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, v => abs(v.cast("double"))))
    when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
  }

  /** Round-half-up int8 codes: floor(x/scale + 0.5). Spelled with floor
    * (identical in every engine) rather than round() so cross-engine
    * half-way ties cannot diverge. Codes are within [-127, 127] by
    * construction of the scale. */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, v => floor(v.cast("double") / scale + 0.5).cast("int"))

  /** BINARY (1-bit) quantization: pack the sign bits of `vec` into
    * 64-bit words — bit set iff the coordinate is >= 0, MSB-first within
    * each word (dim 64 → ONE long, a 32× compression over float32). Built
    * from shiftleft/bitwiseOR folds, so the packing is pure bit motion:
    * no arithmetic that ANSI overflow checking could reject, one codegen'd
    * projection, no shuffle. */
  def signBits(vec: Column, dim: Int): Column = {
    require(dim > 0 && dim % 64 == 0, s"dim must be a positive multiple of 64, got $dim")
    // native compiled loop ([[graft.sql.SignPackBits]]): the Column fold
    // below (kept as the executable spec) is a 64-deep expression tree PER
    // WORD — big enough that whole-stage codegen gives up on the stage,
    // dropping the scan + join + Hamming + shortlist pipeline into
    // interpreted execution (measured ~234 µs/row on the projection alone)
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.sql.SignPackBits(
        org.apache.spark.sql.graft.ColumnShim.expression(vec), dim))
  }

  /** shiftleft/bitwiseOR fold spelling of the same packing — the
    * executable specification [[graft.sql.SignPackBits]] is parity-tested
    * against. */
  def signBitsFold(vec: Column, dim: Int): Column = {
    require(dim > 0 && dim % 64 == 0, s"dim must be a positive multiple of 64, got $dim")
    val words = (0 until dim / 64).map { w =>
      (0 until 64).foldLeft(lit(0L): Column) { (acc, i) =>
        shiftleft(acc, 1).bitwiseOR(
          when(element_at(vec, w * 64 + i + 1) >= 0f, lit(1L)).otherwise(lit(0L)))
      }
    }
    array(words: _*)
  }

  /** Hamming distance between two [[signBits]] codes: Σ popcount(xor) per
    * word — dim/64 integer ops per pair where the exact path pays dim
    * float multiplies. STATICALLY UNROLLED over the (compile-time-known)
    * word count: the zip_with/aggregate HOF spelling falls out of
    * whole-stage codegen and was interpreted per PAIR — lambda dispatch
    * plus a fresh array allocation per candidate (~11 µs/pair; the s19
    * scan spent ~0.9 s of one-task CPU on an 80k-pair corpus).
    * element_at/xor/bit_count codegen; integer adds in the same
    * left-to-right word order, so distances are bit-identical. */
  def hammingDist(aBits: Column, bBits: Column, words: Int): Column = {
    require(words >= 1, s"words must be >= 1, got $words")
    (0 until words).map(w =>
      bit_count(element_at(aBits, w + 1).bitwiseXOR(element_at(bBits, w + 1)))
        .cast("long"))
      .reduce(_ + _)
  }

  /** HOF spelling of the same fold — the executable specification the
    * unrolled form is parity-tested against. */
  def hammingDistHof(aBits: Column, bBits: Column): Column =
    aggregate(zip_with(aBits, bBits,
      (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Approximate top-k via BINARY QUANTIZATION (the 1-bit "binary
    * embedding" path modern vector stores ship as their cheapest tier):
    * sign-bit codes give a Hamming-distance SHORTLIST of `shortlist`
    * candidates per query (popcount over packed longs — ~32× cheaper per
    * pair than the float dot), then exact cosine reranks the shortlist to
    * the final k.
    *
    * Plan shape: queries broadcast twice (once as packed bits for the
    * Hamming pass, once as embeddings for the rerank), the corpus scans
    * once per stage, and the only shuffles carry ≤ `shortlist` partials
    * per query per map task ([[graft.sql.TopKPairs]] with score =
    * −hamming, ties to the smaller id) and the shortlist-sized rerank
    * join. No all-pairs materialization, no corpus shuffle — the same
    * discipline as s01/s02, at 1-bit candidate-generation cost.
    * Recall lever: `shortlist` (the rerank is exact, so recall@k is
    * purely "did the true neighbor survive the Hamming cut"). */
  def binaryTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      shortlist: Int, dim: Int = EmbeddingDim): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val qb = queries.select(col("id").as("query_id"),
      signBits(col("embedding"), dim).as("q_bits"))
    val cb = corpus.select(col("id").as("neighbor_id"),
      signBits(col("embedding"), dim).as("c_bits"))
    val ham = cb.join(broadcast(qb), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (-hammingDist(col("q_bits"), col("c_bits"), dim / 64).cast("double")).as("cosine"))
    // shortlist = per-query top-`shortlist` by (hamming asc, id asc) via
    // the bounded aggregate (score = -hamming reuses its DESC ordering)
    val cands = topKByCosine(ham, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(cands, queries, corpus, k)
  }

  /** Exact-cosine rerank of a (query_id, neighbor_id) shortlist — the
    * shared final stage of every shortlist-then-rerank tier
    * ([[binaryTopK]], [[sq8TopK]]): shortlist-sized joins only, queries
    * broadcast, top-k through the bounded aggregate. */
  private def exactRerank(cands: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
      l2Norm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("c_emb"),
      l2Norm(col("embedding")).as("c_norm"))
    val rescored = cands
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    topKByCosine(rescored, k)
  }

  /** Approximate top-k via SYMMETRIC INT8 SCALAR QUANTIZATION with
    * asymmetric distance — the SQ8 tier every production vector store
    * ships between binary codes and PQ: corpus vectors store int8 codes
    * plus one scale ([[int8Scale]]/[[int8Codes]], 4× compression), the
    * query stays float, and the ADC cosine estimate needs NO
    * dequantization pass:
    *
    *   cos(q, x̂) = (scale·Σ q_d·code_d) / (|q| · scale·|code|)
    *             = Σ q_d·code_d / (|q| · |code|)
    *
    * — the per-vector scale CANCELS, so the estimate is one float×int
    * fold per pair plus two precomputed norms (the scale still matters
    * at rest: it is what bounds the reconstruction error the estimate
    * inherits, s04's max_err). All-zero corpus vectors (code norm 0)
    * estimate −2, below any cosine, so they sort last instead of
    * dividing by zero.
    *
    * Plan shape: identical to [[binaryTopK]] — corpus coded in one
    * projection, queries broadcast, estimates shortlist `shortlist`
    * candidates per query through the bounded TopKPairs aggregate
    * (estimate DESC, id ASC), exact cosine reranks to the final k. No
    * all-pairs shuffle; recall lever = `shortlist` (the rerank is
    * exact). Measured on the fixture corpus: recall@5 ≈ 1.0 at
    * shortlist 50 — int8 quantization noise is far below the
    * inter-neighbor cosine gaps, which is exactly why SQ8 is the
    * default cheap tier. */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    // scale lands in its own projection first (the s04 discipline): inlined
    // into the transform lambda, Catalyst would re-evaluate the array_max
    // per ELEMENT — O(dim²) per row instead of O(dim)
    val cb = corpus.select(col("id").as("neighbor_id"), col("embedding"),
        int8Scale(col("embedding")).as("scale"))
      .select(col("neighbor_id"),
        int8Codes(col("embedding"), col("scale")).as("codes"))
      .withColumn("code_norm", sqrt(aggregate(col("codes"),
        lit(0L), (a, v) => a + (v * v).cast("long")).cast("double")))
    val qb = queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
      l2Norm(col("embedding")).as("q_norm"))
    val est = cb.join(broadcast(qb), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        // the q·code fold through the NATIVE codegen'd dot: codes are
        // int8-valued, so the int→float cast is exact and the
        // (float→double)·(float→double) sequential fold is bit-identical
        // to the HOF spelling this replaces — which was interpreted per
        // PAIR (lambda dispatch + array allocation per candidate)
        when(col("code_norm") === 0.0, lit(-2.0)).otherwise(
          dot(col("q_emb"), col("codes").cast("array<float>"))
            / (col("q_norm") * col("code_norm"))).as("cosine"))
    val cands = topKByCosine(est, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(cands, queries, corpus, k)
  }

  /** Rank scored pairs within each query with a WINDOW: cosine DESC,
    * neighbor ASC, keep rank ≤ k. Kept as the executable specification the
    * bounded-aggregate plan is parity-tested against — the window shuffles
    * EVERY scored pair to its query's partition, which is the weak plan at
    * 100× corpus; production paths go through [[topKByCosine]]. */
  def topKByCosineWindow(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per-query top-k over scored (query_id, neighbor_id, cosine) rows via
    * the bounded [[graft.sql.TopKPairs]] aggregate: PARTIAL-aggregates, so
    * each map task ships ≤ k pairs per query to the shuffle. Identical
    * output and tie-breaks (cosine DESC, neighbor ASC) to the window
    * specification — the plan difference is the point. */
  def topKByCosine(scored: DataFrame, k: Int): DataFrame = {
    val topAgg = org.apache.spark.sql.graft.ColumnShim.column(
      graft.sql.TopKPairs(
        org.apache.spark.sql.graft.ColumnShim.expression(col("cosine")),
        org.apache.spark.sql.graft.ColumnShim.expression(col("neighbor_id")),
        k).toAggregateExpression())
    scored
      .groupBy(col("query_id"))
      .agg(topAgg.as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("neighbor_id"), col("hit.score").as("cosine"))
  }

  /** Deterministic ±1 Johnson–Lindenstrauss projection weights for output
    * dim `d` over `inDim` inputs: sign of (md5 of "d_i") — any engine
    * recomputes the identical matrix from the same md5, so projections are
    * oracle-exact (no RNG, no stored model). */
  def jlWeights(d: Int, inDim: Int): Array[Float] =
    Array.tabulate(inDim) { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${d}_${i + 1}".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0f else -1.0f
    }

  /** Johnson–Lindenstrauss random projection `inDim → outDim` (Achlioptas
    * 2003 ±1 variant): each output coordinate is one native [[dot]] against
    * a broadcast-literal ±1 row — `outDim` codegen'd folds per vector,
    * map-only, no shuffle. Pairwise distances are preserved within the JL
    * bound in expectation (spec-measured), which is what lets every
    * downstream ANN / dedup kernel run at outDim/inDim of the cost.
    * Output: (idCol, proj_0 … proj_{outDim−1}). */
  def jlProject(df: org.apache.spark.sql.DataFrame, idCol: String, embCol: String,
      inDim: Int, outDim: Int): org.apache.spark.sql.DataFrame = {
    require(inDim > 0 && outDim > 0 && outDim <= inDim,
      s"need 0 < outDim <= inDim, got inDim=$inDim outDim=$outDim")
    val cols = col(idCol) +: (0 until outDim).map { d =>
      val w = jlWeights(d, inDim).map(v => lit(v): Column)
      dot(col(embCol), array(w: _*)).as(s"proj_$d")
    }
    df.select(cols: _*)
  }

  /** Score every (query, corpus) pair: broadcast query side, one corpus
    * scan, no corpus shuffle. */
  private def scoreAllPairs(queries: DataFrame, corpus: DataFrame): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
      l2Norm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("c_emb"),
      l2Norm(col("embedding")).as("c_norm"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
  }

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * `queries`/`corpus`: (id, embedding). Queries are broadcast; the only
    * shuffle carries ≤ k partial pairs per query per map task. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    topKByCosine(scoreAllPairs(queries, corpus), k)

  /** Window-plan variant of [[bruteForceTopK]] — executable specification
    * for the parity spec only (shuffles every scored pair). */
  def bruteForceTopKWindow(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    topKByCosineWindow(scoreAllPairs(queries, corpus), k)

  /** Approximate top-k: candidates are corpus vectors sharing at least one
    * hash-table bucket with the query (after Hamming-≤`probeRadius`
    * multi-probe on the query side), then exact cosine on candidates only.
    *
    * Plan shape: corpus bucketed once (per-row compiled map, L keys/row) and
    * exploded to (table, bucket) postings; the query side (small) explodes
    * further to its probe keys per table and broadcasts; candidate
    * generation is a broadcast equi-join on (table, bucket) → distinct pairs
    * → exact scoring join. No cross product, no hot keys (bucket occupancy
    * ≈ n/2^b by construction), shuffles linear in candidate count.
    *
    * Recall levers at fixed plane family: `probeRadius` (0 = exact buckets
    * only, 1 = default, 2 = +b(b−1)/2 more probes per table) and the table
    * count in [[Planes]]. Both multiply only the (small, broadcast) query
    * side. */
  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998) greedy
    * diversity rerank over a SHORTLIST: k rounds of
    * argmax λ·rel(d) − μ·max_{s∈S} sim(d, s) — the standard final stage
    * after ANN candidate generation, trading relevance against redundancy.
    *
    * Scale shape: MMR is always a rerank (the shortlist comes from
    * s01/s02/s05/s06-style top-k, 10²–10³ rows); each round is one
    * filtered max-aggregation + TakeOrdered(1) over the shortlist, fully
    * distributed, and only the single winning id reaches the driver per
    * round (the Bpe.train discipline). Scores round to 9 decimals with an
    * id tie-break, so the greedy trajectory is engine-exact; pass λ and μ
    * as separate literals (μ = 1−λ computed in DOUBLE would differ from a
    * 0.3 literal by 1 ulp and can flip a pick).
    *
    * `sims` holds DIRECTED pairs (aCol = candidate, bCol = potential
    * selected, simCol double); provide both directions for symmetric
    * similarity. Returns (idCol, pick 1..k, mmr_score). */
  def mmrRerank(cands: DataFrame, idCol: String, relCol: String,
      sims: DataFrame, aCol: String, bCol: String, simCol: String,
      lambdaRel: Double, muDiv: Double, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = cands.sparkSession
    import spark.implicits._
    var picks = Vector.empty[(Long, Int, Double)]
    var done = false
    for (i <- 1 to k if !done) {
      val selIds = picks.map(_._1)
      val scored =
        if (selIds.isEmpty)
          cands.withColumn("mmr_score", round(lit(lambdaRel) * col(relCol), 9))
        else {
          val relSims = sims.filter(col(bCol).isInCollection(selIds))
            .groupBy(col(aCol).as(idCol)).agg(max(col(simCol)).as("max_sim"))
          cands.filter(!col(idCol).isInCollection(selIds))
            .join(relSims, Seq(idCol), "left")
            .withColumn("mmr_score",
              round(lit(lambdaRel) * col(relCol)
                - lit(muDiv) * coalesce(col("max_sim"), lit(0.0)), 9))
        }
      val winner = scored.orderBy(col("mmr_score").desc, col(idCol).asc)
        .select(col(idCol).cast("long"), col("mmr_score")).limit(1).collect()
      if (winner.isEmpty) done = true
      else picks :+= ((winner(0).getLong(0), i, winner(0).getDouble(1)))
    }
    picks.toDF(idCol, "pick", "mmr_score")
  }

  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, probeRadius: Int = 1): DataFrame = {
    val cPostings = corpus.select(col("id").as("neighbor_id"),
      posexplode(tableKeys(col("embedding"))).as(Seq("table_id", "bucket")))
    lshTopKFromPostings(queries, corpus, cPostings, k, probeRadius)
  }

  /** [[lshTopK]] probing a PREBUILT posting index
    * (neighbor_id, table_id, bucket) — the at-rest deployment shape: corpus
    * band keys are computed once at write time (they are pure functions of
    * the embedding) and every query amortizes that pass. Same plan from the
    * probe join on. */
  def lshTopKFromPostings(queries: DataFrame, corpus: DataFrame,
      cPostings: DataFrame, k: Int, probeRadius: Int = 1): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 2, s"probeRadius 0..2, got $probeRadius")
    val cBase = corpus.select(col("id").as("neighbor_id"), col("embedding").as("c_emb"),
      l2Norm(col("embedding")).as("c_norm"))
    val qBase = queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
      l2Norm(col("embedding")).as("q_norm"))
    val qKeys = queries.select(col("id").as("query_id"),
      posexplode(tableKeys(col("embedding"))).as(Seq("table_id", "qbucket")))
    // multi-probe: the exact key, every single-bit flip at radius ≥ 1, and
    // every two-bit flip at radius 2
    val flips1 = (0 until PlaneBits).map(j => col("qbucket").bitwiseXOR(lit(1L << j)))
    val flips2 = for (i <- 0 until PlaneBits; j <- i + 1 until PlaneBits)
      yield col("qbucket").bitwiseXOR(lit((1L << i) | (1L << j)))
    val probeCols = Seq(col("qbucket")) ++
      (if (probeRadius >= 1) flips1 else Seq.empty) ++
      (if (probeRadius >= 2) flips2 else Seq.empty)
    val probes = array(probeCols: _*)
    val qPostings = qKeys.select(col("query_id"), col("table_id"),
      explode(probes).as("bucket"))
    val candidates = cPostings.join(broadcast(qPostings), Seq("table_id", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val scored = candidates
      .join(cBase, "neighbor_id")
      .join(broadcast(qBase), "query_id")
      .withColumn("cosine", dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    topKByCosine(scored, k)
  }
}
