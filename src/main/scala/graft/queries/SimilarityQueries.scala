package graft.queries

import graft.Graft.table
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity-search operator queries over `embeddings` — exact brute-force
  * cosine top-k (the correctness baseline) and the LSH sign-bucketed
  * approximate variant (the 100 TB scale path: bucket equi-join instead of a
  * cross product).
  *
  * Query set = every 50th vector (deterministic, scales with sf). k = 5.
  * Cosines are identical double folds on both engines; ranking breaks ties
  * on neighbor_id so row sets match exactly.
  */
object SimilarityQueries {

  private val duckDot =
    "list_aggregate(list_transform(range(1, len(q_emb)+1), i -> CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE)), 'sum')"
  private def duckNorm(c: String) =
    s"sqrt(list_aggregate(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"

  /** Exact cosine top-5 neighbors per query vector — broadcast query side,
    * single corpus scan, bounded TopKPairs partial aggregation (each map
    * task ships ≤ k pairs per query; no full scored-pair shuffle). */
  val s01BruteForceTopK = GraftQuery(
    "s01_cosine_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Similarity.bruteForceTopK(q, e, 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id % 50 = 0),
      c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings),
      scored AS (
        SELECT query_id, neighbor_id,
               $duckDot / (${duckNorm("q_emb")} * ${duckNorm("c_emb")}) AS cos_raw
        FROM c CROSS JOIN q
        WHERE query_id <> neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cos_raw, 6) AS cosine
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    bench = true)

  /** Multi-table random-hyperplane LSH approximate top-5 with Hamming-1
    * multi-probe (L=12 tables × 8 sign bits — tuning and measured recall@5 =
    * 0.70 in Similarity.scala): bucket postings equi-join replaces the cross
    * product; candidates get exact cosine. The oracle restates the identical
    * planes as interpolated integer literals, so the hash-match covers the
    * whole pipeline — bucketing, probing, candidate set, and scores. */
  val s02LshTopK = GraftQuery(
    "s02_lsh_ann_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Similarity.lshTopK(q, e, 5)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some {
      val planeRows = (for (t <- 0 until Similarity.PlaneTables;
                            j <- 0 until Similarity.PlaneBits) yield {
        val ints = (0 until Similarity.EmbeddingDim)
          .map(i => Similarity.planeCoefficientInt(t, j, i)).mkString("[", ", ", "]")
        s"($t, $j, $ints)"
      }).mkString(",\n        ")
      s"""
      WITH planes(table_id, bit_id, ci) AS (VALUES
        $planeRows),
      keys AS (
        SELECT vec_id, table_id,
               SUM(CASE WHEN dotv >= 0 THEN (CAST(1 AS BIGINT) << CAST(bit_id AS INT))
                        ELSE CAST(0 AS BIGINT) END) AS bucket
        FROM (
          SELECT e.vec_id, p.table_id, p.bit_id,
                 list_aggregate(list_transform(range(1, ${Similarity.EmbeddingDim + 1}),
                   i -> ((ci[CAST(i AS INT)] - 20000) / 10000.0)
                        * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)), 'sum') AS dotv
          FROM embeddings e CROSS JOIN planes p) d
        GROUP BY 1, 2),
      qp AS (
        SELECT query_id, table_id,
               unnest([bucket0] || list_transform(range(0, ${Similarity.PlaneBits}),
                 j -> xor(bucket0, CAST(1 AS BIGINT) << CAST(j AS INT)))) AS bucket
        FROM (SELECT vec_id AS query_id, table_id, bucket AS bucket0
              FROM keys WHERE vec_id % 50 = 0) qk),
      cand AS (
        SELECT DISTINCT qp.query_id, c.vec_id AS neighbor_id
        FROM qp JOIN keys c ON qp.table_id = c.table_id AND qp.bucket = c.bucket
        WHERE qp.query_id <> c.vec_id),
      pairs AS (
        SELECT cand.query_id, cand.neighbor_id, qe.embedding AS q_emb, ce.embedding AS c_emb
        FROM cand
        JOIN embeddings qe ON cand.query_id = qe.vec_id
        JOIN embeddings ce ON cand.neighbor_id = ce.vec_id),
      scored AS (
        SELECT query_id, neighbor_id,
               $duckDot / (${duckNorm("q_emb")} * ${duckNorm("c_emb")}) AS cos_raw
        FROM pairs),
      ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cos_raw, 6) AS cosine
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""
    },
    bench = true,
    benchRun = Some((s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Similarity.lshTopKFromPostings(q, e, BenchIndex.lshPostings(s, dir), 5)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }))

  /** Same exact top-5 as s01 via the same bounded TopKPairs aggregate —
    * retained as a separate inventory row from the round the aggregate plan
    * was introduced; since round 2 it IS the standard plan (s01 routes
    * through it too, and the old every-pair window plan survives only as
    * the parity-tested specification `Similarity.bruteForceTopKWindow`). */
  val s03BruteForceTopKAgg = GraftQuery(
    "s03_cosine_topk_agg",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Similarity.bruteForceTopK(q, e, 5)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    s01BruteForceTopK.oracle,
    bench = true)

  /** Symmetric int8 quantization of the embedding column (scale = max|x|/127,
    * round-half-up codes spelled as floor(x/s + 0.5) so no engine's round()
    * tie-breaking can diverge): per-vector scale, exact integer code sum,
    * max |code|, and max reconstruction error. The 4×-compression storage
    * op a training pipeline applies before shipping embeddings; per-row, no
    * shuffle. */
  val s04Int8Quantize = GraftQuery(
    "s04_int8_quantize",
    (s, dir) => {
      val x = col("embedding")
      val scale = Similarity.int8Scale(x)
      val q = Similarity.int8Codes(x, col("scale"))
      table(s, dir, "embeddings")
        .select(col("vec_id"), x.as("embedding"), scale.as("scale"))
        .select(col("vec_id"), col("embedding"), col("scale"), q.as("q"))
        // NOTE: rounding `scale` must happen in a LATER projection — Spark's
        // lateral-column-alias resolution would otherwise bind the
        // col("scale") inside the error expression to a same-select
        // `round(scale, 6).as("scale")` alias, silently quantizing the
        // reconstruction math (caught by the oracle hash gate).
        .select(
          col("vec_id"),
          col("scale"),
          aggregate(col("q"), lit(0L), (acc, v) => acc + v).as("sum_q"),
          array_max(transform(col("q"), v => abs(v))).as("max_abs_q"),
          round(array_max(zip_with(col("embedding"), col("q"),
            (v, qq) => abs(v.cast("double") - qq.cast("double") * col("scale")))), 6).as("max_err"))
        .select(col("vec_id"), round(col("scale"), 6).as("scale"),
          col("sum_q"), col("max_abs_q"), col("max_err"))
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH scaled AS (
        SELECT vec_id, embedding,
               CASE WHEN list_aggregate(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))), 'max') = 0
                    THEN 1.0
                    ELSE list_aggregate(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))), 'max') / 127.0
               END AS scale
        FROM embeddings),
      coded AS (
        SELECT vec_id, embedding, scale,
               list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) / scale + 0.5) AS INT)) AS q
        FROM scaled)
      SELECT vec_id,
             round(scale, 6) AS scale,
             CAST(list_aggregate(q, 'sum') AS BIGINT) AS sum_q,
             CAST(list_aggregate(list_transform(q, v -> abs(v)), 'max') AS INT) AS max_abs_q,
             round(list_aggregate(
               list_transform(range(1, len(embedding)+1),
                 i -> abs(CAST(embedding[i] AS DOUBLE) - CAST(q[i] AS DOUBLE) * scale)), 'max'), 6) AS max_err
      FROM coded
      ORDER BY vec_id"""))

  /** Johnson–Lindenstrauss ±1 projection 64 → 16 dims (Achlioptas 2003):
    * each output coordinate is one native dot against a broadcast-literal
    * ±1 row derived from md5("d_i") — deterministic, no RNG, no stored
    * model, so the oracle recomputes the identical matrix from the same
    * md5 and the projections hash-match. Map-only, no shuffle: downstream
    * ANN/dedup kernels run at 1/4 the per-vector cost (distance
    * distortion measured in the spec against the JL bound). */
  val s07JlProjection = GraftQuery(
    "s07_jl_projection", {
      (s, dir) =>
        Similarity.jlProject(
            table(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
            "vec_id", "embedding", inDim = 64, outDim = 16)
          .select(col("vec_id") +:
            (0 until 16).map(d => round(col(s"proj_$d"), 6).as(s"proj_$d")): _*)
          .orderBy(col("vec_id"))
    },
    Some {
      val projCols = (0 until 16).map { d =>
        s"""round(list_aggregate(list_transform(range(1, 65),
           i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE) *
                (CASE WHEN ('0x' || substr(md5('${d}_' || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                      THEN 1.0 ELSE -1.0 END)), 'sum'), 6) AS proj_$d"""
      }.mkString(",\n             ")
      s"""
      SELECT vec_id,
             $projCols
      FROM embeddings
      ORDER BY vec_id"""
    })

  /** MMR diversity rerank ([[Similarity.mmrRerank]]): top-20 cosine
    * shortlist for query vector 0, then 10 greedy rounds of
    * argmax 0.7·rel − 0.3·max-sim-to-selected. The oracle UNROLLS the 10
    * rounds as chained CTEs (greedy selection is not one SQL expression,
    * but each round is), so the hash-match covers the whole trajectory —
    * shortlist, pairwise sims, and every pick in order. */
  val s08MmrRerank = GraftQuery(
    "s08_mmr_rerank",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") === 0).select(col("embedding").as("q_emb"))
      val scored = e.filter(col("id") =!= 0).crossJoin(broadcast(q))
        .select(col("id"), col("embedding"),
          round(Similarity.dot(col("embedding"), col("q_emb"))
            / (Similarity.l2Norm(col("embedding")) * Similarity.l2Norm(col("q_emb"))), 9)
            .as("rel"))
      // materialize the 20-row shortlist once — 10 rerank rounds re-read it
      val short = scored.orderBy(col("rel").desc, col("id").asc).limit(20)
        .localCheckpoint()
      val a = short.select(col("id").as("a"), col("embedding").as("ea"))
      val b = short.select(col("id").as("b"), col("embedding").as("eb"))
      val sims = a.crossJoin(broadcast(b)).filter(col("a") =!= col("b"))
        .select(col("a"), col("b"),
          round(Similarity.dot(col("ea"), col("eb"))
            / (Similarity.l2Norm(col("ea")) * Similarity.l2Norm(col("eb"))), 9).as("sim"))
        .localCheckpoint()
      Similarity.mmrRerank(short.select(col("id"), col("rel")), "id", "rel",
          sims, "a", "b", "sim", lambdaRel = 0.7, muDiv = 0.3, k = 10)
        .orderBy(col("pick"))
    },
    Some {
      def dotOf(x: String, y: String) =
        s"list_aggregate(list_transform(range(1, len($x)+1), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), 'sum')"
      val rounds = (2 to 10).map { i =>
        s"""      sc$i AS MATERIALIZED (
        SELECT c.id, round(0.7 * c.rel - 0.3 * COALESCE(
            (SELECT max(s.sim) FROM sims s
             WHERE s.a = c.id AND s.b IN (SELECT id FROM acc${i - 1})), 0), 9) AS score
        FROM short c WHERE c.id NOT IN (SELECT id FROM acc${i - 1})),
      sel$i AS MATERIALIZED (SELECT id, $i AS pick, score FROM sc$i ORDER BY score DESC, id ASC LIMIT 1),
      acc$i AS MATERIALIZED (SELECT * FROM acc${i - 1} UNION ALL SELECT * FROM sel$i)"""
      }.mkString(",\n")
      s"""
      WITH q AS MATERIALIZED (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
      c0 AS (SELECT vec_id AS id, embedding AS c_emb FROM embeddings WHERE vec_id <> 0),
      scored AS MATERIALIZED (
        SELECT id, round(${dotOf("c_emb", "q_emb")}
            / (${duckNorm("c_emb")} * ${duckNorm("q_emb")}), 9) AS rel
        FROM c0 CROSS JOIN q),
      short0 AS MATERIALIZED (SELECT id, rel FROM scored ORDER BY rel DESC, id ASC LIMIT 20),
      sv AS MATERIALIZED (SELECT s.id, s.rel, e.embedding FROM short0 s JOIN embeddings e ON e.vec_id = s.id),
      short AS MATERIALIZED (SELECT id, rel FROM sv),
      sims AS MATERIALIZED (
        SELECT x.id AS a, y.id AS b,
               round(${dotOf("x.embedding", "y.embedding")}
                 / (sqrt(list_aggregate(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum'))
                    * sqrt(list_aggregate(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum'))), 9) AS sim
        FROM sv x JOIN sv y ON x.id <> y.id),
      sc1 AS (SELECT id, round(0.7 * rel, 9) AS score FROM short),
      sel1 AS MATERIALIZED (SELECT id, 1 AS pick, score FROM sc1 ORDER BY score DESC, id ASC LIMIT 1),
      acc1 AS MATERIALIZED (SELECT * FROM sel1),
$rounds
      SELECT id, CAST(pick AS INT) AS pick, score AS mmr_score
      FROM acc10 ORDER BY pick"""
    })

  /** kNN label-vote classification over the embedding corpus: exact top-10
    * cosine neighbors per query (bounded TopKPairs partial agg — ≤ k pairs
    * per map task, no scored-pair shuffle), then a neighbor_id equi-join to
    * the label column and a per-query majority vote. Ties break by vote
    * count desc → closest-neighbor rank asc → smaller label (total order,
    * so the oracle selects the identical winner). The label join shuffles
    * only k·|queries| rows against the corpus — at 100 TB that is the
    * k-bounded side, not an all-pairs product. */
  val s10KnnClassify = GraftQuery(
    "s10_knn_classify",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 37 === 0)
      val labels = table(s, dir, "embeddings")
        .select(col("vec_id").as("neighbor_id"), col("label").as("n_label"))
      val votes = Similarity.bruteForceTopK(q, e, 10)
        .join(labels, "neighbor_id")
        .groupBy(col("query_id"), col("n_label"))
        .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("votes").desc, col("best_rank").asc, col("n_label").asc)
      val pred = votes.withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1)
        .select(col("query_id"), col("n_label").as("pred_label"),
          col("votes").cast("bigint").as("votes"))
      val truth = table(s, dir, "embeddings")
        .select(col("vec_id").as("query_id"), col("label").as("true_label"))
      pred.join(truth, "query_id")
        .select(col("query_id"), col("true_label"), col("pred_label"), col("votes"))
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, label AS true_label
        FROM embeddings WHERE vec_id % 37 = 0),
      c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb, label AS n_label FROM embeddings),
      scored AS (
        SELECT query_id, true_label, neighbor_id, n_label,
               $duckDot / (${duckNorm("q_emb")} * ${duckNorm("c_emb")}) AS cos_raw
        FROM c CROSS JOIN q
        WHERE query_id <> neighbor_id),
      ranked AS (
        SELECT query_id, true_label, n_label,
               row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        FROM scored),
      votes AS (
        SELECT query_id, true_label, n_label,
               CAST(COUNT(*) AS BIGINT) AS votes, MIN(rank) AS best_rank
        FROM ranked WHERE rank <= 10
        GROUP BY query_id, true_label, n_label),
      best AS (
        SELECT query_id, true_label, n_label AS pred_label, votes,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY votes DESC, best_rank ASC, n_label ASC) AS r
        FROM votes)
      SELECT query_id, true_label, pred_label, votes
      FROM best WHERE r = 1
      ORDER BY query_id"""))

  /** Filtered vector search (s13): exact cosine top-5 restricted to corpus
    * rows passing a metadata predicate — the standard vector-DB "filtered
    * search" workload (retrieve only in-license / in-language / in-domain
    * neighbors). This is PRE-filtering: the predicate applies to the corpus
    * scan BEFORE any distance work (plan-audited to reach the parquet
    * scan), so cost scales with the surviving fraction — vs post-filtering
    * a top-k list, which under-fills k whenever the filter is selective.
    * Same bounded TopKPairs aggregation as s01; at IVF/PQ scale the same
    * predicate drops onto the code/posting tables (they carry the metadata
    * columns), leaving the probe shape unchanged. */
  val s13FilteredTopK = GraftQuery(
    "s13_filtered_topk",
    (s, dir) => {
      val emb = table(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("id"), col("embedding"))
      val corpus = emb.filter(col("label") % 2 === 0)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.bruteForceTopK(q, corpus, 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id % 50 = 0),
      c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings WHERE label % 2 = 0),
      scored AS (
        SELECT query_id, neighbor_id,
               $duckDot / (${duckNorm("q_emb")} * ${duckNorm("c_emb")}) AS cos_raw
        FROM c CROSS JOIN q
        WHERE query_id <> neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cos_raw, 6) AS cosine
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** Embedding-space outlier ranking (s14): cosine of every vector to its
    * own LABEL's centroid, ranked ascending within the label — the
    * SemDeDup/CLIP-score-style curation signal (lowest-cos rows are
    * mislabeled/out-of-distribution candidates; a pipeline prunes the
    * bottom ranks).
    *
    * Determinism: centroid dims are per-(label,dim) DECIMAL(28,9) sums of
    * round-9 values divided by the group count — exact, order-independent
    * (a float mean would depend on partitioning); the cosine itself is
    * then one sequential left-to-right double fold on both engines.
    * Scale shape: the dim explode map-combines down to |labels|·dim rows
    * (the only shuffle), centroids broadcast back, scoring is per-row; the
    * within-label rank windows on |label| partitions. */
  val s14CentroidOutliers = GraftQuery(
    "s14_centroid_outliers",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val e = table(s, dir, "embeddings")
      val dims = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      val cent = dims.groupBy(col("label"), col("dim"))
        .agg((sum(round(col("v").cast("double"), 9).cast(DecimalType(28, 9))).cast("double")
          / count(lit(1)).cast("double")).as("cv"))
      val carr = cent.groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x.getField("cv")).as("c"))
      val dot = aggregate(
        zip_with(col("embedding"), col("c"), (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)
      def norm(arr: org.apache.spark.sql.Column) = sqrt(aggregate(
        transform(arr, a => a.cast("double") * a.cast("double")),
        lit(0.0), (acc, x) => acc + x))
      e.join(broadcast(carr), Seq("label"))
        .select(col("vec_id"), col("label"),
          (dot / (norm(col("embedding")) * norm(col("c")))).as("cos_raw"))
        .select(col("vec_id"), col("label"), round(col("cos_raw"), 6).as("centroid_cos"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("label"))
            .orderBy(col("cos_raw").asc, col("vec_id").asc)).as("outlier_rank"))
        .orderBy(col("label"), col("outlier_rank"))
    },
    Some(s"""
      WITH dims AS (
        SELECT vec_id, label, i AS dim,
               CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
        FROM embeddings, LATERAL unnest(range(1, len(embedding) + 1)) AS t(i)),
      cent AS (
        SELECT label, dim,
               CAST(SUM(CAST(round(v, 9) AS DECIMAL(28,9))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS cv
        FROM dims GROUP BY label, dim),
      carr AS (SELECT label, list(cv ORDER BY dim) AS c FROM cent GROUP BY label),
      scored AS (
        SELECT e.vec_id, e.label,
               list_aggregate(list_transform(range(1, len(e.embedding) + 1),
                 i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * c[CAST(i AS INT)]), 'sum')
               / (${duckNorm("e.embedding")}
                  * sqrt(list_aggregate(list_transform(c, x -> x * x), 'sum'))) AS cos_raw
        FROM embeddings e JOIN carr USING (label))
      SELECT vec_id, label, round(cos_raw, 6) AS centroid_cos,
             CAST(row_number() OVER (PARTITION BY label ORDER BY cos_raw ASC, vec_id ASC)
               AS INT) AS outlier_rank
      FROM scored
      ORDER BY label, outlier_rank""")).copy(bench = true)

  /** Binary (1-bit) quantization ANN ([[Similarity.binaryTopK]]): sign-bit
    * codes packed into ONE long per 64-dim vector (32× compression), a
    * Hamming-distance shortlist of 50 per query (popcount over xor —
    * integer ops where the exact path pays float dots), exact cosine
    * rerank to top-5. The cheapest candidate-generation tier modern vector
    * stores ship; recall is whatever survives the Hamming cut (measured in
    * RecallAb), correctness is THIS oracle: DuckDB replays the sign
    * comparison, the (hamming, id)-ordered shortlist and the rerank
    * exactly. */
  val s19BinaryTopK = GraftQuery(
    "s19_binary_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Similarity.binaryTopK(q, e, 5, shortlist = 50, dim = 64)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id % 50 = 0),
      c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings),
      ham AS (
        SELECT query_id, neighbor_id, q_emb, c_emb,
               len(list_filter(range(1, 65),
                 i -> (CAST(q_emb[i] AS DOUBLE) >= 0) <> (CAST(c_emb[i] AS DOUBLE) >= 0))) AS h
        FROM c CROSS JOIN q
        WHERE query_id <> neighbor_id),
      short AS (
        SELECT query_id, neighbor_id, q_emb, c_emb,
               row_number() OVER (PARTITION BY query_id ORDER BY h ASC, neighbor_id ASC) AS rn
        FROM ham),
      rescored AS (
        SELECT query_id, neighbor_id,
               $duckDot / (${duckNorm("q_emb")} * ${duckNorm("c_emb")}) AS cos_raw
        FROM short WHERE rn <= 50),
      ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        FROM rescored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cos_raw, 6) AS cosine
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    bench = true)

  /** s20: SQ8 ADC top-k ([[graft.operators.Similarity.sq8TopK]]) — the
    * int8-scalar-quantized tier between s19's binary codes and s06/s11's
    * PQ: corpus stored as s04's codes (+ one scale, which CANCELS out of
    * the cosine estimate, so candidate generation is one float×int fold
    * per pair), estimate-ordered shortlist of 50 per query, exact cosine
    * rerank to top-5. The oracle replays the s04 quantizer, the estimate
    * fold in the identical element order, the (estimate, id)-ordered
    * shortlist and the rerank — quantizer, estimator, shortlist and
    * rerank all inside one hash gate. */
  val s20Sq8AdcTopK = GraftQuery(
    "s20_sq8_adc_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Similarity.sq8TopK(q, e, 5, shortlist = 50)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id % 50 = 0),
      c0 AS (
        SELECT vec_id AS neighbor_id, embedding AS c_emb,
               CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS scale
        FROM (SELECT vec_id, embedding,
                list_aggregate(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))), 'max') AS mx
              FROM embeddings)),
      coded AS (
        SELECT neighbor_id, c_emb,
               list_transform(c_emb, v -> CAST(floor(CAST(v AS DOUBLE) / scale + 0.5) AS INT)) AS codes
        FROM c0),
      cn AS (
        SELECT neighbor_id, c_emb, codes,
               sqrt(CAST(list_aggregate(list_transform(codes, v -> CAST(v * v AS BIGINT)), 'sum') AS DOUBLE)) AS code_norm
        FROM coded),
      est AS (
        SELECT query_id, neighbor_id, q_emb, c_emb,
               CASE WHEN code_norm = 0 THEN -2.0 ELSE
                 list_aggregate(list_transform(range(1, len(q_emb)+1),
                   i -> CAST(q_emb[i] AS DOUBLE) * CAST(codes[CAST(i AS INT)] AS DOUBLE)), 'sum')
                 / (${duckNorm("q_emb")} * code_norm) END AS est_cos
        FROM cn CROSS JOIN q
        WHERE query_id <> neighbor_id),
      short AS (
        SELECT query_id, neighbor_id, q_emb, c_emb,
               row_number() OVER (PARTITION BY query_id ORDER BY est_cos DESC, neighbor_id ASC) AS rn
        FROM est),
      rescored AS (
        SELECT query_id, neighbor_id,
               $duckDot / (${duckNorm("q_emb")} * ${duckNorm("c_emb")}) AS cos_raw
        FROM short WHERE rn <= 50),
      ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        FROM rescored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cos_raw, 6) AS cosine
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    bench = true)

  val all: Seq[GraftQuery] =
    Seq(s01BruteForceTopK, s02LshTopK, s03BruteForceTopKAgg, s04Int8Quantize,
      s07JlProjection, s08MmrRerank, s10KnnClassify, s13FilteredTopK,
      s14CentroidOutliers, s19BinaryTopK, s20Sq8AdcTopK)
}
