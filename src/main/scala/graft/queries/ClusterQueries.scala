package graft.queries

import graft.Graft.table
import graft.operators.{Clustering, Similarity}
import org.apache.spark.sql.functions._

/** Embedding-clustering operator queries over `embeddings` — deterministic
  * Voronoi cells (hash-seeded, ~√n cells), IVF approximate nearest
  * neighbors (probe nprobe cells, exact-score members), and SemDeDup-style
  * within-cell semantic dedup.
  *
  * Everything here runs on the UNREFINED seed cells: seed selection is a
  * pure md5 predicate and every score is a fixed per-row double fold, so
  * the DuckDB oracle reproduces cells, assignments, probes, candidates and
  * scores bit-for-bit (Lloyd-refined centroids involve cross-row float
  * sums whose order no two engines share — the kmeans operator is
  * spec-verified instead, see ClusteringSpec).
  */
object ClusterQueries {

  /** Probed cells per query — at ~√n cells this scores ~nprobe·√n
    * candidates instead of the corpus. Offline sweep on the fixtures (this
    * corpus is the documented hard regime: true neighbors at cos ≈ 0.3 over
    * a ≈ 0 background, so cell membership only weakly predicts
    * neighborhood): the round-9 frontier sweep (tools/RecallAb,
    * BASELINE.md) put the KNEE at nprobe=24 — candidate bound 0.90/0.94/
    * 0.87 @ sf0.001/0.01/0.1 vs 0.54/0.74/0.66 at the old default 12,
    * with nprobe=48 scanning every cell for ≤ +0.06 more — so 24 ships.
    * Unlike LSH the candidate fraction falls as the corpus grows (fixed
    * nprobe over ~√n cells: 62% of these tiny fixtures' 39 cells, 0.08%
    * of a 1B-vector corpus's 31623). */
  val NProbe = 24

  /** Candidate budget for the SHIPPED probe config (s05/s11/s15, r11):
    * every IVF-family probe now selects cells by the s18 budget rule
    * (cells in centroid-cos order until this many members are covered)
    * instead of a fixed cell count — fixed-nprobe cost is hostage to
    * cell-size skew (s17's own signal). 1200 ≈ the exact-scoring volume
    * nprobe=24 did at sf0.1 (24/39 cells × 2000 vectors ≈ 1231), so cost
    * and recall carry over; at smaller fixtures the budget covers the
    * whole corpus exactly as nprobe=24 covered every cell. s18 keeps the
    * tighter 1000 budget as a second point on the cost/recall frontier. */
  val IvfBudget = 1200L

  /** Within-cell near-dup cosine threshold (same corpus regime as d06's
    * all-pairs 0.4 — d08 finds the same pairs when they share a cell). */
  val MinCosine = 0.4

  private val duckDot =
    "list_aggregate(list_transform(range(1, len(q_emb)+1), i -> CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE)), 'sum')"

  /** Shared oracle CTEs: norms → stride (1-row scalar) → seed cells →
    * all (vector, cell) cosines → nearest-cell assignment. Mirrors
    * Clustering.seedCells/assignCells exactly (md5 stride predicate;
    * ties cos DESC, cell_id ASC; zero-norm vectors dropped). */
  private val duckCellCtes = s"""
      nrm AS (
        SELECT vec_id, embedding,
               sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nm
        FROM embeddings),
      par AS (
        SELECT greatest(1, CAST(floor(COUNT(*) /
                 greatest(1, CAST(ceil(sqrt(COUNT(*))) AS BIGINT))) AS BIGINT)) AS stride
        FROM embeddings),
      cents AS (
        SELECT vec_id AS cell_id, embedding AS c_emb, nm AS c_nm
        FROM nrm, par
        WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % stride = 0),
      cell_scored AS (
        SELECT v.vec_id, c.cell_id,
               list_aggregate(list_transform(range(1, len(v.embedding)+1),
                 i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)), 'sum')
                 / (v.nm * c.c_nm) AS cos
        FROM nrm v CROSS JOIN cents c
        WHERE v.nm > 0),
      assign AS (
        SELECT vec_id, cell_id, cos AS cell_cos
        FROM (SELECT vec_id, cell_id, cos,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY cos DESC, cell_id ASC) AS rn
              FROM cell_scored) z
        WHERE rn = 1)"""

  /** Oracle replay of the shipped BUDGET probe ([[Clustering]]'s
    * budgetProbes / the s18 rule): the prefix of cells in (cos desc,
    * cell_id asc) order that starts before `budget` members are covered —
    * a window cumsum over per-cell member counts. */
  private def duckBudgetProbes(budget: Long) = s"""
      sizes AS (
        SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS cell_n
        FROM assign GROUP BY cell_id),
      probes AS (
        SELECT query_id, cell_id
        FROM (SELECT cs.vec_id AS query_id, cs.cell_id,
                     coalesce(sz.cell_n, 0) AS cell_n,
                     SUM(coalesce(sz.cell_n, 0)) OVER (PARTITION BY cs.vec_id
                       ORDER BY cs.cos DESC, cs.cell_id ASC) AS cum
              FROM cell_scored cs LEFT JOIN sizes sz ON cs.cell_id = sz.cell_id
              WHERE cs.vec_id % 50 = 0) z
        WHERE cum - cell_n < $budget)"""

  /** IVF approximate top-5 neighbors (same query set and output shape as
    * s01/s02): probe seed cells under the [[IvfBudget]] candidate budget,
    * exact cosine on their members only. The approximation is WHICH pairs
    * get scored; every score is exact, and the oracle replays the
    * identical probe set. */
  val s05IvfTopK = GraftQuery(
    "s05_ivf_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Clustering.ivfTopK(q, e, 5, NProbe, candidateBudget = Some(IvfBudget))
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $duckCellCtes,
      ${duckBudgetProbes(IvfBudget)},
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assign a ON p.cell_id = a.cell_id
        WHERE p.query_id <> a.vec_id),
      pairs AS (
        SELECT cand.query_id, cand.neighbor_id,
               q.embedding AS q_emb, q.nm AS q_nm, c.embedding AS c_emb, c.nm AS c_nm
        FROM cand
        JOIN nrm q ON cand.query_id = q.vec_id
        JOIN nrm c ON cand.neighbor_id = c.vec_id),
      scored AS (
        SELECT query_id, neighbor_id, $duckDot / (q_nm * c_nm) AS cos_raw
        FROM pairs),
      ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
             round(cos_raw, 6) AS cosine
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    bench = true,
    benchRun = Some((s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      val (cells, assign) = BenchIndex.ivf(s, dir)
      Clustering.ivfTopKFromIndex(q, e, cells, assign, 5, NProbe,
          candidateBudget = Some(IvfBudget))
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }))

  /** SemDeDup semantic near-dup over embedding cells: pairwise cosine only
    * WITHIN a cell (pair product n² → ~n^1.5), drop any vector with a
    * smaller-id in-cell near-dup. Full corpus verdict, hash-checked. */
  val d08SemanticDedup = GraftQuery(
    "d08_semantic_dedup",
    (s, dir) =>
      Clustering.semanticDedup(
          table(s, dir, "embeddings"), "vec_id", "embedding", MinCosine)
        .orderBy(col("vec_id")),
    Some(s"""
      WITH $duckCellCtes,
      mem AS (
        SELECT a.cell_id, a.vec_id, n.embedding, n.nm
        FROM assign a JOIN nrm n ON a.vec_id = n.vec_id),
      sp AS (
        SELECT x.vec_id AS id_a, y.vec_id AS id_b,
               list_aggregate(list_transform(range(1, len(x.embedding)+1),
                 i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)), 'sum')
                 / (x.nm * y.nm) AS cos
        FROM mem x JOIN mem y ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id),
      dropped AS (SELECT DISTINCT id_b FROM sp WHERE cos >= $MinCosine)
      SELECT a.vec_id, a.cell_id, (d.id_b IS NULL) AS kept
      FROM assign a LEFT JOIN dropped d ON a.vec_id = d.id_b
      ORDER BY a.vec_id"""))

  /** Cell profile: member count and cosine-to-centroid spread per cell.
    * min/max are order-independent (unlike avg), so the profile is exact
    * cross-engine; the bench/capacity question it answers — are cells
    * balanced (~√n members, no hot cell)? — is the one that decides
    * whether the IVF probe join has skew. */
  val c10CellProfile = GraftQuery(
    "c10_cell_profile",
    (s, dir) => {
      val e = table(s, dir, "embeddings")
      val cells = Clustering.seedCells(e, "vec_id", "embedding")
      Clustering.assignCells(e, "vec_id", "embedding", cells)
        .groupBy(col("cell_id"))
        .agg(count(lit(1)).as("members"),
          round(min(col("cell_cos")), 6).as("min_cos"),
          round(max(col("cell_cos")), 6).as("max_cos"))
        .orderBy(col("cell_id"))
    },
    Some(s"""
      WITH $duckCellCtes
      SELECT cell_id, COUNT(*) AS members,
             round(min(cell_cos), 6) AS min_cos,
             round(max(cell_cos), 6) AS max_cos
      FROM assign
      GROUP BY cell_id
      ORDER BY cell_id"""))

  /** Spark-side PQ geometry: 64-dim embeddings, 16 subspaces of 4 dims.
    * Round-12 sweep (tools/RecallAb `[subspace]`, BASELINE.md): the r11
    * budget frontier was ESTIMATOR-limited (probe bound 0.880 vs s11
    * 0.750 / s15 0.645 at sf0.1, budget 1200); finer slices against the
    * same √n codebook close it — 16×4 lifts recall@5 to s11 0.865 /
    * s15 0.825, and 32×2 saturates the candidate bound outright
    * (0.880/0.880) at 2× the lookup cost and half the compression.
    * 16×4 ships: both variants clear 0.80 with the ~18× at-rest
    * compression story intact (16 codes ≈ 14 B packed vs 256 B raw). */
  val NumSub = 16
  val SubDim = 4

  /** DuckDB fold identical to the Spark side's sliced FloatVecDot: slice
    * `[m·SubDim+1, m·SubDim+SubDim]`, cast each float to double, multiply,
    * sum in order. */
  private def duckSubDot(x: String, y: String) =
    s"""list_aggregate(list_transform(range(1, $SubDim + 1),
          i -> CAST($x[CAST(i AS INT)] AS DOUBLE) * CAST($y[CAST(i AS INT)] AS DOUBLE)), 'sum')"""

  /** Full-vector fold, identical to the Spark side's FloatVecDot. */
  private def duckFullDot(x: String, y: String) =
    s"""list_aggregate(list_transform(range(1, len($x) + 1),
          i -> CAST($x[CAST(i AS INT)] AS DOUBLE) * CAST($y[CAST(i AS INT)] AS DOUBLE)), 'sum')"""

  private def duckSubDist2(v: String, c: String): String = {
    val vs = s"list_slice($v, m*$SubDim + 1, m*$SubDim + $SubDim)"
    val cs = s"list_slice($c, m*$SubDim + 1, m*$SubDim + $SubDim)"
    s"(${duckSubDot(vs, vs)} + ${duckSubDot(cs, cs)} - 2.0 * ${duckSubDot(vs, cs)})"
  }

  /** Subspace dot of the m-th slices — the FloatSubDot fold. */
  private def duckSubDotM(x: String, y: String): String = {
    val xs = s"list_slice($x, m*$SubDim + 1, m*$SubDim + $SubDim)"
    val ys = s"list_slice($y, m*$SubDim + 1, m*$SubDim + $SubDim)"
    duckSubDot(xs, ys)
  }

  /** PQ shortlist size before exact re-rank (the IVFADC refinement step).
    * Round-9 frontier (tools/RecallAb, BASELINE.md): above nprobe=12 the
    * binding constraint flips from candidates to the SHORTLIST — at sf0.1
    * s11 plateaus at 0.60 under rerank=100 while the candidate bound hits
    * 1.0; rerank=200 lifts it to 0.74 (0.81 at 400, diminishing). 200
    * ships. Under the round-12 16×4 geometry (see [[NumSub]]) the
    * rerank-200 recalls at the shipped budget are s11 0.865 / s15 0.825
    * (sf0.1) with raw ADC at 0.265 — the finer estimator means the
    * shortlist wastes fewer of its 200 slots on mis-ranked candidates. */
  val PqRerank = 200

  /** Product-quantization ADC top-5 with exact re-rank (Jégou et al. 2011;
    * same query set and shape as s01/s02/s05): the corpus is quantized to
    * per-subspace nearest seed codes, a query's distance to EVERY codebook
    * entry per subspace is precomputed (one broadcast row per query), and
    * the corpus-code scan estimates distances by numSub map lookups per row — no
    * corpus shuffle, no original vectors touched by the estimate. The
    * PQ-estimate shortlist (PqRerank per query) is then exact-scored in one
    * broadcast join against the corpus scan. Subspace distances are rounded
    * to 9 decimals and summed as DECIMAL(28,9) (exact, order-independent —
    * t11's discipline), so DuckDB replays codes, estimates, shortlist and
    * final exact ranks bit-for-bit. */
  val s06PqTopK = GraftQuery(
    "s06_pq_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Clustering.pqTopK(q, e, 5, NumSub, SubDim, rerank = PqRerank)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("pq_dist2"), 6).as("pq_dist2"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH par AS (
        SELECT greatest(1, CAST(floor(COUNT(*) /
                 greatest(1, CAST(ceil(sqrt(COUNT(*))) AS BIGINT))) AS BIGINT)) AS stride
        FROM embeddings),
      cents AS (
        SELECT vec_id AS cell_id, embedding AS c_emb
        FROM embeddings, par
        WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % stride = 0),
      sub AS (SELECT unnest(range(0, $NumSub)) AS m),
      vd AS (
        SELECT v.vec_id, s.m, c.cell_id,
               ${duckSubDist2("v.embedding", "c.c_emb")} AS d2
        FROM embeddings v CROSS JOIN cents c CROSS JOIN sub s),
      codes AS (
        SELECT vec_id, m, cell_id AS code
        FROM (SELECT vec_id, m, cell_id,
                     row_number() OVER (PARTITION BY vec_id, m
                       ORDER BY d2 ASC, cell_id ASC) AS rn
              FROM vd) z
        WHERE rn = 1),
      qd AS (
        SELECT q.vec_id AS query_id, s.m, c.cell_id,
               CAST(round(${duckSubDist2("q.embedding", "c.c_emb")}, 9)
                 AS DECIMAL(28,9)) AS d9
        FROM embeddings q CROSS JOIN cents c CROSS JOIN sub s
        WHERE q.vec_id % 50 = 0),
      est AS (
        SELECT qd.query_id, codes.vec_id AS neighbor_id,
               CAST(SUM(qd.d9) AS DOUBLE) AS est_d2
        FROM codes JOIN qd ON codes.m = qd.m AND codes.code = qd.cell_id
        WHERE codes.vec_id <> qd.query_id
        GROUP BY qd.query_id, codes.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id, est_d2,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY est_d2 ASC, neighbor_id ASC) AS rank
        FROM est),
      short AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= $PqRerank),
      rr AS (
        SELECT s.query_id, s.neighbor_id,
               (${duckFullDot("q.embedding", "q.embedding")}
                + ${duckFullDot("v.embedding", "v.embedding")}
                - 2.0 * ${duckFullDot("q.embedding", "v.embedding")}) AS d2
        FROM short s
        JOIN embeddings q ON s.query_id = q.vec_id
        JOIN embeddings v ON s.neighbor_id = v.vec_id),
      rranked AS (
        SELECT query_id, neighbor_id, d2,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY d2 ASC, neighbor_id ASC) AS rank
        FROM rr)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
             round(d2, 6) AS pq_dist2
      FROM rranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    bench = true,
    benchRun = Some((s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      val (cells, codes) = BenchIndex.pq(s, dir, NumSub, SubDim)
      Clustering.pqTopKFromCodes(q, e, cells, codes, 5, NumSub, SubDim, rerank = PqRerank)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("pq_dist2"), 6).as("pq_dist2"))
        .orderBy(col("query_id"), col("rank"))
    }))

  /** Coarse cells probed per query at the first level of s09 when probing
    * FIXED; the shipped budget probe expands the coarse prefix by member
    * mass instead (this constant is then ignored). */
  val NProbeCoarse = 3
  /** Fine cells kept per query when probing FIXED (ranked jointly across
    * probed coarse); the shipped s09 config probes by [[IvfBudget]]
    * instead — kept as the fixed-probe point on the frontier. */
  val NProbeFine = 12

  /** Two-level (coarse→fine) IVF top-5 ([[Clustering.twoLevelTopK]]) —
    * the above-cap ANN layout: the driver/broadcast holds only the ~⁴√n
    * COARSE codebook; the ~√n fine codebook stays distributed, keyed by
    * coarse cell, and every fine computation is an equi-join on that key.
    * Same query set and output shape as s01/s02/s05, so the recall/cost
    * frontier is directly comparable; the oracle replays both levels'
    * hash-seeded codebooks, assignments and probes bit-for-bit (sizing is
    * exact integer double-sqrt — no cross-engine pow(x,¼) ulp risk).
    *
    * SHIPPED PROBE (r13): the same [[IvfBudget]] candidate-budget rule as
    * the whole flat IVF family (s05/s11/s15/s18), applied at BOTH levels —
    * the coarse prefix (centroid-cos desc, cell_id asc) expands until its
    * assigned-member mass covers the budget, then fine cells ranked
    * jointly across it are taken under the same cumsum rule — so the
    * above-driver-cap layout carries the identical skew-proof per-query
    * cost pin AND the fine rule is never starved of reachable members
    * (the r12 fixed-nprobeCoarse=3 routing capped them at ~857 < 1200,
    * pinning recall@5 at 0.585; the expansion lifts it to the flat
    * family's band — see BASELINE r13). The operator's role is the
    * DRIVER-SCALE cap (flat √n codebooks stop fitting at ~10¹²
    * vectors); prefer s05 below the cap. */
  val s09TwoLevelIvf = GraftQuery(
    "s09_two_level_ivf_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Clustering.twoLevelTopK(q, e, 5, NProbeCoarse, NProbeFine,
          candidateBudget = Some(IvfBudget))
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH nrm AS (
        SELECT vec_id, embedding,
               sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nm
        FROM embeddings),
      sz AS (
        SELECT COUNT(*) AS n,
               greatest(1, CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)) AS S
        FROM embeddings),
      sz2 AS (
        SELECT n, S, greatest(1, CAST(ceil(sqrt(CAST(S AS DOUBLE))) AS BIGINT)) AS K1
        FROM sz),
      par2 AS (
        SELECT greatest(1, n // K1) AS stride_c, greatest(1, S // K1) AS fine_t
        FROM sz2),
      coarse AS (
        SELECT vec_id AS coarse_id, embedding AS c_emb, nm AS c_nm
        FROM nrm, par2
        WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % stride_c = 0),
      cscored AS (
        SELECT v.vec_id, c.coarse_id, v.embedding, v.nm,
               list_aggregate(list_transform(range(1, len(v.embedding)+1),
                 i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)), 'sum')
                 / (v.nm * c.c_nm) AS cos
        FROM nrm v CROSS JOIN coarse c
        WHERE v.nm > 0),
      cassign AS (
        SELECT vec_id, coarse_id FROM (
          SELECT vec_id, coarse_id,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, coarse_id ASC) AS rn
          FROM cscored) z
        WHERE rn = 1),
      members AS (
        SELECT a.coarse_id, a.vec_id, n.embedding, n.nm
        FROM cassign a JOIN nrm n ON a.vec_id = n.vec_id),
      csize AS (SELECT coarse_id, COUNT(*) AS m FROM members GROUP BY coarse_id),
      fineall AS (
        SELECT mem.coarse_id, mem.vec_id AS fine_id, mem.embedding AS f_emb, mem.nm AS f_nm
        FROM members mem JOIN csize USING (coarse_id), par2
        WHERE ('0x' || substr(md5('f|' || CAST(mem.vec_id AS VARCHAR)), 1, 8))::BIGINT
              % greatest(1, m // fine_t) = 0
        UNION
        SELECT coarse_id, coarse_id AS fine_id, c_emb AS f_emb, c_nm AS f_nm
        FROM coarse),
      fscored AS (
        SELECT mem.vec_id, mem.coarse_id, f.fine_id,
               list_aggregate(list_transform(range(1, len(mem.embedding)+1),
                 i -> CAST(mem.embedding[i] AS DOUBLE) * CAST(f.f_emb[i] AS DOUBLE)), 'sum')
                 / (mem.nm * f.f_nm) AS cos
        FROM members mem JOIN fineall f USING (coarse_id)
        WHERE mem.nm > 0),
      fassign AS (
        SELECT vec_id, fine_id FROM (
          SELECT vec_id, fine_id,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, fine_id ASC) AS rn
          FROM fscored) z
        WHERE rn = 1),
      coarsesize AS (
        SELECT coarse_id, CAST(COUNT(*) AS BIGINT) AS coarse_n
        FROM cassign GROUP BY coarse_id),
      qc AS (
        SELECT query_id, coarse_id FROM (
          SELECT s.vec_id AS query_id, s.coarse_id,
                 coalesce(cs.coarse_n, 0) AS coarse_n,
                 SUM(coalesce(cs.coarse_n, 0)) OVER (PARTITION BY s.vec_id
                   ORDER BY s.cos DESC, s.coarse_id ASC) AS cum
          FROM cscored s LEFT JOIN coarsesize cs USING (coarse_id)
          WHERE s.vec_id % 50 = 0) z
        WHERE cum - coarse_n < ${graft.operators.Clustering.CoarseOverprobe * IvfBudget}),
      fsize AS (
        SELECT fine_id, CAST(COUNT(*) AS BIGINT) AS cell_n
        FROM fassign GROUP BY fine_id),
      qf AS (
        SELECT query_id, fine_id FROM (
          SELECT qc.query_id, f.fine_id, coalesce(fs.cell_n, 0) AS cell_n,
                 SUM(coalesce(fs.cell_n, 0)) OVER (PARTITION BY qc.query_id
                   ORDER BY list_aggregate(list_transform(range(1, len(q.embedding)+1),
                     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(f.f_emb[i] AS DOUBLE)), 'sum')
                     / (q.nm * f.f_nm) DESC, f.fine_id ASC) AS cum
          FROM qc JOIN fineall f USING (coarse_id)
          JOIN nrm q ON qc.query_id = q.vec_id
          LEFT JOIN fsize fs ON f.fine_id = fs.fine_id) z
        WHERE cum - cell_n < $IvfBudget),
      cand AS (
        SELECT qf.query_id, fa.vec_id AS neighbor_id
        FROM qf JOIN fassign fa USING (fine_id)
        WHERE qf.query_id <> fa.vec_id),
      pairs AS (
        SELECT cand.query_id, cand.neighbor_id,
               q.embedding AS q_emb, q.nm AS q_nm, c.embedding AS c_emb, c.nm AS c_nm
        FROM cand
        JOIN nrm q ON cand.query_id = q.vec_id
        JOIN nrm c ON cand.neighbor_id = c.vec_id),
      scored AS (
        SELECT query_id, neighbor_id, $duckDot / (q_nm * c_nm) AS cos_raw
        FROM pairs),
      ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
             round(cos_raw, 6) AS cosine
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    bench = true,
    benchRun = Some((s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      val (coarse, fineAll, assign) = BenchIndex.twoLevel(s, dir)
      Clustering.twoLevelTopKFromIndex(q, e, coarse, fineAll, assign,
          5, NProbeCoarse, NProbeFine, candidateBudget = Some(IvfBudget))
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }))

  /** Cluster-balanced diverse selection ([[Clustering.diverseSample]]):
    * ≤ 8 members per embedding cell in deterministic md5-hash order —
    * density-flattening coverage sampling along learned geometry (dense
    * template clusters capped, sparse regions kept whole), the embedding
    * counterpart of c16's metadata temperature mix. One window shuffle on
    * cell_id over the broadcast-argmax assignment scan. */
  val c22DiverseSample = GraftQuery(
    "c22_diverse_sample",
    (s, dir) => {
      val e = table(s, dir, "embeddings")
      val cells = Clustering.seedCells(e, "vec_id", "embedding")
      Clustering.diverseSample(
          Clustering.assignCells(e, "vec_id", "embedding", cells), perCell = 8)
        .orderBy(col("cell_id"), col("pick_rank"))
    },
    Some(s"""
      WITH $duckCellCtes,
      ranked AS (
        SELECT vec_id, cell_id,
               CAST(COUNT(*) OVER (PARTITION BY cell_id) AS BIGINT) AS cell_n,
               CAST(row_number() OVER (PARTITION BY cell_id
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) AS pick_rank
        FROM assign)
      SELECT vec_id, cell_id, cell_n, pick_rank
      FROM ranked WHERE pick_rank <= 8
      ORDER BY cell_id, pick_rank"""))

  /** IVFPQ / IVFADC (Jégou et al. 2011 — the FAISS `IVFx,PQy` layout,
    * non-residual): coarse IVF cells restrict WHICH code rows the ADC scan
    * estimates (nprobe/√n of the corpus), PQ codes decide HOW (numSub map
    * lookups per row, ~14 B/vector packed at rest) — the composition that serves
    * ANN from RAM at 100 TB. Same query set/shape as s05/s06 so the
    * recall/cost tradeoff reads straight across; exact rerank refines the
    * shortlist as in s06. The oracle replays seed cells, assignment,
    * probes, codes, the DECIMAL-summed ADC estimate, and the rerank. */
  val s11IvfPqTopK = GraftQuery(
    "s11_ivfpq_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Clustering.ivfPqTopK(q, e, 5, NProbe, NumSub, SubDim, rerank = PqRerank,
          candidateBudget = Some(IvfBudget))
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("pq_dist2"), 6).as("pq_dist2"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $duckCellCtes,
      ${duckBudgetProbes(IvfBudget)},
      sub AS (SELECT unnest(range(0, $NumSub)) AS m),
      vd AS (
        SELECT v.vec_id, s.m, c.cell_id,
               ${duckSubDist2("v.embedding", "c.c_emb")} AS d2
        FROM embeddings v CROSS JOIN cents c CROSS JOIN sub s),
      codes AS (
        SELECT vec_id, m, cell_id AS code
        FROM (SELECT vec_id, m, cell_id,
                     row_number() OVER (PARTITION BY vec_id, m
                       ORDER BY d2 ASC, cell_id ASC) AS rn
              FROM vd) z
        WHERE rn = 1),
      qd AS (
        SELECT q.vec_id AS query_id, s.m, c.cell_id,
               CAST(round(${duckSubDist2("q.embedding", "c.c_emb")}, 9)
                 AS DECIMAL(28,9)) AS d9
        FROM embeddings q CROSS JOIN cents c CROSS JOIN sub s
        WHERE q.vec_id % 50 = 0),
      est AS (
        SELECT qd.query_id, cd.vec_id AS neighbor_id,
               CAST(SUM(qd.d9) AS DOUBLE) AS est_d2
        FROM codes cd
        JOIN assign a ON cd.vec_id = a.vec_id
        JOIN probes p ON a.cell_id = p.cell_id
        JOIN qd ON qd.query_id = p.query_id AND cd.m = qd.m AND cd.code = qd.cell_id
        WHERE cd.vec_id <> qd.query_id
        GROUP BY qd.query_id, cd.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id, est_d2,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY est_d2 ASC, neighbor_id ASC) AS rank
        FROM est),
      short AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= $PqRerank),
      rr AS (
        SELECT s.query_id, s.neighbor_id,
               (${duckFullDot("q.embedding", "q.embedding")}
                + ${duckFullDot("v.embedding", "v.embedding")}
                - 2.0 * ${duckFullDot("q.embedding", "v.embedding")}) AS d2
        FROM short s
        JOIN embeddings q ON s.query_id = q.vec_id
        JOIN embeddings v ON s.neighbor_id = v.vec_id),
      rranked AS (
        SELECT query_id, neighbor_id, d2,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY d2 ASC, neighbor_id ASC) AS rank
        FROM rr)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
             round(d2, 6) AS pq_dist2
      FROM rranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    bench = true,
    benchRun = Some((s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      val (cells, assign) = BenchIndex.ivf(s, dir)
      val (_, codes) = BenchIndex.pq(s, dir, NumSub, SubDim)
      Clustering.ivfPqTopKFromIndex(q, e, cells, assign, codes,
          5, NProbe, NumSub, SubDim, rerank = PqRerank,
          candidateBudget = Some(IvfBudget))
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("pq_dist2"), 6).as("pq_dist2"))
        .orderBy(col("query_id"), col("rank"))
    }))

  /** Residual IVFADC top-5 ([[Clustering.ivfAdcResidualTopK]] — the FAISS
    * `IVFx,PQy` DEFAULT, upgrading s11's non-residual variant): corpus
    * vectors are PQ-coded as their RESIDUAL against the coarse centroid,
    * and the query builds one distance table per probed cell in that
    * cell's residual frame. Same query set / probe budget / rerank as s11,
    * so the two variants read directly across. Measured frontier
    * (tools/RecallAb, BASELINE.md round 8): on the synthetic
    * near-orthogonal fixture the rerank path SATURATES the IVF probe
    * bound for both variants (recall is candidate-limited, not
    * estimator-limited), and raw residual ≈ raw non-residual — the
    * residual frame pays off on clustered real-world corpora, and this
    * operator is the ready, oracle-gated layout for them. The oracle
    * replays seed cells, the nearest-other-centroid residual codebook,
    * residual assignment + codes, the per-probe DECIMAL-summed ADC
    * estimate, and the exact rerank. */
  val s15ResidualIvfAdc = GraftQuery(
    "s15_residual_ivfadc_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Clustering.ivfAdcResidualTopK(q, e, 5, NProbe, NumSub, SubDim, rerank = PqRerank,
          candidateBudget = Some(IvfBudget))
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("pq_dist2"), 6).as("pq_dist2"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $duckCellCtes,
      ${duckBudgetProbes(IvfBudget)},
      cnn AS (
        SELECT a.cell_id, a.c_emb, b.cell_id AS o_id, b.c_emb AS o_emb,
               row_number() OVER (PARTITION BY a.cell_id
                 ORDER BY ${duckFullDot("a.c_emb", "b.c_emb")} / (a.c_nm * b.c_nm) DESC,
                          b.cell_id ASC) AS rn
        FROM cents a JOIN cents b ON a.cell_id <> b.cell_id),
      rcb AS (
        SELECT cell_id AS rcode_id,
               list_transform(range(1, len(c_emb) + 1),
                 i -> CAST(c_emb[CAST(i AS INT)] - o_emb[CAST(i AS INT)] AS FLOAT)) AS r_emb
        FROM cnn WHERE rn = 1),
      vres AS (
        SELECT a.vec_id, a.cell_id,
               list_transform(range(1, len(v.embedding) + 1),
                 i -> CAST(v.embedding[CAST(i AS INT)] - c.c_emb[CAST(i AS INT)] AS FLOAT))
                 AS v_res
        FROM assign a
        JOIN embeddings v ON a.vec_id = v.vec_id
        JOIN cents c ON a.cell_id = c.cell_id),
      sub AS (SELECT unnest(range(0, $NumSub)) AS m),
      vd AS (
        SELECT r.vec_id, r.cell_id, s.m, rc.rcode_id,
               ${duckSubDist2("r.v_res", "rc.r_emb")} AS d2
        FROM vres r CROSS JOIN rcb rc CROSS JOIN sub s),
      codes AS (
        SELECT vec_id, cell_id, m, rcode_id AS code
        FROM (SELECT vec_id, cell_id, m, rcode_id,
                     row_number() OVER (PARTITION BY vec_id, m
                       ORDER BY d2 ASC, rcode_id ASC) AS rn
              FROM vd) z
        WHERE rn = 1),
      qrd AS (
        SELECT q.vec_id AS query_id, s.m, rc.rcode_id,
               ${duckSubDotM("q.embedding", "rc.r_emb")} AS qr
        FROM embeddings q CROSS JOIN rcb rc CROSS JOIN sub s
        WHERE q.vec_id % 50 = 0),
      scd AS (
        SELECT c.cell_id, s.m, rc.rcode_id,
               (${duckSubDotM("rc.r_emb", "rc.r_emb")}
                + 2.0 * ${duckSubDotM("c.c_emb", "rc.r_emb")}) AS sc
        FROM cents c CROSS JOIN rcb rc CROSS JOIN sub s),
      qc2 AS (
        SELECT p.query_id, p.cell_id, s.m,
               ${duckSubDist2("q.embedding", "c.c_emb")} AS qc2
        FROM probes p
        JOIN embeddings q ON p.query_id = q.vec_id
        JOIN cents c ON p.cell_id = c.cell_id
        CROSS JOIN sub s),
      qd AS (
        SELECT qc2.query_id, qc2.cell_id, qc2.m, scd.rcode_id,
               CAST(round((qc2.qc2 + scd.sc) - 2.0 * qrd.qr, 9)
                 AS DECIMAL(28,9)) AS d9
        FROM qc2
        JOIN scd ON scd.cell_id = qc2.cell_id AND scd.m = qc2.m
        JOIN qrd ON qrd.query_id = qc2.query_id AND qrd.m = qc2.m
               AND qrd.rcode_id = scd.rcode_id),
      est AS (
        SELECT qd.query_id, cd.vec_id AS neighbor_id,
               CAST(SUM(qd.d9) AS DOUBLE) AS est_d2
        FROM codes cd
        JOIN qd ON qd.cell_id = cd.cell_id AND qd.m = cd.m AND qd.rcode_id = cd.code
        WHERE cd.vec_id <> qd.query_id
        GROUP BY qd.query_id, cd.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id, est_d2,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY est_d2 ASC, neighbor_id ASC) AS rank
        FROM est),
      short AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= $PqRerank),
      rr AS (
        SELECT s.query_id, s.neighbor_id,
               (${duckFullDot("q.embedding", "q.embedding")}
                + ${duckFullDot("v.embedding", "v.embedding")}
                - 2.0 * ${duckFullDot("q.embedding", "v.embedding")}) AS d2
        FROM short s
        JOIN embeddings q ON s.query_id = q.vec_id
        JOIN embeddings v ON s.neighbor_id = v.vec_id),
      rranked AS (
        SELECT query_id, neighbor_id, d2,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY d2 ASC, neighbor_id ASC) AS rank
        FROM rr)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
             round(d2, 6) AS pq_dist2
      FROM rranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    bench = true,
    benchRun = Some((s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      val (cells, rcb, codes) = BenchIndex.residualPq(s, dir, NumSub, SubDim)
      Clustering.ivfAdcResidualFromIndex(q, e, cells, rcb, codes,
          5, NProbe, NumSub, SubDim, rerank = PqRerank,
          candidateBudget = Some(IvfBudget))
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("pq_dist2"), 6).as("pq_dist2"))
        .orderBy(col("query_id"), col("rank"))
    }))

  /** Retrieval-quality metrics (recall@5 / MRR / binary nDCG@5) of the IVF
    * index against the exact top-5 ground truth — the tuning loop every
    * ANN deployment runs when it moves nprobe/codebook knobs, as an
    * oracle-checked operator. Metric joins are k-bounded per query (they
    * scale with k·|queries|, never the corpus); DCG/IDCG terms follow the
    * round-9/DECIMAL-sum discipline so the floats hash-match. */
  val s12RetrievalMetrics = GraftQuery(
    "s12_retrieval_metrics",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      val truth = Similarity.bruteForceTopK(q, e, 5)
      val results = Clustering.ivfTopK(q, e, 5, NProbe)
      graft.operators.Eval.retrievalMetrics(results, truth, 5)
        .select(col("query_id"), col("n_truth").cast("bigint").as("n_truth"),
          col("n_hits"),
          round(col("recall_at_k"), 6).as("recall_at_5"),
          round(col("mrr"), 6).as("mrr"),
          round(col("ndcg_at_k"), 6).as("ndcg_at_5"))
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH $duckCellCtes,
      probes AS (
        SELECT vec_id AS query_id, cell_id
        FROM (SELECT vec_id, cell_id,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY cos DESC, cell_id ASC) AS rn
              FROM cell_scored WHERE vec_id % 50 = 0) z
        WHERE rn <= $NProbe),
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assign a ON p.cell_id = a.cell_id
        WHERE p.query_id <> a.vec_id),
      ivf_scored AS (
        SELECT cand.query_id, cand.neighbor_id,
               list_aggregate(list_transform(range(1, len(q.embedding)+1),
                 i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), 'sum')
                 / (q.nm * c.nm) AS cos_raw
        FROM cand
        JOIN nrm q ON cand.query_id = q.vec_id
        JOIN nrm c ON cand.neighbor_id = c.vec_id),
      res AS (
        SELECT query_id, neighbor_id, rank
        FROM (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
              FROM ivf_scored) z
        WHERE rank <= 5),
      exact_scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_aggregate(list_transform(range(1, len(q.embedding)+1),
                 i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), 'sum')
                 / (q.nm * c.nm) AS cos_raw
        FROM nrm q CROSS JOIN nrm c
        WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
      truth AS (
        SELECT query_id, neighbor_id
        FROM (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_raw DESC, neighbor_id ASC) AS rn
              FROM exact_scored) z
        WHERE rn <= 5),
      hits AS (
        SELECT r.query_id, r.rank AS r_rank,
               CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS rel
        FROM res r LEFT JOIN truth t
          ON r.query_id = t.query_id AND r.neighbor_id = t.neighbor_id),
      perq AS (
        SELECT query_id,
               CAST(SUM(rel) AS BIGINT) AS n_hits,
               MIN(CASE WHEN rel = 1 THEN r_rank END) AS first_rel,
               SUM(CASE WHEN rel = 1
                   THEN CAST(round(1.0 / (ln(r_rank + 1.0) / ln(2.0)), 9) AS DECIMAL(28,9))
                   ELSE CAST(0 AS DECIMAL(28,9)) END) AS dcg9
        FROM hits GROUP BY query_id),
      tc AS (
        SELECT query_id, least(CAST(COUNT(*) AS BIGINT), 5) AS n_truth
        FROM truth GROUP BY query_id),
      ranks AS (SELECT unnest(range(1, 6)) AS i),
      idcg AS (
        SELECT tc.query_id,
               SUM(CAST(round(1.0 / (ln(CAST(i AS DOUBLE) + 1.0) / ln(2.0)), 9)
                 AS DECIMAL(28,9))) AS idcg9
        FROM tc JOIN ranks ON i <= tc.n_truth
        GROUP BY tc.query_id)
      SELECT tc.query_id, tc.n_truth,
             COALESCE(p.n_hits, 0) AS n_hits,
             round(CAST(COALESCE(p.n_hits, 0) AS DOUBLE) / CAST(tc.n_truth AS DOUBLE), 6)
               AS recall_at_5,
             round(COALESCE(1.0 / CAST(p.first_rel AS DOUBLE), 0.0), 6) AS mrr,
             round(CAST(COALESCE(p.dcg9, CAST(0 AS DECIMAL(28,9))) AS DOUBLE)
               / CAST(i.idcg9 AS DOUBLE), 6) AS ndcg_at_5
      FROM tc
      LEFT JOIN perq p ON tc.query_id = p.query_id
      JOIN idcg i ON tc.query_id = i.query_id
      ORDER BY tc.query_id"""))

  /** Shared DuckDB CTEs for the INCREMENTAL index: the codebook derives
    * from the BASE slice only (vec_id % 10 <> 7 — the standing corpus),
    * while assignment covers every vector including the later-ingested
    * delta — the append-only index-maintenance shape. */
  private val duckIncCellCtes = s"""
      nrm AS (
        SELECT vec_id, embedding,
               sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nm
        FROM embeddings),
      par AS (
        SELECT greatest(1, CAST(floor(COUNT(*) /
                 greatest(1, CAST(ceil(sqrt(COUNT(*))) AS BIGINT))) AS BIGINT)) AS stride
        FROM embeddings WHERE vec_id % 10 <> 7),
      cents AS (
        SELECT vec_id AS cell_id, embedding AS c_emb, nm AS c_nm
        FROM nrm, par
        WHERE vec_id % 10 <> 7
          AND ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % stride = 0),
      cell_scored AS (
        SELECT v.vec_id, c.cell_id,
               list_aggregate(list_transform(range(1, len(v.embedding)+1),
                 i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)), 'sum')
                 / (v.nm * c.c_nm) AS cos
        FROM nrm v CROSS JOIN cents c
        WHERE v.nm > 0),
      assign AS (
        SELECT vec_id, cell_id, cos AS cell_cos
        FROM (SELECT vec_id, cell_id, cos,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY cos DESC, cell_id ASC) AS rn
              FROM cell_scored) z
        WHERE rn = 1)"""

  /** Incremental index maintenance (s16): the standing corpus
    * (vec_id % 10 ≠ 7) built its codebook once; the later-ingested delta
    * (vec_id % 10 = 7) FOLDS into the existing cells via
    * `Clustering.foldIntoIndex` — assignment only, no codebook rebuild —
    * and probes run over the folded index. Because per-row assignment
    * against fixed centroids is order-independent, the folded index equals
    * a one-shot assignment exactly (spec-pinned), so the oracle replays
    * the same base-codebook + full-assignment path. The 100 TB point:
    * ingest cost is O(delta · √n) assignment work, never a corpus rebuild. */
  val s16IncrementalIndexTopK = GraftQuery(
    "s16_incremental_index_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val base = e.filter(col("id") % 10 =!= 7)
      val delta = e.filter(col("id") % 10 === 7)
      val cells = Clustering.materializedCells(base, "id", "embedding")
      val standing = Clustering.assignCells(base, "id", "embedding", cells)
      val folded = Clustering.foldIntoIndex(delta, "id", "embedding", cells, standing)
      val q = e.filter(col("id") % 50 === 0)
      Clustering.ivfTopKFromIndex(q, e, cells, folded, 5, NProbe)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $duckIncCellCtes,
      probes AS (
        SELECT vec_id AS query_id, cell_id
        FROM (SELECT vec_id, cell_id,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY cos DESC, cell_id ASC) AS rn
              FROM cell_scored WHERE vec_id % 50 = 0) z
        WHERE rn <= $NProbe),
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assign a ON p.cell_id = a.cell_id
        WHERE p.query_id <> a.vec_id),
      pairs AS (
        SELECT cand.query_id, cand.neighbor_id,
               q.embedding AS q_emb, q.nm AS q_nm, c.embedding AS c_emb, c.nm AS c_nm
        FROM cand
        JOIN nrm q ON cand.query_id = q.vec_id
        JOIN nrm c ON cand.neighbor_id = c.vec_id),
      scored AS (
        SELECT query_id, neighbor_id, $duckDot / (q_nm * c_nm) AS cos_raw
        FROM pairs),
      ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
             round(cos_raw, 6) AS cosine
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    bench = true,
    benchRun = Some((s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      val (cells, folded) = BenchIndex.incremental(s, dir)
      Clustering.ivfTopKFromIndex(q, e, cells, folded, 5, NProbe)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }))

  /** Cell-skew maintenance report (s17): per-cell member counts of the
    * folded s16 index vs the corpus mean; `needs_split` (> 2× mean) is the
    * re-seed trigger after ingest drift — the signal that decides when the
    * O(delta) fold of s16 must give way to a codebook rebuild. One bounded
    * groupBy + 1-row broadcast. */
  val s17CellSkewReport = GraftQuery(
    "s17_cell_skew_report",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val base = e.filter(col("id") % 10 =!= 7)
      val delta = e.filter(col("id") % 10 === 7)
      val cells = Clustering.materializedCells(base, "id", "embedding")
      val folded = Clustering.foldIntoIndex(delta, "id", "embedding", cells,
        Clustering.assignCells(base, "id", "embedding", cells))
      Clustering.cellSkewReport(folded)
        .select(col("cell_id"), col("n_members"), col("skew_ratio"), col("needs_split"))
        .orderBy(col("cell_id"))
    },
    Some(s"""
      WITH $duckIncCellCtes,
      counts AS (
        SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM assign GROUP BY cell_id),
      m AS (SELECT avg(n_members) AS avg_members FROM counts)
      SELECT cell_id, n_members,
             round(n_members / avg_members, 6) AS skew_ratio,
             n_members > avg_members * 2.0 AS needs_split
      FROM counts, m
      ORDER BY cell_id"""))

  /** Candidate budget for the adaptive probe (s18): ~the exact-scoring
    * volume the fixed-nprobe s05 does at sf0.1 (24/39 cells × 2000
    * vectors ≈ 1231), so the two probes are cost-comparable there. */
  val AdaptiveBudget = 1000L

  /** Adaptive-nprobe IVF (s18): probe cells in centroid-cosine order
    * until the probed MEMBER COUNT reaches [[AdaptiveBudget]] — cost per
    * query is the budget, not nprobe × (skew-dependent) cell size. The
    * oracle replays the prefix rule with a window cumsum over the same
    * (cos desc, cell_id) order. */
  val s18AdaptiveIvfTopK = GraftQuery(
    "s18_adaptive_ivf_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      val cells = Clustering.materializedCells(e, "id", "embedding")
      val assign = Clustering.assignCells(e, "id", "embedding", cells)
      Clustering.ivfTopKAdaptive(q, e, cells, assign, 5, AdaptiveBudget)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $duckCellCtes,
      sizes AS (
        SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS cell_n
        FROM assign GROUP BY cell_id),
      qcells AS (
        SELECT cs.vec_id AS query_id, cs.cell_id, cs.cos,
               coalesce(sz.cell_n, 0) AS cell_n
        FROM cell_scored cs LEFT JOIN sizes sz ON cs.cell_id = sz.cell_id
        WHERE cs.vec_id % 50 = 0),
      probes AS (
        SELECT query_id, cell_id
        FROM (SELECT query_id, cell_id, cell_n,
                     SUM(cell_n) OVER (PARTITION BY query_id
                       ORDER BY cos DESC, cell_id ASC) AS cum
              FROM qcells) z
        WHERE cum - cell_n < $AdaptiveBudget),
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assign a ON p.cell_id = a.cell_id
        WHERE p.query_id <> a.vec_id),
      pairs AS (
        SELECT cand.query_id, cand.neighbor_id,
               q.embedding AS q_emb, q.nm AS q_nm, c.embedding AS c_emb, c.nm AS c_nm
        FROM cand
        JOIN nrm q ON cand.query_id = q.vec_id
        JOIN nrm c ON cand.neighbor_id = c.vec_id),
      scored AS (
        SELECT query_id, neighbor_id, $duckDot / (q_nm * c_nm) AS cos_raw
        FROM pairs),
      ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
             round(cos_raw, 6) AS cosine
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    bench = true,
    benchRun = Some((s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      val (cells, assign) = BenchIndex.ivf(s, dir)
      Clustering.ivfTopKAdaptive(q, e, cells, assign, 5, AdaptiveBudget)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }))

  val all: Seq[GraftQuery] = Seq(
    s05IvfTopK, d08SemanticDedup, c10CellProfile, s06PqTopK, c22DiverseSample,
    s09TwoLevelIvf, s11IvfPqTopK, s12RetrievalMetrics, s15ResidualIvfAdc,
    s16IncrementalIndexTopK, s17CellSkewReport, s18AdaptiveIvfTopK)
}
