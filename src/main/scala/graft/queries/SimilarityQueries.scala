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
    * single corpus scan, per-query window top-k. */
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

  /** LSH-bucketed approximate top-5: candidates restricted to the query's
    * sign-plane bucket — the equi-join candidate generation that replaces
    * the cross product at scale. */
  val s02LshTopK = GraftQuery(
    "s02_lsh_ann_topk",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Similarity.lshTopK(q, e, 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some {
      val bucket = Similarity.SignPlanePairs.map { case (i, j) =>
        s"(CASE WHEN CAST(embedding[$i] AS DOUBLE) >= CAST(embedding[$j] AS DOUBLE) THEN '1' ELSE '0' END)"
      }.mkString(" || ")
      s"""
      WITH b AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
      q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
            FROM b WHERE vec_id % 50 = 0),
      c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb, bucket AS c_bucket FROM b),
      scored AS (
        SELECT query_id, neighbor_id,
               $duckDot / (${duckNorm("q_emb")} * ${duckNorm("c_emb")}) AS cos_raw
        FROM c JOIN q ON c_bucket = q_bucket AND query_id <> neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cos_raw, 6) AS cosine
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""
    },
    bench = true)

  /** Same exact top-5 as s01 but via the bounded TopKPairs aggregate —
    * partial aggregation ships ≤ k pairs per query per map task to the
    * shuffle, where the window plan shuffles every scored pair. Identical
    * output (same oracle), different physical plan — the plan is the
    * deliverable. */
  val s03BruteForceTopKAgg = GraftQuery(
    "s03_cosine_topk_agg",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") % 50 === 0)
      Similarity.bruteForceTopKAgg(q, e, 5)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    s01BruteForceTopK.oracle,
    bench = true)

  val all: Seq[GraftQuery] = Seq(s01BruteForceTopK, s02LshTopK, s03BruteForceTopKAgg)
}
