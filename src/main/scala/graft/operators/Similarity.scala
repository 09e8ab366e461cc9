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

  /** Fixed axis-pair sign planes: 8 bits over a 64-dim embedding. */
  val SignPlanePairs: Seq[(Int, Int)] = Seq(
    (1, 33), (2, 34), (3, 35), (4, 36), (5, 37), (6, 38), (7, 39), (8, 40))

  /** Bucket key: one char per plane, '1' iff e[i] ≥ e[j]. */
  def signBucket(vec: Column, pairs: Seq[(Int, Int)] = SignPlanePairs): Column =
    concat(pairs.map { case (i, j) =>
      when(element_at(vec, i).cast("double") >= element_at(vec, j).cast("double"), lit("1"))
        .otherwise(lit("0"))
    }: _*)

  /** Rank scored pairs within each query: cosine DESC, neighbor ASC (total
    * order even under exact cosine ties), keep rank ≤ k. */
  private def topKByCosine(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * `queries`/`corpus`: (id, embedding). Queries are broadcast. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
      l2Norm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("c_emb"),
      l2Norm(col("embedding")).as("c_norm"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    topKByCosine(scored, k)
  }

  /** Exact top-k via the bounded [[graft.sql.TopKPairs]] aggregate instead
    * of a window: PARTIAL-aggregates, so each map task ships ≤ k pairs per
    * query to the shuffle — the window idiom shuffles every scored pair.
    * Same results, same tie-breaks; the plan difference is the point. */
  def bruteForceTopKAgg(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
      l2Norm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("c_emb"),
      l2Norm(col("embedding")).as("c_norm"))
    val topAgg = org.apache.spark.sql.graft.ColumnShim.column(
      graft.sql.TopKPairs(
        org.apache.spark.sql.graft.ColumnShim.expression(col("cosine")),
        org.apache.spark.sql.graft.ColumnShim.expression(col("neighbor_id")),
        k).toAggregateExpression())
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
      .groupBy(col("query_id"))
      .agg(topAgg.as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("neighbor_id"), col("hit.score").as("cosine"))
  }

  /** Approximate top-k: score only pairs sharing the sign-plane bucket.
    * The corpus is bucketed once (per-row map); candidate generation is a
    * broadcast equi-join on the bucket key. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
      l2Norm(col("embedding")).as("q_norm"), signBucket(col("embedding")).as("q_bucket"))
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("c_emb"),
      l2Norm(col("embedding")).as("c_norm"), signBucket(col("embedding")).as("c_bucket"))
    val scored = c.join(broadcast(q),
        col("q_bucket") === col("c_bucket") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    topKByCosine(scored, k)
  }
}
