package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Retrieval-quality evaluation over ranked result tables — the measurement
  * surface an ANN-serving deployment needs next to its indexes (recall
  * moves with every nprobe/plane/codebook knob; these metrics are how the
  * knobs are tuned and regressions caught).
  *
  * Everything is a keyed join + one per-query aggregation: results and
  * ground truth meet on (query_id, neighbor_id) — k-bounded rows per query
  * on both sides, so the shuffles carry k·|queries| rows at ANY corpus
  * size; nothing scales with the corpus the results were computed from.
  *
  * Cross-engine determinism: the only float terms (DCG's 1/log₂(rank+1))
  * are rounded to 9 decimals and summed as DECIMAL(28,9) — the t11
  * discipline — so per-query metrics hash-match an oracle restatement.
  */
object Eval {

  /** Per-query recall@k, MRR and binary-gain nDCG@k.
    *
    * `results`/`truth`: (query_id, rank, neighbor_id) with rank 1-based;
    * `truth` is the ideal ranking (e.g. exact top-k for an ANN run).
    * Queries present in `truth` but missing from `results` (an index can
    * return nothing) still get rows, with all metrics 0. Output:
    * (query_id, n_truth, n_hits, recall_at_k, mrr, ndcg_at_k). */
  def retrievalMetrics(results: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val t = truth.select(col("query_id"), col("neighbor_id"))
    val r = results.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("bigint").as("r_rank"))
    // relevance join: k-bounded per query on both sides
    val hits = r.join(t.withColumn("__rel", lit(1)), Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), col("r_rank"), coalesce(col("__rel"), lit(0)).as("rel"))
    val log2 = log(col("r_rank").cast("double") + 1.0d) / log(lit(2.0d))
    val perQuery = hits.groupBy(col("query_id")).agg(
      sum(col("rel")).cast("bigint").as("n_hits"),
      min(when(col("rel") === 1, col("r_rank"))).as("first_rel"),
      sum(when(col("rel") === 1,
        round(lit(1.0d) / log2, 9).cast(DecimalType(28, 9)))
        .otherwise(lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 9))))
        .as("dcg9"))
    val truthCounts = truth.groupBy(col("query_id"))
      .agg(least(count(lit(1)), lit(k.toLong)).as("n_truth"))
    // ideal DCG for n_truth binary-relevant items at ranks 1..n_truth —
    // the same rounded 1/log₂(i+1) terms as the DCG, folded per row (≤ k
    // terms), so Spark and the oracle compute identical decimals
    val idcg = aggregate(
      sequence(lit(1L), col("n_truth")),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 9)),
      (acc, i) => (acc + round(
        lit(1.0d) / (log(i.cast("double") + 1.0d) / log(lit(2.0d))), 9)
        .cast(DecimalType(28, 9))).cast(DecimalType(28, 9)))
    truthCounts.join(perQuery, Seq("query_id"), "left")
      .select(
        col("query_id"),
        col("n_truth"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_truth").cast("double")).as("recall_at_k"),
        coalesce(lit(1.0d) / col("first_rel").cast("double"), lit(0.0d)).as("mrr"),
        (coalesce(col("dcg9"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 9)))
          .cast("double") / idcg.cast("double")).as("ndcg_at_k"))
  }
}
