package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "rank", "neighbor_id")

  test("retrievalMetrics: perfect, partial, inverted and empty result sets") {
    val truth = df(
      (1L, 1L, 101L), (1L, 2L, 102L), (1L, 3L, 103L),
      (2L, 1L, 201L), (2L, 2L, 202L), (2L, 3L, 203L),
      (3L, 1L, 301L), (3L, 2L, 302L), (3L, 3L, 303L),
      (4L, 1L, 401L), (4L, 2L, 402L), (4L, 3L, 403L))
    val results = df(
      // q1: perfect
      (1L, 1L, 101L), (1L, 2L, 102L), (1L, 3L, 103L),
      // q2: one hit at rank 3
      (2L, 1L, 999L), (2L, 2L, 998L), (2L, 3L, 201L),
      // q3: all relevant but reversed order (recall 1, ndcg 1 for binary gains)
      (3L, 1L, 303L), (3L, 2L, 302L), (3L, 3L, 301L))
      // q4: no results at all
    val m = Eval.retrievalMetrics(results, truth, 3)
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Double]("recall_at_k"),
          r.getAs[Double]("mrr"), r.getAs[Double]("ndcg_at_k")))).toMap
    assert(m.keySet == Set(1L, 2L, 3L, 4L), "every truth query gets a row")
    assert(m(1L) == ((3L, 1.0, 1.0, 1.0)))
    val (h2, r2, mrr2, n2) = m(2L)
    assert(h2 == 1L && math.abs(r2 - 1.0 / 3) < 1e-9)
    assert(math.abs(mrr2 - 1.0 / 3) < 1e-9)
    // dcg = 1/log2(4); idcg = 1 + 1/log2(3) + 1/log2(4)
    val exp2 = (1.0 / 2) / (1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5)
    assert(math.abs(n2 - exp2) < 1e-6, s"ndcg $n2 != $exp2")
    // binary gains: order within the relevant set does not change nDCG
    assert(m(3L) == ((3L, 1.0, 1.0, 1.0)))
    assert(m(4L) == ((0L, 0.0, 0.0, 0.0)))
  }

  test("retrievalMetrics ignores result ranks beyond k and caps n_truth at k") {
    val truth = df((1L, 1L, 11L), (1L, 2L, 12L), (1L, 3L, 13L), (1L, 4L, 14L))
    val results = df((1L, 1L, 99L), (1L, 2L, 11L), (1L, 3L, 12L), (1L, 4L, 13L))
    val r = Eval.retrievalMetrics(results, truth, 2).collect().head
    assert(r.getAs[Long]("n_truth") == 2L)     // capped at k
    assert(r.getAs[Long]("n_hits") == 1L)      // only rank <= 2 counted
    assert(r.getAs[Double]("recall_at_k") == 0.5)
    assert(r.getAs[Double]("mrr") == 0.5)
  }
}
