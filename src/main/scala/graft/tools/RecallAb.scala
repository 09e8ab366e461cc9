package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B harness for the ANN recall frontier (run by hand:
  * `runMain graft.tools.RecallAb [sfDir]`). Against the exact brute-force
  * top-5 ground truth, measures recall@5 of:
  *   - IVF exact-on-candidates (s05) — the CANDIDATE-RESTRICTION BOUND any
  *     same-nprobe ADC variant is capped by;
  *   - non-residual IVFPQ raw / +rerank (s11);
  *   - residual IVFADC raw / +rerank (s15).
  * The raw/rerank split separates estimator quality from shortlist rescue.
  */
object RecallAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Graft.session(appName = "recall-ab")
    import graft.operators.{Clustering, Similarity}
    import graft.queries.ClusterQueries.{NProbe, NumSub, SubDim, PqRerank}
    val e = graft.Graft.table(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.filter(col("id") % 50 === 0)
    def sets(df: DataFrame) = df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = sets(Similarity.bruteForceTopK(q, e, 5))
    def recall(df: DataFrame): Double = {
      val got = sets(df)
      exact.map { case (qid, ex) =>
        got.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
      }.sum / exact.size
    }
    val cells = Clustering.materializedCells(e, "id", "embedding")
    val assign = Clustering.assignCells(e, "id", "embedding", cells)
    val codes = Clustering.pqCodes(e, "id", "embedding", cells, NumSub, SubDim)
    val rcb = Clustering.residualCodebook(cells)
    val rcodes = Clustering.residualPqCodes(e, "id", "embedding", cells, rcb, NumSub, SubDim)
    val nCells = cells.count()
    // optional 2nd arg: comma-separated nprobe values for the recall-vs-
    // scanned-fraction FRONTIER (the round-8 finding: recall is
    // candidate-limited at nprobe=12, so the lever is probes, not encoder)
    val nprobes = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(NProbe))
    // optional 3rd arg: rerank depths (default raw + shipped)
    val reranks = args.lift(2).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(0, PqRerank))
    println(f"[recall] dir=$dir queries=${exact.size} cells=$nCells")
    for (np <- nprobes) {
      val frac = np.toDouble / nCells
      val bound = recall(Clustering.ivfTopKFromIndex(q, e, cells, assign, 5, np))
      println(f"[recall] nprobe=$np%3d scanned_fraction=$frac%.3f ivf_exact_candidates(bound) = $bound%.3f")
      for (rr <- reranks) {
        val s11 = recall(Clustering.ivfPqTopKFromIndex(q, e, cells, assign, codes,
          5, np, NumSub, SubDim, rerank = rr))
        val s15 = recall(Clustering.ivfAdcResidualFromIndex(q, e, cells, rcb, rcodes,
          5, np, NumSub, SubDim, rerank = rr))
        println(f"[recall] nprobe=$np%3d rerank=$rr%3d  s11_nonresidual = $s11%.3f  s15_residual = $s15%.3f")
      }
    }
    spark.stop()
  }
}
