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

    // ── budget-vs-fixed frontier: recall AND per-query candidate variance
    // (the reason the shipped config is budget-probed: fixed nprobe's
    // exact-scoring cost per query swings with cell-size skew; the budget
    // rule pins it). Candidate count per query = Σ cell_n over its probe
    // set, replayed here for both probe rules from the same scored frame.
    import org.apache.spark.sql.expressions.Window
    val sizes = assign.groupBy(col("cell_id")).agg(count(lit(1)).as("cell_n"))
    val qcell = q
      .select(col("id").cast("bigint").as("query_id"), col("embedding").as("q_emb"),
        graft.operators.Similarity.l2Norm(col("embedding")).as("q_norm"))
      .join(broadcast(cells))
      .select(col("query_id"),
        (graft.operators.Similarity.dot(col("q_emb"), col("c_emb"))
          / (col("q_norm") * col("c_norm"))).as("cos"),
        col("cell_id"))
      .join(broadcast(sizes), Seq("cell_id"), "left")
      .na.fill(0L, Seq("cell_n"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cell_id").asc)
    def candStats(probes: DataFrame): String = {
      val per = probes.groupBy(col("query_id")).agg(sum(col("cell_n")).as("cand"))
        .collect().map(_.getAs[Long]("cand").toDouble)
      val avg = per.sum / per.length
      val sd = math.sqrt(per.map(x => (x - avg) * (x - avg)).sum / per.length)
      f"cand avg=$avg%.0f min=${per.min}%.0f max=${per.max}%.0f sd=$sd%.1f"
    }
    val budgets = args.lift(3).map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(1000L, graft.queries.ClusterQueries.IvfBudget))
    for (np <- nprobes) {
      val fixedP = qcell.withColumn("rn", row_number().over(w)).filter(col("rn") <= np)
      println(f"[frontier] mode=fixed  nprobe=$np%4d ${candStats(fixedP)}")
    }
    for (b <- budgets) {
      val budP = qcell.withColumn("cum", sum(col("cell_n")).over(w))
        .filter(col("cum") - col("cell_n") < b)
      val rB = recall(Clustering.ivfTopKFromIndex(q, e, cells, assign, 5, 1,
        candidateBudget = Some(b)))
      val s11B = recall(Clustering.ivfPqTopKFromIndex(q, e, cells, assign, codes,
        5, 1, NumSub, SubDim, rerank = PqRerank, candidateBudget = Some(b)))
      val s15B = recall(Clustering.ivfAdcResidualFromIndex(q, e, cells, rcb, rcodes,
        5, 1, NumSub, SubDim, rerank = PqRerank, candidateBudget = Some(b)))
      println(f"[frontier] mode=budget b=$b%5d bound=$rB%.3f s11=$s11B%.3f s15=$s15B%.3f ${candStats(budP)}")
    }

    // ── subspace-config sweep at the shipped budget: the r11 frontier
    // showed the gap is ESTIMATOR-limited (probe bound 0.880 vs s11 0.750
    // / s15 0.645), so the lever is finer subspaces (same √n codebook,
    // smaller slices → finer per-subspace quantization). 5th arg:
    // "numSub:subDim" pairs, default shipped + 2 finer splits.
    val subCfgs = args.lift(4)
      .map(_.split(",").map { p => val Array(a, b) = p.split(":"); (a.trim.toInt, b.trim.toInt) }.toSeq)
      .getOrElse(Seq((NumSub, SubDim), (16, 4), (32, 2)))
    val shippedB = graft.queries.ClusterQueries.IvfBudget
    for ((ns, sd) <- subCfgs) {
      val cfgCodes = Clustering.pqCodes(e, "id", "embedding", cells, ns, sd)
      val cfgRcodes = Clustering.residualPqCodes(e, "id", "embedding", cells, rcb, ns, sd)
      val s11C = recall(Clustering.ivfPqTopKFromIndex(q, e, cells, assign, cfgCodes,
        5, 1, ns, sd, rerank = PqRerank, candidateBudget = Some(shippedB)))
      val s15C = recall(Clustering.ivfAdcResidualFromIndex(q, e, cells, rcb, cfgRcodes,
        5, 1, ns, sd, rerank = PqRerank, candidateBudget = Some(shippedB)))
      val s11Raw = recall(Clustering.ivfPqTopKFromIndex(q, e, cells, assign, cfgCodes,
        5, 1, ns, sd, rerank = 0, candidateBudget = Some(shippedB)))
      println(f"[subspace] numSub=$ns%2d subDim=$sd%2d b=$shippedB " +
        f"s11_raw=$s11Raw%.3f s11=$s11C%.3f s15=$s15C%.3f")
    }

    // ── s09 two-level on the same budget rule (the above-driver-cap
    // layout): recall at the shipped budget, next to the flat family's —
    // the cost pin is identical, the delta is coarse-routing loss.
    val (coarse2, fine2, assign2) = Clustering.twoLevelIndex(e, "id", "embedding")
    for (b <- budgets) {
      val s09 = recall(Clustering.twoLevelTopKFromIndex(q, e, coarse2, fine2, assign2,
        5, graft.queries.ClusterQueries.NProbeCoarse, 1, candidateBudget = Some(b)))
      println(f"[frontier] mode=twolevel b=$b%5d s09=$s09%.3f " +
        f"(nprobeCoarse=${graft.queries.ClusterQueries.NProbeCoarse})")
    }
    spark.stop()
  }
}
