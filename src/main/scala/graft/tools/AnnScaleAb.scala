package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale record for the at-rest ANN index paths (run by hand:
  * `runMain graft.tools.AnnScaleAb [sfDir] [scales] [flat]`) — the ANN
  * mirror of [[GraphScaleAb]]: the embeddings corpus replicated as
  * disjoint id-shifted copies, parquet-materialized, indexed ONCE, then
  * probed against the SAME query set at each scale.
  *
  * BUILD PATH OF RECORD (r12): the TWO-LEVEL index
  * ([[graft.operators.Clustering.twoLevelIndex]]). The flat √n-codebook
  * build assigns every vector against every cell — O(n·√n) = O(n^1.5),
  * measured growing 38× per 10× of data (r11: 899.6 s at 200k vectors) —
  * while the two-level build assigns coarse (n·⁴√n) then fine WITHIN the
  * coarse partition (n·⁴√n): O(n^1.25), ~17.8× per decade. Its probe
  * (s09) runs the same [[graft.queries.ClusterQueries.IvfBudget]]
  * candidate-budget rule as the flat family, so per-query cost stays
  * pinned at the budget at every scale.
  *
  * The flat build + probes (s05/s11/s15) still run at scales ≤ 10× for
  * the side-by-side (pass `flat` as the 3rd arg to force them at every
  * scale) — probe cost scales with the budget, never the corpus.
  *
  * Copies are id-shifted but vector-IDENTICAL, so each query's best
  * cosine must be ≥ its 1× best whenever the probe reaches any copy of
  * the 1× best cell — printed as the correctness pin. */
object AnnScaleAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session(appName = "ann-scale-ab")
    import graft.operators.Clustering
    import graft.queries.ClusterQueries.{IvfBudget, NProbe, NProbeCoarse, NProbeFine, NumSub, PqRerank, SubDim}
    val offset = 100000000L
    val tmp = java.nio.file.Files.createTempDirectory("graft-annscale").toString

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[annscale] $label: $sec%.2f s")
      (r, sec)
    }
    def mat(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$tmp/$name")
      spark.read.parquet(s"$tmp/$name")
    }

    val base = graft.Graft.table(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))

    // 2nd arg: comma-separated replication factors (r12 record: 1,10,100)
    val scales = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 10))
    val forceFlat = args.lift(2).contains("flat")
    for (n <- scales) {
      val e = mat(base.select(col("id"), col("embedding"),
          explode(lit((0 until n).toArray)).as("i"))
        .select((col("id") + col("i") * offset).as("id"), col("embedding")),
        s"corpus_${n}x")
      val q = e.filter(col("id") < offset && col("id") % 50 === 0)
      val corpusN = e.count()

      // ---- build path of record: TWO-LEVEL (O(n^1.25)) ----
      val ((coarse2, fine2, assign2), buildTl) = time(s"${n}x two-level index BUILD") {
        val (c, f, a) = Clustering.twoLevelIndex(e, "id", "embedding")
        (mat(c, s"tl_coarse_${n}x"), mat(f, s"tl_fine_${n}x"), mat(a, s"tl_assign_${n}x"))
      }
      val k1 = coarse2.count()
      val fineCells = fine2.count()
      println(f"[annscale] ${n}x corpus=$corpusN coarse=$k1 fine=$fineCells " +
        f"queries=${q.count()} budget=$IvfBudget build_two_level=$buildTl%.2f s")
      val (s09, _) = time(s"${n}x s09 two-level budget probe") {
        val r = Clustering.twoLevelTopKFromIndex(q, e, coarse2, fine2, assign2,
          5, NProbeCoarse, NProbeFine, candidateBudget = Some(IvfBudget))
        r.agg(count(lit(1)), max(col("cosine"))).collect()
      }
      println(s"[annscale] ${n}x s09 rows=${s09.head.getLong(0)} best=${s09.head.get(1)}")

      // ---- flat comparison (O(n^1.5) build) — scales ≤ 10× by default ----
      if (n <= 10 || forceFlat) {
        val ((cells, assign, codes, rcb, rcodes), buildFlat) = time(s"${n}x FLAT index build") {
          val cells = mat(Clustering.materializedCells(e, "id", "embedding",
            maxDriverCells = 100000), s"cells_${n}x")
          val assign = mat(Clustering.assignCells(e, "id", "embedding", cells), s"assign_${n}x")
          val codes = mat(Clustering.pqCodes(e, "id", "embedding", cells, NumSub, SubDim),
            s"codes_${n}x")
          val rcb = mat(Clustering.residualCodebook(cells), s"rcb_${n}x")
          val rcodes = mat(Clustering.residualPqCodes(e, "id", "embedding", cells, rcb,
            NumSub, SubDim), s"rcodes_${n}x")
          (cells, assign, codes, rcb, rcodes)
        }
        val nCells = cells.count()
        println(f"[annscale] ${n}x flat cells=$nCells build_flat=$buildFlat%.2f s " +
          f"(vs two-level $buildTl%.2f s)")
        val (s05, _) = time(s"${n}x s05 ivf budget probe") {
          val r = Clustering.ivfTopKFromIndex(q, e, cells, assign, 5, NProbe,
            candidateBudget = Some(IvfBudget))
          r.agg(count(lit(1)), max(col("cosine"))).collect()
        }
        println(s"[annscale] ${n}x s05 rows=${s05.head.getLong(0)} best=${s05.head.get(1)}")
        val (s11, _) = time(s"${n}x s11 ivfpq probe") {
          Clustering.ivfPqTopKFromIndex(q, e, cells, assign, codes,
            5, NProbe, NumSub, SubDim, rerank = PqRerank,
            candidateBudget = Some(IvfBudget)).count()
        }
        val (s15, _) = time(s"${n}x s15 residual ivfadc probe") {
          Clustering.ivfAdcResidualFromIndex(q, e, cells, rcb, rcodes,
            5, NProbe, NumSub, SubDim, rerank = PqRerank,
            candidateBudget = Some(IvfBudget)).count()
        }
        println(s"[annscale] ${n}x rows s11=$s11 s15=$s15")
      }
    }
    spark.stop()
  }
}
