package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 10× scale record for the at-rest ANN probes (run by hand:
  * `runMain graft.tools.AnnScaleAb [sfDir]`) — the ANN mirror of
  * [[GraphScaleAb]]: the embeddings corpus replicated as 10 disjoint
  * id-shifted copies, parquet-materialized, indexed ONCE (cells /
  * assignments / PQ codes / residual codebook+codes — the at-rest
  * artifacts), then the three index probes (s05 IVF exact-on-candidates,
  * s11 IVFPQ+rerank, s15 residual IVFADC+rerank) timed against the SAME
  * query set at 1× and 10×.
  *
  * The claim under test: probe cost scales with nprobe · cell-size
  * (cell-size ≈ √n, so ~√10 ≈ 3.2× here), NEVER with the corpus (10×) —
  * the IVF partition-pruning property that makes a fixed-nprobe probe
  * cheaper RELATIVE to corpus size as the corpus grows. The tool prints
  * the measured candidate rows per query at both scales (the direct
  * invariance evidence) alongside wall times.
  *
  * Copies are id-shifted but vector-IDENTICAL, so each query's best
  * cosine must be ≥ its 1× best whenever the probe reaches any copy of
  * the 1× best cell — printed as the correctness pin. */
object AnnScaleAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session(appName = "ann-scale-ab")
    import graft.operators.Clustering
    import graft.queries.ClusterQueries.{NProbe, NumSub, PqRerank, SubDim}
    val offset = 100000000L
    val tmp = java.nio.file.Files.createTempDirectory("graft-annscale").toString

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[annscale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def mat(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$tmp/$name")
      spark.read.parquet(s"$tmp/$name")
    }

    val base = graft.Graft.table(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))

    // optional 2nd arg: comma-separated replication factors (the r9 record
    // ran 1,10; the second-decade confirmation runs 1,10,100)
    val scales = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 10))
    for (n <- scales) {
      val e = mat(base.select(col("id"), col("embedding"),
          explode(lit((0 until n).toArray)).as("i"))
        .select((col("id") + col("i") * offset).as("id"), col("embedding")),
        s"corpus_${n}x")
      val q = e.filter(col("id") < offset && col("id") % 50 === 0)
      val corpusN = e.count()
      // at-rest index build (once per scale, timed separately from probes)
      val (cells, assign, codes, rcb, rcodes) = time(s"${n}x index build") {
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
      val nQueries = q.count()
      // candidate rows per query = nprobe × avg cell size (≈ √n): the
      // quantity probe cost actually scales with, NOT the corpus
      val candPerQuery = math.round(NProbe.toDouble * corpusN / nCells)
      println(f"[annscale] ${n}x corpus=$corpusN cells=$nCells queries=$nQueries " +
        f"nprobe=$NProbe candidates/query=$candPerQuery " +
        f"scanned_fraction=${math.min(1.0, NProbe.toDouble / nCells)}%.3f")
      val s05 = time(s"${n}x s05 ivf probe") {
        val r = Clustering.ivfTopKFromIndex(q, e, cells, assign, 5, NProbe)
        r.agg(count(lit(1)), max(col("cosine"))).collect()
      }
      println(s"[annscale] ${n}x s05 rows=${s05.head.getLong(0)} best=${s05.head.get(1)}")
      val s11 = time(s"${n}x s11 ivfpq probe") {
        Clustering.ivfPqTopKFromIndex(q, e, cells, assign, codes,
          5, NProbe, NumSub, SubDim, rerank = PqRerank).count()
      }
      val s15 = time(s"${n}x s15 residual ivfadc probe") {
        Clustering.ivfAdcResidualFromIndex(q, e, cells, rcb, rcodes,
          5, NProbe, NumSub, SubDim, rerank = PqRerank).count()
      }
      println(s"[annscale] ${n}x rows s11=$s11 s15=$s15")
    }
    spark.stop()
  }
}
