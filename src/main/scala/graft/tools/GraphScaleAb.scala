package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 10× scale record for the two graph queries (run by hand:
  * `runMain graft.tools.GraphScaleAb [sfDir]`), the round-7 verdict's
  * stretch item: q64 (Θ(m^1.5) wedges) and q49 (per-iteration shuffle)
  * dominate the bench and their cost shapes bite first at scale.
  *
  * Fixtures: the REAL sf0.1 graphs (q64's co-purchase graph, q49's
  * co-supply graph) replicated as 10 disjoint id-shifted copies and
  * MATERIALIZED to parquet — a clean scan lineage, so the timed runs
  * measure the operators, not a 10-way-union plan blowup. Disjoint
  * copies give a built-in correctness pin: triangle rows and total
  * closures must scale EXACTLY 10×, and each copy's PageRank must equal
  * the base graph's — the scaled run proves throughput AND correctness.
  *
  * Plan evidence: at 10× the co-purchase graph (11.96M oriented edges)
  * crosses q64's closure-broadcast gate (10M), so the closure join must
  * run as a SHUFFLE join — no node-scale broadcast survives.
  */
object GraphScaleAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session(appName = "graph-scale-ab")
    import graft.operators.Graphs
    val gate = 1000000L // triangleCounts closureBroadcastMaxEdges default
    val offset = 100000000L // far above any fixture id: copies stay disjoint
    val tmp = java.nio.file.Files.createTempDirectory("graft-graphscale").toString

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    /** Materialize n disjoint id-shifted copies of (u,v) edges to parquet
      * and hand back the clean re-read. */
    def materializeCopies(edges: DataFrame, n: Int, name: String): DataFrame = {
      val path = s"$tmp/${name}_${n}x"
      edges.select(col("u"), col("v"), explode(lit((0 until n).toArray)).as("i"))
        .select((col("u") + col("i") * offset).as("u"),
          (col("v") + col("i") * offset).as("v"))
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

    // ---- q64 triangles: co-purchase graph at 1x and 10x -------------------
    val items = graft.Graft.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val copurchase = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    var tri1 = 0L
    var closures1 = 0L
    for (n <- Seq(1, 10)) {
      val e = materializeCopies(copurchase, n, "copurchase")
      val edgeCount = e.count()
      val tdf = Graphs.triangleCounts(e)
      val (rows, closures) = time(s"triangleCounts ${n}x ($edgeCount edges)") {
        val r = tdf.agg(count(lit(1)), sum(col("n_triangles"))).head()
        (r.getLong(0), r.getLong(1))
      }
      val plan = tdf.queryExecution.executedPlan.toString
      val shuffleJoins = plan.linesIterator.count(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
      println(s"[scale] ${n}x: triangle-rows=$rows closures=$closures " +
        s"shuffleJoinsInPlan=$shuffleJoins")
      if (n == 1) { tri1 = rows; closures1 = closures }
      else {
        require(rows == 10 * tri1 && closures == 10 * closures1,
          s"10x correctness pin failed: rows $rows vs ${10 * tri1}, " +
            s"closures $closures vs ${10 * closures1}")
        require(edgeCount > gate,
          s"fixture too small to cross the gate (10x m = $edgeCount)")
        require(shuffleJoins >= 1,
          "closure join must be a shuffle join past the broadcast gate")
        println(s"[scale] 10x closure gate crossed ($edgeCount > $gate): " +
          s"closure runs as a shuffle join, no node-scale broadcast")
      }
    }

    // ---- q49 PageRank: co-supply graph at 1x and 10x ----------------------
    // the q49/PageRankAb graph: supplier—part co-supply, symmetrized
    val cosupply = graft.Graft.table(spark, dir, "lineitem")
      .select(col("l_suppkey").cast("bigint").as("u"),
        (col("l_partkey").cast("bigint") + 10000000L).as("v"))
      .distinct()
    var ranks1: Map[String, Long] = null
    for (n <- Seq(1, 10)) {
      val base = materializeCopies(cosupply, n, "cosupply")
      val e = base.select(concat(lit("n"), col("u").cast("string")).as("src"),
        concat(lit("n"), col("v").cast("string")).as("dst"))
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val edgeCount = sym.count()
      // time construction AND collect: the iteration's localCheckpoints
      // execute eagerly inside pageRankMicro, not at collect time
      val pr = time(s"pageRankMicro ${n}x ($edgeCount directed edges)") {
        Graphs.pageRankMicro(spark, sym, 5, checkpointEvery = 5)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      println(s"[scale] ${n}x: nodes=${pr.size}")
      if (n == 1) ranks1 = pr
      else {
        // disjoint copies + per-node teleport → each copy's ranks equal the
        // base graph's (spot-check copy 3 via the id shift)
        val sample = ranks1.take(1000).map { case (k, v) =>
          ("n" + (k.drop(1).toLong + 3 * offset)) -> v
        }
        require(sample.forall { case (k, v) => pr.get(k).contains(v) },
          "10x per-copy PageRank diverged from the base graph")
        require(pr.size == 10 * ranks1.size, "10x node count mismatch")
      }
    }
    // ---- q78 BFS: co-supply graph at 1x and 10x ---------------------------
    // same disjoint-copy pin: every copy of a reached node gets the SAME
    // min depth (copies replicate seeds too), so the depth histogram
    // scales exactly 10×; wall clock should scale ~linearly (per-round
    // frontier shuffles over 10× nodes; rounds unchanged)
    var hist1: Map[Long, Long] = null
    for (n <- Seq(1, 10)) {
      val base = materializeCopies(cosupply, n, "cosupply_bfs")
      val e = base.select(concat(lit("n"), col("u").cast("string")).as("src"),
        concat(lit("n"), col("v").cast("string")).as("dst"))
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = base.filter(col("u") % 25 === 0)
        .select(concat(lit("n"), col("u").cast("string")).as("node")).distinct()
      val hist = time(s"bfsDepths ${n}x") {
        Graphs.bfsDepths(spark, sym, seeds, maxDepth = 4)
          .groupBy(col("depth")).agg(count(lit(1)).as("cnt"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      println(s"[scale] ${n}x bfs depth histogram: ${hist.toSeq.sorted.mkString(", ")}")
      if (n == 1) hist1 = hist
      else require(hist == hist1.map { case (d, c) => d -> c * 10 },
        s"10x BFS depth histogram pin failed: $hist vs 10x of $hist1")
    }
    spark.stop()
  }
}
