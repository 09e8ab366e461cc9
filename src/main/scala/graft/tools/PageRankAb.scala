package graft.tools

import org.apache.spark.sql.functions._

/** A/B harness for the PageRank lineage-truncation cadence (run by hand:
  * `runMain graft.tools.PageRankAb [sfDir]`). Times 5-iteration integer
  * PageRank over the q49 co-supply graph at checkpoint cadences 1/2/5,
  * two passes each (first = codegen warmup), and cross-checks that every
  * cadence returns identical ranks — cadence changes the PLAN shape only.
  */
object PageRankAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session(appName = "pagerank-ab")
    val pairs = graft.Graft.table(spark, dir, "lineitem")
      .select(concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
        concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
      .distinct()
    val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    var ref: Map[String, Long] = null
    for (round <- 1 to 2; cad <- Seq(1, 2, 5)) {
      val t0 = System.nanoTime()
      val out = graft.operators.Graphs.pageRankMicro(spark, edges, 5, checkpointEvery = cad)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val dt = (System.nanoTime() - t0) / 1e9
      if (ref == null) ref = out
      val same = out == ref
      println(f"[ab] round=$round cadence=$cad nodes=${out.size} identical=$same time=$dt%.2f s")
      require(same, s"cadence $cad diverged from cadence-1 ranks")
    }
    spark.stop()
  }
}
