package graft.tools

import org.apache.spark.sql.functions._

/** Stage-timing harness for q64 triangle counting (run by hand:
  * `runMain graft.tools.TriangleAb [sfDir]`). Breaks the 6-second warm
  * bench number into its phases over the co-purchase graph — edge-list
  * construction (the order-key self-join), orientation (distinct + degree
  * joins), and the wedge+closure triangle core — so a regression or a
  * tuning idea can be attributed to the right stage. Two passes per
  * variant; the first is codegen warmup.
  */
object TriangleAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session(appName = "triangle-ab")

    def edges = {
      val items = graft.Graft.table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      items.as("a").join(items.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
    }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ab] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"-- pass $round")
      val m = time("edge construction (self-join + distinct count)") { edges.count() }
      // cache the edge list so downstream phases measure only themselves
      val e = edges.cache()
      e.count()
      val cnt = time("triangleCounts full (edges cached)") {
        graft.operators.Graphs.triangleCounts(e).count()
      }
      println(s"[ab] edges=$m triangle-rows=$cnt")
      val full = time("q64 end-to-end (uncached, as benched)") {
        graft.SparkEntry.queries("q64_triangle_counts")(spark, dir).count()
      }
      println(s"[ab] q64 rows=$full")
      e.unpersist()
    }
    spark.stop()
  }
}
