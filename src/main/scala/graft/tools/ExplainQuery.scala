package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Dump `.explain("formatted")` for registered queries to files.
  *
  * `runMain graft.tools.ExplainQuery <outDir> [suffix] [names...]`
  *   - names default to the bench roster (bench = true), using the benchRun
  *     (at-rest) variant when present — the same plan Bench times;
  *   - each plan is written to `<outDir>/<name>_<suffix>.txt` (suffix
  *     defaults to "before").
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args.lift(1).getOrElse("before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(outDir)
    val spark = graft.Graft.session(appName = "graft-explain")
    val roster = graft.SparkEntry.registry.filter(_.bench)
    val wanted =
      if (args.length > 2) args.drop(2).toSeq.map(n =>
        graft.SparkEntry.registry.find(_.name == n)
          .getOrElse(sys.error(s"unknown query $n")))
      else roster
    wanted.foreach { q =>
      val run = q.benchRun.getOrElse(q.run)
      try {
        val df = run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = outDir.resolve(s"${q.name}_$suffix.txt")
        Files.write(f, plan.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        System.err.println(s"[explain] wrote $f (${plan.length} chars)")
      } catch {
        case t: Throwable =>
          System.err.println(s"[explain] ${q.name} FAILED: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
