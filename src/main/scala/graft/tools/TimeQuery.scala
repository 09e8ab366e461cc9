package graft.tools

/** Time one registered query by name (two passes: cold, warm).
  * `runMain graft.tools.TimeQuery <name> [sfDir]` */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session(appName = s"time-$name")
    val q = graft.SparkEntry.registry.find(_.name == name).get
    for (label <- Seq("cold", "warm")) {
      val t0 = System.nanoTime()
      val n = q.run(spark, dir).count()
      println(f"[time] $name $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
