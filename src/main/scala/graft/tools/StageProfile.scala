package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-stage wall-clock profile of one registered query (warm run).
  * `runMain graft.tools.StageProfile <name> [sfDir]` — prints every job and
  * stage of the SECOND (warm) execution with task counts and durations, so
  * fixed scheduler/stage-launch overhead is separable from data-plane time.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session(appName = s"profile-$name")
    val q = graft.SparkEntry.registry.find(_.name == name).get
    val run = q.benchRun.getOrElse(q.run)
    // warmup (codegen/JIT) — not profiled
    run(spark, dir).count()
    val stages = mutable.ArrayBuffer[(Int, Int, Long, String)]() // stageId, tasks, ms, name
    val jobs = mutable.ArrayBuffer[(Int, Long, Long)]() // jobId, t0, t1
    val jobStart = mutable.Map[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for { a <- i.completionTime; b <- i.submissionTime } yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        val detail = f"run=${m.executorRunTime}%5d cpu=${m.executorCpuTime / 1000000}%5d " +
          f"gc=${m.jvmGCTime}%4d deser=${m.executorDeserializeTime}%4d " +
          f"fetch=${m.shuffleReadMetrics.fetchWaitTime}%3d " +
          f"swrite=${m.shuffleWriteMetrics.writeTime / 1000000}%3d " +
          f"sbytes=${m.shuffleReadMetrics.totalBytesRead + m.shuffleWriteMetrics.bytesWritten}%9d"
        val site = i.rddInfos.sortBy(_.id).map(_.name).mkString("<-")
        stages.synchronized {
          stages += ((i.stageId, i.numTasks, ms,
            detail + "  " + i.name.split(" at ").headOption.getOrElse("") + "  " + site))
        }
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart.synchronized { jobStart(js.jobId) = js.time }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs += ((je.jobId, jobStart.getOrElse(je.jobId, je.time), je.time))
      }
    })
    val extraRuns = sys.env.get("SPARK_GRAFT_PROFILE_RUNS").flatMap(_.toIntOption).getOrElse(1)
    for (r <- 2 to extraRuns) {
      val ta = System.nanoTime()
      val df = run(spark, dir)
      val tb = System.nanoTime()
      df.count()
      println(f"[profile] extra run $r: construct=${(tb - ta) / 1e6}%.0f ms " +
        f"action=${(System.nanoTime() - tb) / 1e6}%.0f ms")
    }
    val t0 = System.nanoTime()
    val n = run(spark, dir).count()
    val wallMs = (System.nanoTime() - t0) / 1e6
    Thread.sleep(500) // let listener drain
    println(f"[profile] $name rows=$n wall=${wallMs}%.0f ms")
    val jobsSorted = jobs.sortBy(_._2)
    var covered = 0L
    var prevEnd = 0L
    jobsSorted.foreach { case (id, a, b) =>
      val gap = if (prevEnd == 0) 0 else a - prevEnd
      println(f"[profile] job $id%3d ${b - a}%6d ms (gap before: $gap%5d ms)")
      covered += (b - a); prevEnd = b
    }
    println(f"[profile] sum(job ms)=$covered vs wall=${wallMs}%.0f — driver-side gap=${wallMs - covered}%.0f ms")
    stages.sortBy(_._1).foreach { case (sid, tasks, ms, nm) =>
      println(f"[profile] stage $sid%4d $tasks%4d tasks $ms%6d ms  $nm")
    }
    spark.stop()
  }
}
