package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.Streams

class MaintenanceSpec extends SparkSpec {

  import spark.implicits._

  test("fragmented bronze compacts to the target file count; compact tables skip untouched") {
    val lake = new Lakehouse(spark, Files.createTempDirectory("graft-maint").toString)
    (1 to 6).foreach { i =>
      lake.appendBronze("frag", Seq((i.toLong, java.sql.Date.valueOf("2025-06-01"), s"run$i"))
        .toDF("id", "snapshot_date", "run_id").repartition(2))
    }
    lake.appendBronze("small", Seq((1L, java.sql.Date.valueOf("2025-06-01"), "run1"))
      .toDF("id", "snapshot_date", "run_id").repartition(1))
    assert(lake.liveFileCount("bronze", "frag") == 12)
    val smallVersion = lake.tableVersion("bronze", "small")

    val report = Maintenance.run(lake, maxLiveFiles = 4, targetFiles = 2)
    assert(report.status == "ok", report.toString)
    assert(report.optimized == Seq("bronze.frag"))
    assert(report.skipped == Seq("bronze.small"))
    assert(lake.liveFileCount("bronze", "frag") == 2)
    assert(lake.table("bronze", "frag").count() == 6, "OPTIMIZE changed the data")
    assert(lake.tableVersion("bronze", "small") == smallVersion,
      "a compact table was rewritten — the pass must stay cheap every run")
  }

  test("registered gates fold to their committed frontier; gate output unchanged") {
    val lake = new Lakehouse(spark, Files.createTempDirectory("graft-maintg").toString)
    val idx = Files.createTempDirectory("graft-maintg-idx").toString
    val out = Files.createTempDirectory("graft-maintg-out").resolve("survivors").toString
    (0 to 3).foreach { i =>
      Streams.gateBatch(Seq((i * 10L, s"wholly distinct batch number $i content " * 8))
        .toDF("doc_id", "text"), i.toLong, idx, out, 0.5)
    }
    val before = Streams.batchedTable(spark, out)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val report = Maintenance.run(lake, gates = Seq(Maintenance.GateDirs(idx, out)),
      targetFiles = 1)
    assert(report.status == "ok", report.toString)
    assert(report.gatesCompacted.size == 1)
    // O(1) + tail: everything committed folded into ONE segment per dir
    def dirNames(d: String) = Option(new java.io.File(d).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirNames(out) == Seq("c3"), s"got ${dirNames(out)}")
    assert(dirNames(s"$idx/postings") == Seq("c3"), s"got ${dirNames(s"$idx/postings")}")
    assert(Streams.batchedTable(spark, out)
      .select("doc_id").as[Long].collect().sorted.toSeq == before,
      "maintenance changed the gate's visible output")
    // the stream continues against the consolidated index
    Streams.gateBatch(Seq((100L, "wholly distinct batch number 2 content " * 8))
      .toDF("doc_id", "text"), 4L, idx, out, 0.5)
    assert(Streams.batchedTable(spark, out)
      .select("doc_id").as[Long].collect().sorted.toSeq == before,
      "a near-dup of a consolidated doc slipped past the gate")
  }
}
