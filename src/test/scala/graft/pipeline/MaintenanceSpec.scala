package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.Streams

class MaintenanceSpec extends SparkSpec {

  import spark.implicits._

  test("fragmented bronze bin-packs its small files; settled tables skip; reruns converge") {
    val lake = new Lakehouse(spark, Files.createTempDirectory("graft-maint").toString)
    (1 to 6).foreach { i =>
      lake.appendBronze("frag", Seq((i.toLong, java.sql.Date.valueOf("2025-06-01"), s"run$i"))
        .toDF("id", "snapshot_date", "run_id").repartition(2))
    }
    lake.appendBronze("small", Seq((1L, java.sql.Date.valueOf("2025-06-01"), "run1"))
      .toDF("id", "snapshot_date", "run_id").repartition(1))
    assert(lake.liveFileCount("bronze", "frag") == 12)
    val smallVersion = lake.tableVersion("bronze", "small")

    val report = Maintenance.run(lake)
    assert(report.status == "ok", report.toString)
    assert(report.optimized == Seq("bronze.frag"))
    assert(report.skipped == Seq("bronze.small"),
      "a below-threshold table must skip without a rewrite")
    assert(lake.liveFileCount("bronze", "frag") == 1,
      s"12 tiny files should pack into one, got ${lake.liveFileCount("bronze", "frag")}")
    assert(lake.table("bronze", "frag").count() == 6, "OPTIMIZE changed the data")
    assert(lake.tableVersion("bronze", "small") == smallVersion,
      "a compact table was rewritten — the pass must stay cheap every run")

    // convergence: the packed output is itself under-sized, but ONE small
    // file never re-triggers — the second pass is a version-stable no-op
    val fragVersion = lake.tableVersion("bronze", "frag")
    val again = Maintenance.run(lake)
    assert(again.optimized.isEmpty, again.toString)
    assert(lake.tableVersion("bronze", "frag") == fragVersion,
      "repeated OPTIMIZE must converge, not rewrite forever")
  }

  test("compactSmall rewrites ONLY under-sized files; settled files keep their paths") {
    val lake = new Lakehouse(spark, Files.createTempDirectory("graft-binpack").toString)
    // one BIG append (well-sized at the test's targetBytes) + 5 tiny ones
    lake.appendBronze("t", (1 to 3000).map(i =>
        (i.toLong, java.sql.Date.valueOf("2025-06-01"), "bulk"))
      .toDF("id", "snapshot_date", "run_id").repartition(1))
    (1 to 5).foreach { i =>
      lake.appendBronze("t", Seq((100000L + i, java.sql.Date.valueOf("2025-06-02"), s"run$i"))
        .toDF("id", "snapshot_date", "run_id").repartition(1))
    }
    val before = lake.committedBronzeRelPaths("t").get
    val big = before.filter(_.startsWith("_a1_"))
    assert(big.size == 1 && before.size == 6)
    // candidates are files under target/2: the bulk file clears the
    // target itself, the tiny ones sit under half of it
    val target = 8192L
    assert(Files.size(lake.tableDir("bronze", "t").resolve(big.head)) > target)
    (before - big.head).foreach { p =>
      assert(Files.size(lake.tableDir("bronze", "t").resolve(p)) < target / 2) }

    assert(lake.compactSmall("bronze", "t", targetBytes = target, minSmallFiles = 4))
    val after = lake.committedBronzeRelPaths("t").get
    assert(after.contains(big.head), "a well-sized file was rewritten")
    assert((before - big.head).forall(p => !after.contains(p)),
      "an under-sized file survived the bin-pack")
    assert(lake.table("bronze", "t").count() == 3005, "bin-pack changed the data")
    // below the candidate floor: no-op, version stable
    val v = lake.tableVersion("bronze", "t")
    assert(!lake.compactSmall("bronze", "t", targetBytes = target, minSmallFiles = 4))
    assert(lake.tableVersion("bronze", "t") == v)
  }

  test("a merge-fragmented silver materialization bin-packs; settled and refresh-only tables skip; reruns converge") {
    val lake = new Lakehouse(spark, Files.createTempDirectory("graft-maint-silver").toString)
    // a silver table left fragmented by incremental merges: the live
    // version holds 8 tiny files (each far under target/2)
    lake.materialize("silver", "frag",
      (1 to 64).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(8))
    assert(lake.liveFileCount("silver", "frag") == 8)
    val rows0 = lake.table("silver", "frag").collect().map(_.toString).sorted.toSeq
    // a well-packed gold table must skip untouched
    lake.materialize("gold", "settled",
      (1 to 64).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1))
    val settledV = lake.tableVersion("gold", "settled")

    val report = Maintenance.run(lake)
    assert(report.status == "ok", report.toString)
    assert(report.optimized == Seq("silver.frag"), report.toString)
    assert(report.skipped.contains("gold.settled"), report.toString)
    assert(lake.liveFileCount("silver", "frag") == 1,
      s"8 tiny files should pack into one, got ${lake.liveFileCount("silver", "frag")}")
    assert(lake.table("silver", "frag").collect().map(_.toString).sorted.toSeq == rows0,
      "OPTIMIZE changed the data")
    assert(lake.tableVersion("gold", "settled") == settledV)

    // convergence: one packed file never re-triggers
    val v = lake.tableVersion("silver", "frag")
    val again = Maintenance.run(lake)
    assert(again.optimized.isEmpty, again.toString)
    assert(lake.tableVersion("silver", "frag") == v,
      "repeated OPTIMIZE of a materialization must converge, not rewrite forever")
  }

  test("OPTIMIZE commits are dataChange=false: nodataDirs tracks packed dirs, appends never enter, attribution survives checkpoints") {
    val lake = new Lakehouse(spark, Files.createTempDirectory("graft-nodata").toString)
    def append(i: Long): Unit =
      lake.appendBronze("t", Seq((i, java.sql.Date.valueOf("2025-06-01"), s"run$i"))
        .toDF("id", "snapshot_date", "run_id").repartition(1))
    (1L to 5L).foreach(append)
    assert(lake.nodataDirs("bronze", "t").isEmpty, "appends must not be nodata")
    assert(lake.compactSmall("bronze", "t", targetBytes = 1L << 20, minSmallFiles = 4))
    val nd = lake.nodataDirs("bronze", "t")
    assert(nd.size == 1, s"exactly the packed dir should be nodata, got $nd")
    val live = lake.committedBronzeRelPaths("t").get
    assert(live.forall(r => nd(r.takeWhile(_ != '/'))),
      "all live files were packed — every one should sit under the nodata dir")
    // a fresh append's dir never enters the set
    append(100L)
    assert(lake.nodataDirs("bronze", "t") == nd)
    // attribution survives checkpoint pruning: cross the checkpoint cadence
    // (v10/v20 are checkpoints; records below the newest one are pruned)
    (101L to 112L).foreach(append)
    assert(lake.nodataDirs("bronze", "t") == nd,
      "nodata attribution lost across a log checkpoint")
    // a full-rewrite OPTIMIZE (compact) marks its output too
    lake.compact("bronze", "t")
    val nd2 = lake.nodataDirs("bronze", "t")
    val live2 = lake.committedBronzeRelPaths("t").get
    assert(live2.forall(r => nd2(r.takeWhile(_ != '/'))),
      "full-rewrite OPTIMIZE output must be nodata")
    assert(lake.table("bronze", "t").count() == 18, "OPTIMIZE changed the data")
  }

  test("opt-in vacuum reclaims expired debris but spares the retention window") {
    val lake = new Lakehouse(spark, Files.createTempDirectory("graft-maintv").toString)
    lake.appendBronze("t", Seq((1L, java.sql.Date.valueOf("2025-06-01"), "run1"))
      .toDF("id", "snapshot_date", "run_id").repartition(1))
    val base = lake.tableDir("bronze", "t")
    // a crashed writer's uncommitted dir
    Seq((9L, java.sql.Date.valueOf("2025-06-02"), "crashed"))
      .toDF("id", "snapshot_date", "run_id").repartition(1)
      .write.parquet(base.resolve("_a9_crashed").toString)
    // default 168h window: the fresh debris is potentially an in-flight
    // writer — the per-run vacuum must spare it
    val r1 = Maintenance.run(lake, vacuum = true)
    assert(r1.vacuumed == Seq("bronze.t"), r1.toString)
    assert(Files.exists(base.resolve("_a9_crashed")),
      "per-run vacuum deleted files inside the retention window")
    // the wall-clock floor is VISIBLE: the return counts what it retained
    assert(lake.vacuumBronze("t") > 0,
      "vacuum must report files retained only by the wall-clock window")
    // zero window (the explicit escape hatch): debris reclaims
    val r2 = Maintenance.run(lake, vacuum = true, vacuumRetainMillis = 0L)
    assert(r2.status == "ok", r2.toString)
    assert(!Files.exists(base.resolve("_a9_crashed")), "expired debris survived")
    assert(lake.table("bronze", "t").count() == 1, "vacuum touched live data")
  }

  test("auto-discovery: a gate registered at stream definition folds with NO gates wiring; vanished state self-cleans") {
    val lake = new Lakehouse(spark, Files.createTempDirectory("graft-autog").toString)
    val idx = Files.createTempDirectory("graft-autog-idx").toString
    val out = Files.createTempDirectory("graft-autog-out").resolve("survivors").toString
    // what the lake-aware nearDupGate overload does at stream definition
    Streams.registerGate(lake.root, idx, out)
    (0 to 3).foreach { i =>
      Streams.gateBatch(Seq((i * 10L, s"wholly distinct auto batch number $i content " * 8))
        .toDF("doc_id", "text"), i.toLong, idx, out, 0.5)
    }
    // a standalone batch-versioned dir, registered the indexMaintenance way
    val assignDir = Files.createTempDirectory("graft-autog-asg").resolve("assign").toString
    Streams.registerBatchDir(lake.root, assignDir)
    (0 to 2).foreach { i =>
      Seq((i.toLong, i * 2L)).toDF("vec_id", "cell_id").write.parquet(s"$assignDir/b$i")
    }
    // NO gates/batchDirs params: discovery alone must fold everything
    val report = Maintenance.run(lake)
    assert(report.status == "ok", report.toString)
    assert(report.gatesCompacted.map(_.survivorsDir) == Seq(out), report.toString)
    assert(report.batchDirsCompacted == Seq(assignDir), report.toString)
    def dirNames(d: String) = Option(new java.io.File(d).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirNames(out) == Seq("c3"), s"got ${dirNames(out)}")
    assert(Streams.compactedWatermark(assignDir) == 2L)
    // re-registration is idempotent (one marker, not one per stream start)
    Streams.registerGate(lake.root, idx, out)
    assert(Maintenance.run(lake).gatesCompacted.size == 1)
    // state deleted out-of-band: the next pass drops the marker silently
    Seq(idx, out, assignDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    val r3 = Maintenance.run(lake)
    assert(r3.status == "ok", r3.toString)
    assert(r3.gatesCompacted.isEmpty && r3.batchDirsCompacted.isEmpty, r3.toString)
    val (g, d) = Streams.registeredState(lake.root)
    assert(g.isEmpty && d.isEmpty, "vanished state must drop its markers")
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
