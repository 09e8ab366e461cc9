package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

import Fixtures.d

/** CHECK constraints ([[Lakehouse.addCheckConstraint]]) — Delta's
  * `ALTER TABLE ADD CONSTRAINT … CHECK` re-expressed on the file log.
  * Under test: log persistence (any writer enforces, across instances
  * and across checkpoint pruning), append-batch enforcement with SQL
  * NULL-passes semantics over staged files only, violation atomicity
  * (nothing committed, no debris), and drop-to-zero resolution. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def mkLake(tag: String, interval: Int = 10): Lakehouse =
    new Lakehouse(spark, Files.createTempDirectory(s"graft-$tag").toString,
      bronzeCheckpointInterval = interval)

  private def row(id: Long, run: String) = (id, d("2025-06-01"), run)

  test("add validates existing rows; violating batches abort atomically") {
    val lake = mkLake("cadd")
    lake.appendBronze("t", Seq(row(1, "r1"), row(2, "r1")).toDF("id", "snapshot_date", "run_id"))
    // existing data violates -> rejected, nothing recorded
    val ex = intercept[IllegalArgumentException](
      lake.addCheckConstraint("t", "id_big", "id > 10"))
    assert(ex.getMessage.contains("existing rows"))
    assert(lake.checkConstraints("t").isEmpty)

    lake.addCheckConstraint("t", "id_pos", "id > 0")
    assert(lake.checkConstraints("t") == Seq("id_pos" -> "id > 0"))
    val vBefore = lake.tableVersion("bronze", "t")
    val filesBefore = lake.prunedFilePaths("bronze", "t", Nil).toSet

    val viol = intercept[IllegalArgumentException](
      lake.appendBronze("t", Seq(row(3, "r2"), row(-7, "r2"))
        .toDF("id", "snapshot_date", "run_id")))
    assert(viol.getMessage.contains("id_pos") && viol.getMessage.contains("id > 0"))
    // atomic: no new version, no new live files, no staged debris dir
    assert(lake.tableVersion("bronze", "t") == vBefore)
    assert(lake.prunedFilePaths("bronze", "t", Nil).toSet == filesBefore)
    assert(lake.table("bronze", "t").count() == 2)

    // a clean batch still commits
    lake.appendBronze("t", Seq(row(3, "r2")).toDF("id", "snapshot_date", "run_id"))
    assert(lake.table("bronze", "t").count() == 3)
  }

  test("constraints ride the log: second instance enforces; history records the op") {
    val root = Files.createTempDirectory("graft-clog").toString
    val lake = new Lakehouse(spark, root)
    lake.appendBronze("t", Seq(row(1, "r1")).toDF("id", "snapshot_date", "run_id"))
    lake.addCheckConstraint("t", "run_set", "run_id IS NOT NULL")
    assert(lake.history("bronze", "t").orderBy(col("version").desc)
      .head().getString(2) == "ADD CONSTRAINT")

    val other = new Lakehouse(spark, root)
    assert(other.checkConstraints("t") == Seq("run_set" -> "run_id IS NOT NULL"))
    intercept[IllegalArgumentException](
      other.appendBronze("t", Seq((5L, d("2025-06-01"), null: String))
        .toDF("id", "snapshot_date", "run_id")))
    assert(other.describeDetail("bronze", "t").head()
      .getAs[Long]("num_check_constraints") == 1)
  }

  test("NULL passes; a column the batch lacks evaluates as NULL (narrow append)") {
    val lake = mkLake("cnull")
    lake.appendBronze("t", Seq((1L, d("2025-06-01"), "r1", 5L))
      .toDF("id", "snapshot_date", "run_id", "score"))
    lake.addCheckConstraint("t", "score_pos", "score > 0")
    // NULL score passes (SQL CHECK: only FALSE rejects)
    lake.appendBronze("t", Seq((2L, d("2025-06-01"), "r2", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "snapshot_date", "run_id", "score"))
    // a batch WITHOUT the column at all: null-filled like readers do -> passes
    lake.appendBronze("t", Seq(row(3, "r3")).toDF("id", "snapshot_date", "run_id"))
    assert(lake.table("bronze", "t").count() == 3)
    // but a present-and-false value still rejects
    intercept[IllegalArgumentException](
      lake.appendBronze("t", Seq((4L, d("2025-06-01"), "r4", -1L))
        .toDF("id", "snapshot_date", "run_id", "score")))
  }

  test("set survives checkpoint pruning; drop-to-zero stops enforcement") {
    val lake = mkLake("cckpt", interval = 4)
    lake.appendBronze("t", Seq(row(1, "r1")).toDF("id", "snapshot_date", "run_id"))
    lake.addCheckConstraint("t", "id_pos", "id > 0")
    // push well past a checkpoint so the ADD CONSTRAINT record itself is
    // pruned — the re-emitted line on later commits must carry the set
    (2 to 9).foreach(i =>
      lake.appendBronze("t", Seq(row(i, s"r$i")).toDF("id", "snapshot_date", "run_id")))
    assert(lake.checkConstraints("t") == Seq("id_pos" -> "id > 0"))
    intercept[IllegalArgumentException](
      lake.appendBronze("t", Seq(row(-1, "rx")).toDF("id", "snapshot_date", "run_id")))

    lake.dropCheckConstraint("t", "id_pos")
    assert(lake.checkConstraints("t").isEmpty)
    intercept[IllegalArgumentException](lake.dropCheckConstraint("t", "id_pos"))
    // the formerly-violating batch now commits, and stays committed after
    // more appends re-resolve the (empty-marker) constraint state
    lake.appendBronze("t", Seq(row(-1, "rx")).toDF("id", "snapshot_date", "run_id"))
    assert(lake.table("bronze", "t").count() == 10)
    assert(lake.describeDetail("bronze", "t").head()
      .getAs[Long]("num_check_constraints") == 0)
  }

  test("provesCheck interval logic and simpleComparison parsing") {
    import ManifestStats._
    val e = FileEntry("p/f", Map("id" -> ColStats('l', "1", "5"),
      "s" -> ColStats('s', "b", "d"), RowsCol -> ColStats('l', "3", "3")))
    assert(provesCheck(e, "id", ">", 0))
    assert(!provesCheck(e, "id", ">", 1))
    assert(provesCheck(e, "id", ">=", 1))
    assert(provesCheck(e, "id", "<=", 5L))
    assert(!provesCheck(e, "id", "<", 5))
    assert(!provesCheck(e, "id", "=", 3))
    assert(provesCheck(e, "id", "!=", 9))
    assert(!provesCheck(e, "id", "!=", 3))
    assert(provesCheck(e, "s", ">=", "a") && !provesCheck(e, "s", ">", "b"))
    assert(!provesCheck(e, "missing", ">", 0))
    assert(!provesCheck(e, "id", ">", 0.5), "tag mismatch must not prove")
    val empty = FileEntry("p/g", Map(RowsCol -> ColStats('l', "0", "0")))
    assert(provesCheck(empty, "anything", "=", 42), "a proven-empty file proves all")

    assert(Lakehouse.simpleComparison(spark, "id > 0").contains(("id", ">", 0)))
    assert(Lakehouse.simpleComparison(spark, "0 < id").contains(("id", ">", 0)))
    assert(Lakehouse.simpleComparison(spark, "run_id = 'r1'").contains(("run_id", "=", "r1")))
    assert(Lakehouse.simpleComparison(spark, "id <> 3").contains(("id", "!=", 3)))
    assert(Lakehouse.simpleComparison(spark, "id > 0 AND s IS NOT NULL").isEmpty)
    assert(Lakehouse.simpleComparison(spark, "length(s) > 2").isEmpty)
    assert(Lakehouse.simpleComparison(spark, "this is !! not sql").isEmpty)
  }

  test("stats-proof fast path: proven constraints skip the validation scan") {
    val lake = mkLake("cfast")
    val idStats = Seq("run_id", "id")
    lake.appendBronze("t", Seq(row(1, "r1")).toDF("id", "snapshot_date", "run_id"),
      statsCols = idStats)
    lake.addCheckConstraint("t", "id_pos", "id > 0")
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    def countJobs(f: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      jobs = 0
      try { f; Thread.sleep(800); jobs }
      finally spark.sparkContext.removeSparkListener(listener)
    }
    // id carries footer stats -> min(id)=2 > 0 proves the constraint:
    // the append must run FEWER jobs than one whose batch lacks id stats
    // (which pays the staged-file validation scan)
    val proven = countJobs(lake.appendBronze("t",
      Seq(row(2, "r2")).toDF("id", "snapshot_date", "run_id"), statsCols = idStats))
    val scanned = countJobs(lake.appendBronze("t",
      Seq(row(3, "r3")).toDF("id", "snapshot_date", "run_id"),
      statsCols = Seq("run_id")))
    assert(proven < scanned, s"proven=$proven scanned=$scanned")
    // a violating batch's own stats cannot prove it; the scan still rejects
    intercept[IllegalArgumentException](lake.appendBronze("t",
      Seq(row(-1, "r4")).toDF("id", "snapshot_date", "run_id"), statsCols = idStats))
    assert(lake.table("bronze", "t").count() == 3)
  }

  test("two constraints both enforce; violation names the right one") {
    val lake = mkLake("ctwo")
    lake.appendBronze("t", Seq(row(1, "r1")).toDF("id", "snapshot_date", "run_id"))
    lake.addCheckConstraint("t", "id_pos", "id > 0")
    lake.addCheckConstraint("t", "run_prefix", "run_id LIKE 'r%'")
    assert(lake.checkConstraints("t").map(_._1) == Seq("id_pos", "run_prefix"))
    val ex = intercept[IllegalArgumentException](
      lake.appendBronze("t", Seq(row(2, "bad")).toDF("id", "snapshot_date", "run_id")))
    assert(ex.getMessage.contains("run_prefix"), ex.getMessage)
    intercept[IllegalArgumentException](
      lake.addCheckConstraint("t", "id_pos", "id > 5"))
  }

  test("RESTORE restores the target version's constraint set, not the head's") {
    val lake = mkLake("crestore")
    lake.appendBronze("t", Seq(row(1, "r1")).toDF("id", "snapshot_date", "run_id"))
    val unconstrained = lake.tableVersions("bronze", "t").max
    lake.addCheckConstraint("t", "id_pos", "id > 0")
    val constrained = lake.tableVersions("bronze", "t").max

    // restore to the pre-constraint version: the set restores to EMPTY
    // (Delta RESTORE restores table metadata along with the file set) —
    // a previously-violating batch now commits
    lake.restoreBronze("t", unconstrained)
    assert(lake.checkConstraints("t").isEmpty,
      "restore kept a constraint added after the target version")
    lake.appendBronze("t", Seq(row(-5, "r2")).toDF("id", "snapshot_date", "run_id"))
    assert(lake.table("bronze", "t").count() == 2)

    // restore forward to the constrained version: enforcement resumes
    // (the -5 row predates this restore's file set, so it vanishes too)
    lake.restoreBronze("t", constrained)
    assert(lake.checkConstraints("t") == Seq("id_pos" -> "id > 0"))
    intercept[IllegalArgumentException](
      lake.appendBronze("t", Seq(row(-6, "r3")).toDF("id", "snapshot_date", "run_id")))
    assert(lake.table("bronze", "t").count() == 1)
  }
}
