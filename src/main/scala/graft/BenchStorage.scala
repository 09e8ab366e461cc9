package graft

import java.nio.file.Files

import graft.pipeline.Lakehouse
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-path benchmark: the bronze transaction log's write-side ops —
  * append, predicate delete (copy-on-write), clustered compaction
  * (OPTIMIZE ZORDER parity) and vacuum — timed at SPARK_GRAFT_SF_DIR scale.
  * Prints one JSON line standalone; [[Bench]] folds the same measurement
  * into the driver's bench record as the `storage_ops` composite entry so
  * log-write performance is tracked round-over-round, not only in ad-hoc
  * recordings.
  *
  * The scale claim under test: a COMMIT should cost O(files it adds), not
  * O(live files in the table) — `manifest_bytes` (size of the newest log
  * record after one single-file append into an already-populated table) is
  * the direct measure. The Delta answer is incremental log entries +
  * periodic checkpoints; this bench gives that work its before/after
  * evidence.
  */
object BenchStorage {

  final case class StorageResult(
      rows: Long,
      append16Sec: Double,
      tinyAppendSec: Double,
      manifestBytes: Long,
      liveFiles: Int,
      deleteDvSec: Double,
      readDvSec: Double,
      deleteSec: Double,
      rowsAfterDelete: Long,
      compactSec: Double,
      vacuumSec: Double,
      plainAppend4Sec: Double,
      rowtrackAppend4Sec: Double,
      rowtrackReadSec: Double,
      cdfReadSec: Double,
      identityAppend4Sec: Double,
      silverFeedTickSec: Double,
      goldFeedTickSec: Double) {
    /** Composite seconds — the one number the driver bench tracks.
      * PROTOCOL NOTE (r12): now includes the two deletion-vector steps
      * (delete_dv_sec + read_dv_sec) on top of the r11 sequence — compare
      * composites across rounds only after subtracting the new fields. */
    def totalSec: Double = append16Sec + tinyAppendSec + deleteDvSec + readDvSec +
      deleteSec + compactSec + vacuumSec
    // the r13 row-tracking attribution pair and the r14 CDF-read /
    // identity-append probes are deliberately EXCLUDED from total_sec so
    // the composite stays round-over-round comparable
    def detailJson(sfDir: String): String =
      s"""{"metric":"storage","total_sec":$totalSec,"rows":$rows,"append16_sec":$append16Sec,""" +
        s""""tiny_append_sec":$tinyAppendSec,"manifest_bytes":$manifestBytes,""" +
        s""""live_files":$liveFiles,"delete_dv_sec":$deleteDvSec,""" +
        s""""read_dv_sec":$readDvSec,"delete_run_sec":$deleteSec,""" +
        s""""rows_after_delete":$rowsAfterDelete,"compact_clustered_sec":$compactSec,""" +
        s""""vacuum_sec":$vacuumSec,"plain_append4_sec":$plainAppend4Sec,""" +
        s""""rowtrack_append4_sec":$rowtrackAppend4Sec,""" +
        s""""rowtrack_read_sec":$rowtrackReadSec,"cdf_read_sec":$cdfReadSec,""" +
        s""""identity_append4_sec":$identityAppend4Sec,""" +
        s""""silver_feed_tick_sec":$silverFeedTickSec,""" +
        s""""gold_feed_tick_sec":$goldFeedTickSec,"sf":"$sfDir"}"""
  }

  /** Run the full write-side sequence against a throwaway lakehouse (the
    * temp tree is deleted on exit — [[Bench]] runs this every invocation,
    * and each run writes the dataset several times over). */
  def runOps(spark: SparkSession, sfDir: String): StorageResult = {
    val tmpRoot = Files.createTempDirectory("graft-bench-storage")
    try runOpsAt(spark, sfDir, tmpRoot.toString)
    finally {
      val s = Files.walk(tmpRoot)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  private def runOpsAt(spark: SparkSession, sfDir: String, root: String): StorageResult = {
    val lake = new Lakehouse(spark, root)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val li = Graft.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate"))
      .cache()
    try {
      val rows = li.count()

      // ── appends: 16 run-stamped slices (the nightly-ingest cadence) ────
      val slices = 16
      val (_, appendSec) = timed {
        (0 until slices).foreach { i =>
          val slice = li.filter(pmod(col("l_orderkey"), lit(slices)) === i)
            .withColumn("snapshot_date", lit(java.sql.Date.valueOf(f"2026-01-${i + 1}%02d")))
            .withColumn("run_id", lit(f"run-$i%02d"))
          lake.appendBronze("facts", slice)
        }
      }

      // ── the commit-cost probe: ONE tiny append into the populated table ──
      val tiny = li.limit(10)
        .withColumn("snapshot_date", lit(java.sql.Date.valueOf("2026-02-01")))
        .withColumn("run_id", lit("run-tiny"))
        .repartition(1)
      val (_, tinyAppendSec) = timed(lake.appendBronze("facts", tiny))
      val base = lake.tableDir("bronze", "facts")
      val manifestBytes = {
        val s = Files.list(base)
        try Files.size(s.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter(_.getFileName.toString.startsWith("_files_v"))
          .maxBy(_.getFileName.toString.stripPrefix("_files_v").toInt))
        finally s.close()
      }
      val liveFiles = lake.committedBronzeRelPaths("facts").map(_.size).getOrElse(0)

      // ── deletion-vector delete: a PARTIAL predicate (half of run-06 by
      // orderkey parity), so vectors are genuinely written and the
      // subsequent read pays the merge-on-read subtract — the honest cost
      // pair (a run-aligned full-file delete is pure metadata and would
      // time ~0)
      val (_, deleteDvSec) = timed(lake.deleteBronzeWhereDv("facts",
        col("run_id") === "run-06" && pmod(col("l_orderkey"), lit(32)) === 6,
        Seq(graft.pipeline.ManifestStats.StatEq("run_id", "run-06"))))
      val (_, readDvSec) = timed(lake.table("bronze", "facts").count())

      // ── predicate delete: one run's rows, stats-pruned copy-on-write ───
      val (_, deleteSec) = timed(lake.deleteBronzeWhere("facts",
        col("run_id") === "run-07",
        Seq(graft.pipeline.ManifestStats.StatEq("run_id", "run-07"))))
      val afterDelete = lake.table("bronze", "facts").count()

      // ── clustered compaction (OPTIMIZE ZORDER parity; purges vectors) ──
      val (_, compactSec) = timed(
        lake.compactClustered("bronze", "facts", "l_orderkey", "l_partkey", numFiles = 16))

      // ── vacuum: reclaim the files the delete + compaction unreferenced ──
      val (_, vacuumSec) = timed(lake.vacuumBronze("facts", keepVersions = 1, retainMillis = 0L))

      // ── row-tracking attribution: the SAME 4-slice append with the
      // feature off vs on (bases assign inside the commit CAS) plus the
      // id-deriving read — these fields are excluded from total_sec
      def seed(name: String): Unit = lake.appendBronze(name, li.limit(10)
        .withColumn("snapshot_date", lit(java.sql.Date.valueOf("2026-03-01")))
        .withColumn("run_id", lit("rt-seed")).repartition(1))
      def appendSlices(name: String): Double = timed {
        (0 until 4).foreach { i =>
          val slice = li.filter(pmod(col("l_orderkey"), lit(4)) === i)
            .withColumn("snapshot_date", lit(java.sql.Date.valueOf(f"2026-03-${i + 2}%02d")))
            .withColumn("run_id", lit(f"rt-$i%02d"))
          lake.appendBronze(name, slice)
        }
      }._2
      seed("facts_plain"); seed("facts_rt")
      lake.enableRowTracking("facts_rt")
      val plain4 = appendSlices("facts_plain")
      val rt4 = appendSlices("facts_rt")
      val (_, rtRead) = timed(lake.tableWithRowIds("facts_rt")
        .select(max(col("_row_id"))).collect())

      // ── identity attribution: the SAME 4-slice append with an identity
      // column (per-batch O(1) ID RESERVE commit + the fill before
      // staging) — read against plain_append4_sec, excluded from total_sec.
      // Identity declares while the table is EMPTY (GENERATED ALWAYS
      // cannot retrofit values onto committed rows), so before the seed.
      lake.addIdentityColumn("facts_id", "row_sk")
      seed("facts_id")
      val id4 = appendSlices("facts_id")

      // ── CDF read, AFTER the composite sequence so it cannot perturb the
      // round-over-round-counted steps: one fresh (untimed) DV delete on
      // the compacted table, then ONE timed consumer tick over that commit
      // (grown vectors → delete rows) — the change-extraction cost a
      // cursor consumer pays per version
      lake.deleteBronzeWhereDv("facts", pmod(col("l_orderkey"), lit(64)) === 9)
      val cdfV = lake.committedBronzeVersion("facts")
      val (_, cdfReadSec) = timed(
        lake.tableChanges("facts", cdfV - 1, cdfV).count())

      // ── CDF-driven MV refresh probes (r15): the silver latest-wins feed
      // fold (Silver.latestWinsFeedTick) and the gold grain-routed star
      // fold (Gold.starFeedTick), each timed on ONE tick draining a
      // churn-sized delta (a ~1/64 re-observation + a retraction) into a
      // standing table bootstrapped UNTIMED from a 1/16 lineitem slice —
      // the cost-∝-changed-rows claim of the Enzyme analog measured
      // directly, round-over-round. Excluded from total_sec.
      val mvSrcRows = li.filter(pmod(col("l_orderkey"), lit(16)) === 3)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .withColumn("obs_seq", lit(1))
      lake.appendBronze("mv_src", mvSrcRows) // v1
      val silverCur = s"$root/_probe_cursors/silver"
      val goldCur = s"$root/_probe_cursors/gold"
      def silverTick() = graft.pipeline.Silver.latestWinsFeedTick(lake,
        "silver", "mv", "mv_src", Seq("l_orderkey", "l_partkey"),
        Seq(col("obs_seq").desc), identity, silverCur)
      silverTick() // snapshot bootstrap (untimed)
      val factDep = graft.pipeline.Gold.FeedDep(
        "mv_src", Seq("l_orderkey", "l_partkey"), identity)
      def goldTick() = graft.pipeline.Gold.starFeedTick(lake, "mart",
        Seq("l_orderkey", "l_partkey"), factDep, Seq.empty, "mv",
        (_, f) => f.select(col("l_orderkey"), col("l_partkey"),
          (col("l_quantity") * 2).as("q2"), col("obs_seq")), goldCur)
      goldTick() // wholesale bootstrap (untimed)
      lake.appendBronze("mv_src",
        mvSrcRows.filter(pmod(col("l_orderkey"), lit(1024)) === 3)
          .withColumn("obs_seq", lit(2))) // v2: churn-sized re-observation
      lake.deleteBronzeWhereDv("mv_src",
        col("obs_seq") === 2 && pmod(col("l_partkey"), lit(7)) === 0) // v3: retraction
      val (_, silverTickSec) = timed(silverTick())
      val (_, goldTickSec) = timed(goldTick())

      StorageResult(rows, appendSec, tinyAppendSec, manifestBytes, liveFiles,
        deleteDvSec, readDvSec, deleteSec, afterDelete, compactSec, vacuumSec,
        plain4, rt4, rtRead, cdfReadSec, id4, silverTickSec, goldTickSec)
    } finally li.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session(appName = "graft-bench-storage")
    println(runOps(spark, sfDir).detailJson(sfDir))
    spark.stop()
  }
}
