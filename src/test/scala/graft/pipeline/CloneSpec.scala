package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

import Fixtures.d

/** Shallow clone ([[Lakehouse.cloneBronze]]) — Delta `SHALLOW CLONE`
  * re-expressed on the file log. Under test: zero-copy creation (one
  * metadata commit, no data files), full read parity including stats
  * skipping and deletion-vector subtract through rerooted paths,
  * independence of the two logs after the clone, constraint carry-over,
  * OPTIMIZE-to-self-contained, and the vacuum safety rule (clone vacuum
  * never touches source files; source vacuum loss is repairable). */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def mkLake(tag: String): Lakehouse =
    new Lakehouse(spark, Files.createTempDirectory(s"graft-$tag").toString)

  private def seed(lake: Lakehouse, table: String): Unit =
    (1 to 3).foreach { r =>
      lake.appendBronze(table,
        (0 until 4).map(i => ((r * 100 + i).toLong, d("2025-06-01"), s"run$r"))
          .toDF("id", "snapshot_date", "run_id").repartition(1))
    }

  private def localParquetCount(lake: Lakehouse, table: String): Int = {
    import scala.jdk.CollectionConverters._
    val base = lake.tableDir("bronze", table)
    val s = Files.walk(base)
    try s.iterator().asScala.count(p =>
      p.toString.endsWith(".parquet") && Files.isRegularFile(p))
    finally s.close()
  }

  test("clone is zero-copy, reads identically, and skips through carried stats") {
    val lake = mkLake("clone")
    seed(lake, "src")
    lake.deleteBronzeWhereDv("src", col("id") === 101L) // a vector rides along
    lake.cloneBronze("src", "dst")
    // zero-copy: no parquet under dst at all (checkpoint twin is tiny-table-skipped)
    assert(localParquetCount(lake, "dst") == 0)
    assert(lake.table("bronze", "dst").count() == 11) // vector subtracted
    assert(lake.table("bronze", "dst").orderBy("id").collect().toSeq ==
      lake.table("bronze", "src").orderBy("id").collect().toSeq)
    // carried stats still prune: run2 probe hits exactly one (rerooted) file
    assert(lake.prunedFilePaths("bronze", "dst",
      Seq(ManifestStats.StatEq("run_id", "run2"))).size == 1)
    assert(lake.history("bronze", "dst").head().getString(2) == "CLONE")
    intercept[IllegalArgumentException](lake.cloneBronze("src", "dst"))
    // the stats-pruned read path resolves rerooted paths too (and still
    // subtracts the carried vector)
    val pruned = lake.tableWhere("bronze", "dst",
      Seq(ManifestStats.StatEq("run_id", "run1")))
    assert(pruned.count() == 3 && pruned.filter(col("id") === 101L).isEmpty)
  }

  test("clone and source are independent; OPTIMIZE makes the clone self-contained") {
    val lake = mkLake("cloneind")
    seed(lake, "src")
    lake.cloneBronze("src", "dst")
    lake.deleteByRunId("dst", "run1")
    lake.appendBronze("dst", Seq((999L, d("2025-06-02"), "run9"))
      .toDF("id", "snapshot_date", "run_id"))
    assert(lake.table("bronze", "src").count() == 12, "clone write leaked into source")
    assert(lake.table("bronze", "dst").count() == 9)
    lake.deleteByRunId("src", "run3")
    assert(lake.table("bronze", "dst").count() == 9, "source delete leaked into clone")
    // OPTIMIZE rewrites into the clone's own dirs -> fully local live set
    assert(lake.compactSmall("bronze", "dst", minSmallFiles = 2))
    val live = lake.prunedFilePaths("bronze", "dst", Nil)
    assert(live.nonEmpty && !live.exists(_.contains("..")), live.mkString(","))
    assert(lake.table("bronze", "dst").count() == 9)
  }

  test("clone at an older version; constraints carry; vacuum safety both ways") {
    val lake = mkLake("clonever")
    seed(lake, "src")
    lake.addCheckConstraint("src", "id_pos", "id > 0")
    val vBeforeDelete = lake.tableVersions("bronze", "src").max
    lake.deleteByRunId("src", "run2")
    lake.cloneBronze("src", "past", version = Some(vBeforeDelete))
    assert(lake.table("bronze", "past").count() == 12) // pre-delete state
    // constraint carried: violating append to the clone rejects
    assert(lake.checkConstraints("past") == Seq("id_pos" -> "id > 0"))
    intercept[IllegalArgumentException](
      lake.appendBronze("past", Seq((-1L, d("2025-06-01"), "rx"))
        .toDF("id", "snapshot_date", "run_id")))
    // vacuum of the CLONE never touches source files
    lake.vacuumBronze("past", keepVersions = 1, retainMillis = 0L)
    assert(lake.table("bronze", "src").count() == 8)
    assert(lake.table("bronze", "past").count() == 12)
    // vacuum of the SOURCE reclaims run2's file under the source's own
    // retention; the clone then fails fast and repair drops the entry
    lake.compact("bronze", "src", numFiles = 1)
    lake.vacuumBronze("src", keepVersions = 1, retainMillis = 0L)
    val dropped = lake.repairBronze("past")
    assert(dropped.nonEmpty, "expected the clone to lose vacuumed source files")
    assert(lake.table("bronze", "past").count() < 12)
  }
}
