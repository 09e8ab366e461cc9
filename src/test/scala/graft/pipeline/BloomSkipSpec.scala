package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

import Fixtures.d

/** Per-file bloom-filter skipping ([[ManifestStats.bloomStats]]): equality
  * probes on high-cardinality keys prune on MEMBERSHIP where min/max
  * ranges cannot — the post-compaction case where every file's range
  * covers the key space. No false negatives ever (a present value always
  * keeps its file); false positives only cost a kept file. */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private def mkLake(tag: String): Lakehouse =
    new Lakehouse(spark, Files.createTempDirectory(s"graft-$tag").toString)

  private def runRows(ids: Seq[String]) =
    ids.zipWithIndex.map { case (r, i) => (i.toLong, d("2025-06-01"), r) }
      .toDF("id", "snapshot_date", "run_id").repartition(1)

  test("bloom prunes equality probes that overlapping min/max ranges cannot") {
    val lake = mkLake("bloomrange")
    // file A holds runs r01+r09, file B holds r02+r08: the [min,max]
    // ranges NEST (r01..r09 ⊇ r02..r08), so a range-only probe for r05
    // keeps both files — the bloom must rule both out
    lake.appendBronze("t", runRows(Seq("r01", "r09")), bloomCols = Seq("run_id"))
    lake.appendBronze("t", runRows(Seq("r02", "r08")), bloomCols = Seq("run_id"))
    def probe(run: String) =
      lake.prunedFilePaths("bronze", "t", Seq(ManifestStats.StatEq("run_id", run)))
    assert(probe("r05").isEmpty,
      "bloom failed to exclude a value inside both files' ranges")
    // no false negatives: every present run keeps exactly its file
    assert(probe("r01").size == 1 && probe("r09").size == 1)
    assert(probe("r02").size == 1 && probe("r08").size == 1)
    assert(probe("r01").head != probe("r02").head, "probes resolved to the same file")
    // and the full scan still sees everything (blooms only ever skip)
    assert(lake.table("bronze", "t").count() == 4)
  }

  test("blooms are typed: a LONG column probe uses the encoded-value item") {
    val lake = mkLake("bloomlong")
    lake.appendBronze("t",
      Seq((10L, d("2025-06-01"), "r1"), (30L, d("2025-06-01"), "r1"))
        .toDF("id", "snapshot_date", "run_id").repartition(1),
      statsCols = Seq("run_id"), // NO min/max for id: bloom alone must prune
      bloomCols = Seq("id"))
    def probe(id: Long) =
      lake.prunedFilePaths("bronze", "t", Seq(ManifestStats.StatEq("id", id)))
    assert(probe(20L).isEmpty, "absent long admitted despite bloom")
    assert(probe(10L).size == 1 && probe(30L).size == 1)
  }

  test("bloom tag mismatch ADMITS: a Double probe against a LONG column never prunes") {
    val lake = mkLake("bloomtag")
    lake.appendBronze("t",
      Seq((10L, d("2025-06-01"), "r1"), (30L, d("2025-06-01"), "r1"))
        .toDF("id", "snapshot_date", "run_id").repartition(1),
      statsCols = Seq("run_id"), // no min/max for id: the bloom is the only signal
      bloomCols = Seq("id"))
    // a Double 10.0 probe encodes as 'f:10.0' — absent from the 'l:…' bloom
    // items; skipping on that absence would be a silent wrong prune. The
    // recorded item tag mismatch must admit the file instead.
    val kept = lake.prunedFilePaths("bronze", "t",
      Seq(ManifestStats.StatEq("id", 10.0)))
    assert(kept.size == 1, "tag-mismatched probe wrongly pruned the file")
  }

  test("deleteByRunId on a bloom-maintained table vectors only the matching file") {
    val lake = mkLake("bloomdel")
    lake.appendBronze("t", runRows(Seq("r01", "r09")), bloomCols = Seq("run_id"))
    lake.appendBronze("t", runRows(Seq("r02", "r08")), bloomCols = Seq("run_id"))
    val before = lake.prunedFilePaths("bronze", "t", Nil).toSet
    val fileA = lake.prunedFilePaths("bronze", "t",
      Seq(ManifestStats.StatEq("run_id", "r01"))).head
    lake.deleteByRunId("t", "r02") // ranges overlap; the bloom bounds the scan to file B
    // deleteByRunId rides the deletion-vector path: the mixed file stays
    // LIVE with a 1-row vector; the bloom-excluded file must carry none
    val after = lake.prunedFilePathsMetered("bronze", "t", Nil)._1
    assert(after.map(_._1).toSet == before, "DV delete must not change the live file set")
    val dvByFile = after.toMap
    assert(dvByFile(fileA).isEmpty, "delete vectored a file its bloom excluded")
    assert(after.count(_._2.isDefined) == 1, "exactly one file should carry a vector")
    assert(lake.table("bronze", "t").count() == 3)
  }

  test("compactSmall(bloomCols) re-collects blooms on packed outputs") {
    val lake = mkLake("bloompack")
    (1 to 6).foreach(i => lake.appendBronze("t", runRows(Seq(f"r$i%02d")),
      bloomCols = Seq("run_id")))
    assert(lake.compactSmall("bronze", "t", bloomCols = Seq("run_id")))
    // the packed file mixes r01..r06 — range is wide open, but an absent
    // value inside the range must still prune to zero files
    assert(lake.prunedFilePaths("bronze", "t",
      Seq(ManifestStats.StatEq("run_id", "r0x"))).isEmpty,
      "packed output lost its bloom")
    assert(lake.table("bronze", "t").count() == 6)
  }

  test("a column too dense per file records no bloom (and never skips wrongly)") {
    val lake = mkLake("bloomcap")
    val n = ManifestStats.MaxBloomItemsPerFile + 1
    lake.appendBronze("t",
      (0 until n).map(i => (2L * i, d("2025-06-01"), "r1"))
        .toDF("id", "snapshot_date", "run_id").repartition(1),
      bloomCols = Seq("id"))
    // an odd id is absent but inside [0, 2n]: with no bloom recorded the
    // file must be KEPT (range admits, membership unknown)
    assert(lake.prunedFilePaths("bronze", "t",
      Seq(ManifestStats.StatEq("id", 11L))).size == 1)
  }
}
