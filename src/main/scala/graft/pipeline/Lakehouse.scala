package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Path-backed three-layer medallion catalog: `bronze` / `silver` / `gold`
  * namespaces, one parquet directory per table under `root`.
  *
  * Plays the role Unity Catalog + Delta play for the reference
  * (`lakeflow/bootstrap_unity_catalog.sql`): bronze tables are
  * log-managed append+delete parquet ("DELETE WHERE run_id", the
  * reference's idempotent re-run primitive at
  * `ingest_data_api_to_bronze.py:91-93`, is file-granular copy-on-write —
  * exactly Delta's `add`/`remove` semantics); at cluster scale this slot
  * is filled by Delta (a one-line `format("delta")` swap); the engine
  * semantics above it are identical.
  *
  * Pruning posture for 100 TB: bronze manifests record per-file
  * `snapshot_date`/`run_id` min-max stats ([[ManifestStats]]) so silver
  * refreshes FILE-SKIP to the snapshots they need (the
  * Delta-data-skipping generalization of hive partition pruning — same
  * O(new data) scans, no small-partition-directory explosion);
  * silver/gold are full-refresh materializations (the reference's
  * `CREATE OR REFRESH MATERIALIZED VIEW` semantics — recompute is the
  * correctness baseline, incremental refresh an optimization on top).
  *
  * Materialized tables carry a SINGLE-WRITER TRANSACTION LOG — the
  * minimal slice of what Delta's `_delta_log` provides the reference:
  * each refresh writes a fresh immutable `_v{N}` data directory, then
  * commits by atomically renaming a `_VERSION` manifest (version number +
  * live file list) over the previous one. Readers resolve the manifest
  * first, so they observe either the old version or the new one — never
  * a half-written directory — and a crash at ANY point of a refresh
  * leaves the previous committed version live (the old
  * delete-then-rename swap had a window where the table was briefly
  * absent). The previously-committed data directory survives one more
  * commit before GC, so in-flight readers of the just-replaced version
  * finish their scan. Concurrency: full refreshes serialize via
  * exclusive-create slot claims; incremental merges run read-set-checked
  * OCC transactions ([[transactMerge]]) that retry on conflict instead
  * of losing updates. Bronze appends/deletes go through their own
  * file-granular `_FILES` log (same atomic-manifest commit point;
  * single-writer appends, matching the reference's serialized ingest
  * task — the one remaining divergence from Delta's concurrent blind
  * appends).
  */
final class Lakehouse(val spark: SparkSession, val root: String,
    schemaOverrides: Map[String, String] = Lakehouse.envSchemaOverrides()) {

  /** Logical → physical schema name (dbt-style indirection; identity unless
    * overridden via constructor or `GRAFT_SCHEMA_*` env vars). */
  def physicalSchema(layer: String): String = schemaOverrides.getOrElse(layer, layer)

  private def dir(layer: String, name: String): Path =
    Paths.get(root, physicalSchema(layer), name)

  def exists(layer: String, name: String): Boolean = Files.exists(dir(layer, name))

  private val ManifestName = "_VERSION"
  private val versionDir = "_v(\\d+)".r

  /** Committed version from the manifest; 0 = plain (pre-manifest) layout. */
  private def currentVersion(base: Path): Int = {
    val m = base.resolve(ManifestName)
    if (!Files.exists(m)) 0
    else new String(Files.readAllBytes(m), java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.next().trim.toInt
  }

  /** Directory holding the table's LIVE data files: the committed `_v{N}`
    * when a manifest exists, the table dir itself for plain-layout tables
    * (bronze, pre-upgrade materializations). */
  def currentDataDir(layer: String, name: String): Path = {
    val base = dir(layer, name)
    val v = currentVersion(base)
    if (v == 0) base else base.resolve(s"_v$v")
  }

  def table(layer: String, name: String): DataFrame = {
    val base = dir(layer, name)
    readFilesManifest(base) match {
      case Some((_, entries)) => // log-managed bronze: read the LIVE file set
        spark.read.parquet(entries.map(e => base.resolve(e.relPath).toString): _*)
      case None =>
        spark.read.parquet(currentDataDir(layer, name).toString)
    }
  }

  /** Committed version number of a materialized table (0 = plain layout /
    * never materialized under the manifest protocol). */
  def tableVersion(layer: String, name: String): Int = currentVersion(dir(layer, name))

  /** Versions still on disk, ascending. Retention is bounded: [[materialize]]
    * GCs all but the committed version and its immediate predecessor, so
    * this is at most two entries — enough for "what did the last refresh
    * change" diffs without Delta's unbounded log. */
  def tableVersions(layer: String, name: String): Seq[Int] = {
    val base = dir(layer, name)
    if (Files.exists(base.resolve(FilesManifest))) {
      // log-managed bronze: the retention window is the history manifests
      // gcBronze keeps (committed + predecessor), whose files are all live
      return Files.list(base).toArray.map(_.asInstanceOf[Path]).collect {
        case p if filesHistory.pattern.matcher(p.getFileName.toString).matches() =>
          p.getFileName.toString.stripPrefix("_files_v").toInt
      }.sorted.toSeq
    }
    val committed = currentVersion(base)
    if (!Files.exists(base) || committed == 0) Seq.empty
    else Files.list(base).toArray.map(_.asInstanceOf[Path]).collect {
      case p if {
        val n = p.getFileName.toString
        versionDir.pattern.matcher(n).matches() && {
          val v = n.drop(2).toInt
          // only the retention window counts as history: the committed
          // version and its immediate predecessor. Anything else on disk
          // (a claimed-then-crashed slot, an abandoned OCC loser) is
          // debris awaiting GC, never time-travel-readable. _SUCCESS
          // additionally excludes half-written directories.
          (v == committed || v == committed - 1) &&
            Files.exists(p.resolve("_SUCCESS"))
        }
      } => p.getFileName.toString.drop(2).toInt
    }.sorted.toSeq
  }

  /** Time-travel read: the table AS OF `version`. Only versions within the
    * retention window ([[tableVersions]]) are readable; asking for a GC'd
    * or uncommitted version fails fast. */
  def tableAt(layer: String, name: String, version: Int): DataFrame = {
    val avail = tableVersions(layer, name)
    require(avail.contains(version),
      s"version $version of $layer.$name is not on disk (available: ${avail.mkString(",")})")
    val base = dir(layer, name)
    readManifestFile(base.resolve(s"_files_v$version")) match {
      case Some((_, entries)) => // log-managed bronze: the version's file set
        spark.read.parquet(entries.map(e => base.resolve(e.relPath).toString): _*)
      case None =>
        spark.read.parquet(base.resolve(s"_v$version").toString)
    }
  }

  // ───── bronze transaction log ─────────────────────────────────────────
  //
  // Bronze tables are APPEND+DELETE workloads, so their log tracks live
  // FILES across immutable `_a{N}` append directories instead of whole
  // version directories: an append commits O(new files), a predicate
  // delete rewrites only the files that contain matching rows (Delta's
  // copy-on-write `add`/`remove` shape), and the `_FILES` manifest rename
  // is the single atomic commit point — a crash anywhere mid-ingest
  // leaves the previous committed file set live, never a half-appended
  // table. Each manifest line carries per-file min/max stats
  // ([[ManifestStats]]) for file-level data skipping; `snapshot_date`
  // lives as a DATA column (stats replace hive directory partitioning,
  // the Delta-without-partitioning layout), so pruning by snapshot range
  // goes through [[tableWhere]]. Appends are SINGLE-WRITER per table
  // (the reference's bronze writer is one serialized job task); readers
  // are never blocked and always see a committed version.

  private val FilesManifest = "_FILES"
  private val appendDir = "_a(\\d+)".r
  private val filesHistory = "_files_v(\\d+)".r

  private def readFilesManifest(base: Path): Option[(Int, Seq[ManifestStats.FileEntry])] =
    readManifestFile(base.resolve(FilesManifest))

  private def readManifestFile(m: Path): Option[(Int, Seq[ManifestStats.FileEntry])] =
    if (!Files.exists(m)) None
    else {
      val lines = new String(Files.readAllBytes(m), java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator.toSeq
      Some((lines.head.trim.toInt,
        lines.tail.filter(_.nonEmpty).map(ManifestStats.parseLine)))
    }

  /** Write `_files_v{version}` history first (GC's reference set), then
    * atomically rename the live `_FILES` manifest into place — THE commit. */
  private def commitFilesManifest(
      base: Path, version: Int, entries: Seq[ManifestStats.FileEntry]): Unit = {
    val body = (version.toString +: entries.map(_.render)).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Files.write(base.resolve(s"_files_v$version"), body)
    val tmp = base.resolve(s".$FilesManifest.$version.tmp")
    Files.write(tmp, body)
    Files.move(tmp, base.resolve(FilesManifest), StandardCopyOption.ATOMIC_MOVE)
  }

  /** GC after a commit: data files referenced by NEITHER the committed
    * manifest NOR its predecessor go (in-flight readers of the replaced
    * version finish their scan — the [[materialize]] retention window),
    * along with emptied `_a` dirs and history files below the window. */
  private def gcBronze(base: Path, committed: Int): Unit = {
    val keep = (readManifestFile(base.resolve(s"_files_v$committed")).toSeq ++
        readManifestFile(base.resolve(s"_files_v${committed - 1}")).toSeq)
      .flatMap(_._2).map(_.relPath).toSet
    Files.list(base).toArray.map(_.asInstanceOf[Path]).foreach { p =>
      p.getFileName.toString match {
        case appendDir(_) =>
          Files.list(p).toArray.map(_.asInstanceOf[Path]).foreach { f =>
            val n = f.getFileName.toString
            if (n.endsWith(".parquet") &&
                !keep.contains(s"${p.getFileName}/$n")) {
              Files.delete(f)
              val crc = f.resolveSibling(s".$n.crc")
              if (Files.exists(crc)) Files.delete(crc)
            }
          }
          if (!Files.list(p).toArray.map(_.asInstanceOf[Path])
              .exists(_.getFileName.toString.endsWith(".parquet")))
            deleteRecursively(p)
        case filesHistory(k) => if (k.toInt < committed - 1) Files.delete(p)
        case _ =>
      }
    }
  }

  /** One-time migration of a pre-log bronze directory (hive-partitioned
    * parquet, or the old empty-table single file) into the `_FILES`
    * protocol: rewrite the rows (snapshot_date becomes a data column) as
    * `_a1` and commit them as version 1. */
  private def upgradeLegacyBronze(base: Path, statsCols: Seq[String]): Unit = {
    if (readFilesManifest(base).nonEmpty || !Files.exists(base)) return
    val legacy = Files.list(base).toArray.map(_.asInstanceOf[Path]).filter { p =>
      val n = p.getFileName.toString
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (legacy.isEmpty) return
    val df = spark.read.parquet(base.toString)
    // project partition columns back into the data files, original order
    val ordered = graft.pipeline.Schemas.bronzeEnvelope.fieldNames.toSeq
    val cols = if (df.columns.toSet == ordered.toSet) ordered else df.columns.toSeq
    val dataDir = base.resolve("_a1")
    deleteRecursively(dataDir)
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
    commitFilesManifest(base, 1,
      ManifestStats.collectStats(df, dataDir.toString, statsCols, "_a1"))
    legacy.foreach(deleteRecursively)
  }

  /** Append rows (bronze ingest) as a logged transaction: new files land
    * in an immutable `_a{N}` dir, their min/max stats are recorded, and
    * the `_FILES` manifest rename commits — a crash at any earlier point
    * leaves the table at the previous version (no half-appended data is
    * ever visible, the Delta-bronze guarantee the reference gets from
    * `USING DELTA`). */
  def appendBronze(name: String, df: DataFrame,
      statsCols: Seq[String] = Lakehouse.BronzeStatsCols): Unit = {
    val base = dir("bronze", name)
    Files.createDirectories(base)
    upgradeLegacyBronze(base, statsCols)
    val (v, entries) = readFilesManifest(base).getOrElse((0, Seq.empty))
    // first free append-dir number ≥ v+1 (skips crash debris awaiting GC)
    var next = v + 1
    while (Files.exists(base.resolve(s"_a$next"))) next += 1
    val dataDir = base.resolve(s"_a$next")
    df.write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
    commitFilesManifest(base, next,
      entries ++ ManifestStats.collectStats(df, dataDir.toString, statsCols, s"_a$next"))
    gcBronze(base, next)
  }

  /** Idempotent re-run delete: drop all rows of `run_id` before re-append.
    * The manifest's run_id file stats bound the scan to files whose range
    * covers the run — a re-ingest never rewrites unrelated history. */
  def deleteByRunId(name: String, runId: String): Unit =
    deleteBronzeWhere(name, org.apache.spark.sql.functions.col("run_id").equalTo(runId),
      Seq(ManifestStats.StatEq("run_id", runId)))

  /** Predicate delete — "DELETE WHERE <condition>" over a bronze table,
    * copy-on-write at FILE granularity: stats-candidate files are scanned
    * for true matches, only files actually containing matching rows are
    * rewritten (their retained rows land in a fresh `_a{N}`), untouched
    * files stay live as-is, and the manifest rename commits the swap.
    * Rows where `condition` is null are treated as matching (dropped),
    * the DML convention the run-id variant above has always had.
    * `statPreds` (optional) conservatively describe the DELETED rows so
    * file stats can prune the candidate scan. */
  def deleteBronzeWhere(name: String, condition: org.apache.spark.sql.Column,
      statPreds: Seq[ManifestStats.StatPred] = Nil): Unit = {
    import org.apache.spark.sql.functions.input_file_name
    val base = dir("bronze", name)
    if (!Files.exists(base)) return
    upgradeLegacyBronze(base, Lakehouse.BronzeStatsCols)
    readFilesManifest(base) match {
      case None => // never written
      case Some((v, entries)) =>
        val candidates = entries.filter(e => ManifestStats.mightMatch(e, statPreds))
        if (candidates.isEmpty) return
        val candPaths = candidates.map(e => base.resolve(e.relPath).toString)
        // null condition counts as a match (dropped), so detect via NOT(NOT cond)
        val matchCond = !org.apache.spark.sql.functions.coalesce(
          !condition, org.apache.spark.sql.functions.lit(false))
        val affectedNames = spark.read.parquet(candPaths: _*)
          .withColumn("__f", input_file_name()).filter(matchCond)
          .select("__f").distinct().collect()
          .map(_.getString(0).split('/').takeRight(2).mkString("/")).toSet
        if (affectedNames.isEmpty) return
        val (affected, untouched) = entries.partition(e => affectedNames.contains(e.relPath))
        val retained = spark.read
          .parquet(affected.map(e => base.resolve(e.relPath).toString): _*)
          .filter(!condition)
        var next = v + 1
        while (Files.exists(base.resolve(s"_a$next"))) next += 1
        val newEntries =
          if (retained.isEmpty && untouched.nonEmpty) Seq.empty
          else {
            val dataDir = base.resolve(s"_a$next")
            // zero-row rewrite keeps ONE schema file so an emptied table
            // stays readable
            val out = if (retained.isEmpty) retained.repartition(1) else retained
            out.write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
            ManifestStats.collectStats(retained, dataDir.toString,
              Lakehouse.BronzeStatsCols, s"_a$next")
          }
        commitFilesManifest(base, next, untouched ++ newEntries)
        gcBronze(base, next)
    }
  }

  /** Live data files of a table after FILE-LEVEL DATA SKIPPING: entries
    * whose recorded min/max ranges cannot satisfy `preds` are pruned
    * before Spark ever lists them. Works for both manifest species —
    * bronze `_FILES` logs and materialized `_VERSION` manifests (whose
    * lines carry stats when the refresh recorded them). Plain-layout
    * tables return their directory (no stats → no skipping). */
  def prunedFilePaths(layer: String, name: String,
      preds: Seq[ManifestStats.StatPred]): Seq[String] = {
    val base = dir(layer, name)
    readFilesManifest(base) match {
      case Some((_, entries)) =>
        entries.filter(e => ManifestStats.mightMatch(e, preds))
          .map(e => base.resolve(e.relPath).toString)
      case None =>
        val dd = currentDataDir(layer, name)
        readManifestFile(base.resolve(ManifestName)) match {
          case Some((_, entries)) if entries.nonEmpty =>
            entries.filter(e => ManifestStats.mightMatch(e, preds))
              .map(e => dd.resolve(e.relPath).toString)
          case _ => Seq(dd.toString)
        }
    }
  }

  /** Scan with file skipping: only files whose stats admit `preds` are
    * read. The caller still applies its exact row filter — skipping is a
    * superset guarantee, like parquet row-group pruning one level up. */
  def tableWhere(layer: String, name: String,
      preds: Seq[ManifestStats.StatPred]): DataFrame = {
    val pruned = prunedFilePaths(layer, name, preds)
    if (pruned.nonEmpty) spark.read.parquet(pruned: _*)
    else table(layer, name).filter(org.apache.spark.sql.functions.lit(false))
  }

  /** Path a STREAMING source should monitor for this table: the `_a*`
    * append-dir glob for log-managed bronze (appends land as new matched
    * dirs), the live data dir otherwise. */
  def streamSourcePath(layer: String, name: String): String = {
    val base = dir(layer, name)
    if (readFilesManifest(base).nonEmpty) s"$base/_a*"
    else currentDataDir(layer, name).toString
  }

  private val commitMarker = "_commit_v(\\d+)".r

  /** Materialize one silver/gold model (MV refresh = full recompute).
    *
    * Commit protocol (versioned ACID with slot-claim OCC): (1) CLAIM the
    * next version slot by exclusively creating a `_commit_v{N}` marker —
    * `Files.createFile` is atomic on POSIX, so of two concurrent writers
    * exactly one owns a slot and the other retries on the following
    * number (Delta's optimistic log-entry race, reduced to the
    * filesystem); (2) execute the plan into the claimed immutable
    * `_v{N}` directory — the previous version stays live throughout, so
    * a refresh can read its own table; (3) atomically rename the
    * `_VERSION` manifest (version + file list) into place — THE commit
    * point for readers; (4) GC versions older than the immediately-
    * previous one, plus pre-manifest legacy files and stale markers. A
    * crash before (3) leaves the old version committed; after (3) the
    * new one. Readers never see a partial or absent table.
    *
    * Concurrency contract: concurrent FULL refreshes of one table
    * serialize cleanly (each claims its own version; last committed
    * manifest wins — the correct semantics for recompute-from-upstream
    * MVs, Delta's blind-overwrite equivalence). Concurrent INCREMENTAL
    * merges must NOT use this entry point (a merge's read of the
    * standing table is not conflict-checked here) — they go through
    * [[transactMerge]], whose exact-successor slot claim turns the
    * read-write race into a detected conflict + retry. */
  def materialize(layer: String, name: String, df: DataFrame,
      statsCols: Seq[String] = Nil): Unit = {
    val base = dir(layer, name)
    Files.createDirectories(base)
    // claim a version slot (OCC): first free number at-or-above current+1
    var next = currentVersion(base) + 1
    var claimed = false
    var attempts = 0
    while (!claimed) {
      try {
        Files.createFile(base.resolve(s"_commit_v$next"))
        claimed = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempts += 1
          require(attempts < 1000, s"could not claim a commit slot for $layer.$name")
          next += 1 // another writer (or a crashed attempt) owns that slot
      }
    }
    writeVersion(base, next, df, statsCols)
    publishIfMonotonic(base, next)
    gcVersions(base)
  }

  /** Write the immutable `_v{next}` data directory and its manifest tmp
    * (per-file min/max stats recorded for `statsCols` — the data-skipping
    * read path of [[tableWhere]]). No commit happens here — the previous
    * version stays live. */
  private def writeVersion(base: Path, next: Int, df: DataFrame,
      statsCols: Seq[String] = Nil): Unit = {
    val dataDir = base.resolve(s"_v$next")
    deleteRecursively(dataDir) // debris from a crashed earlier attempt
    df.write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
    val entries =
      if (statsCols.isEmpty)
        ManifestStats.listParquet(dataDir.toString)
          .map(f => ManifestStats.FileEntry(f, Map.empty))
      else ManifestStats.collectStats(df, dataDir.toString, statsCols, "")
        .map(e => e.copy(relPath = e.relPath.stripPrefix("/")))
    val tmp = base.resolve(s".$ManifestName.$next.tmp")
    Files.write(tmp, (next.toString +: entries.map(_.render)).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Atomically rename the manifest into place UNLESS a higher version
    * already committed while we wrote — keeps the manifest monotonic when
    * concurrent refreshes overlap (best-effort — the check-then-rename
    * pair is not atomic, and a theoretical interleave can still publish
    * the lower version: the result is then older-but-complete, never
    * torn). When the publish is abandoned, the orphan data directory is
    * removed immediately so an uncommitted version can never be mistaken
    * for table history. Returns whether THIS version became the
    * committed one. */
  private def publishIfMonotonic(base: Path, next: Int): Boolean = {
    val tmp = base.resolve(s".$ManifestName.$next.tmp")
    if (currentVersion(base) < next) {
      Files.move(tmp, base.resolve(ManifestName), StandardCopyOption.ATOMIC_MOVE) // commit
      true
    } else {
      Files.delete(tmp)
      deleteRecursively(base.resolve(s"_v$next"))
      false
    }
  }

  private def gcVersions(base: Path): Unit = {
    // GC relative to the CURRENT manifest (a concurrent writer may have
    // committed a higher version after ours): keep the committed version
    // and one predecessor (in-flight readers of the just-replaced version
    // finish their scan); drop older versions, their markers, stale
    // manifest tmps, and any plain-layout legacy files now shadowed
    val keepFrom = currentVersion(base) - 1
    val manifestTmp = s"\\.$ManifestName\\.(\\d+)\\.tmp".r
    Files.list(base).toArray.map(_.asInstanceOf[Path]).foreach { p =>
      p.getFileName.toString match {
        case ManifestName =>
        case versionDir(k) => if (k.toInt < keepFrom) deleteRecursively(p)
        case commitMarker(k) => if (k.toInt < keepFrom) deleteRecursively(p)
        // a concurrent writer's in-flight manifest tmp carries a version
        // ≥ current — only stale (crashed) tmps below the keep window go
        case manifestTmp(k) => if (k.toInt < keepFrom) deleteRecursively(p)
        case _ => deleteRecursively(p)
      }
    }
  }

  /** Transactional (read-set-checked) refresh of one materialized table —
    * the optimistic-concurrency semantics Delta gives the reference's
    * incremental MERGEs, reduced to the manifest protocol:
    *
    *   1. READ: note the committed version, hand the live table to `plan`;
    *   2. VALIDATE+CLAIM: the commit slot claimed is EXACTLY
    *      `readVersion + 1` — if any other writer committed (or even
    *      claimed) that slot since the read, the exclusive marker create
    *      fails and the transaction retries from a fresh read, merging on
    *      top of the winner instead of silently overwriting it (the
    *      lost-update Delta raises `ConcurrentModificationException` for);
    *   3. COMMIT: publish stays monotonic — if a full refresh claimed a
    *      later slot and won the manifest race mid-write, this version is
    *      abandoned (orphan dir removed) and the merge retries.
    *
    * The conflict-checked read-set is the TARGET table (the standing rows
    * a merge folds new data into — the read whose staleness loses
    * updates). Upstream bronze inputs are append-only and re-read on
    * every attempt, so a retry always folds the latest data. Returns the
    * number of attempts taken (1 = no contention). */
  def transactMerge(layer: String, name: String, maxAttempts: Int = 5)(
      plan: DataFrame => DataFrame): Int = {
    var attempt = 1
    while (true) {
      val readVersion = tableVersion(layer, name)
      val df = plan(table(layer, name))
      if (materializeIfUnchanged(layer, name, readVersion, df)) return attempt
      require(attempt < maxAttempts,
        s"transactMerge($layer.$name) lost $maxAttempts consecutive OCC races")
      attempt += 1
    }
    -1 // unreachable
  }

  /** Conditional materialize: commit `df` as version `readVersion + 1`
    * ONLY if `readVersion` is still the committed version — i.e. no other
    * writer has touched the table since the caller read it. Returns false
    * (leaving the table untouched and no debris in [[tableVersions]]) on
    * any conflict; callers re-read and retry ([[transactMerge]]). */
  def materializeIfUnchanged(
      layer: String, name: String, readVersion: Int, df: DataFrame): Boolean = {
    val base = dir(layer, name)
    Files.createDirectories(base)
    if (currentVersion(base) != readVersion) return false // committed past us
    val next = readVersion + 1
    val claimed =
      try { Files.createFile(base.resolve(s"_commit_v$next")); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    if (!claimed) return false // a competing writer owns the successor slot
    writeVersion(base, next, df)
    val committed = publishIfMonotonic(base, next)
    gcVersions(base)
    committed
  }

  /** Compaction pass — the OPTIMIZE parity op
    * (reference `job_tasks/ops/optimize_tables.py:116-132`): rewrite a
    * table's files at a target partition count. Log-managed bronze tables
    * compact WITHIN their log: all live files rewrite into one fresh
    * `_a{N}` and the manifest swap commits, so readers never see a
    * half-compacted table and stats are rebuilt for the new files. */
  def compact(layer: String, name: String, numFiles: Int = 1): Unit = {
    val base = dir(layer, name)
    readFilesManifest(base) match {
      case Some((v, entries)) =>
        val df = spark.read
          .parquet(entries.map(e => base.resolve(e.relPath).toString): _*)
          .repartition(numFiles)
        var next = v + 1
        while (Files.exists(base.resolve(s"_a$next"))) next += 1
        val dataDir = base.resolve(s"_a$next")
        df.write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
        commitFilesManifest(base, next,
          ManifestStats.collectStats(df, dataDir.toString,
            Lakehouse.BronzeStatsCols, s"_a$next"))
        gcBronze(base, next)
      case None =>
        materialize(layer, name, table(layer, name).repartition(numFiles))
    }
  }

  /** `OPTIMIZE ... ZORDER BY (x, y)` parity: rewrite the table clustered
    * along a space-filling curve over two columns AND record per-file
    * min/max for both in the manifest — after this, [[tableWhere]]
    * rectangle predicates skip whole files on EITHER dimension (and
    * parquet row-group pruning continues below file level). `curve`:
    * "hilbert" (default — tighter envelopes, see `operators/Layout`) or
    * "zorder". Log-managed bronze clusters within its file log; the
    * rewrite is a fresh committed version either way, readers never see
    * a half-clustered table. */
  def compactClustered(layer: String, name: String, xCol: String, yCol: String,
      numFiles: Int, curve: String = "hilbert"): Unit = {
    import org.apache.spark.sql.functions.col
    def clustered(df: DataFrame): DataFrame = curve match {
      case "hilbert" => graft.operators.Layout.hilbertBy(df, col(xCol), col(yCol),
        partitions = numFiles)
      case "zorder" => graft.operators.Layout.zorderBy(df, col(xCol), col(yCol),
        partitions = numFiles)
      case other => throw new IllegalArgumentException(s"unknown curve $other")
    }
    val base = dir(layer, name)
    readFilesManifest(base) match {
      case Some((v, entries)) =>
        val df = clustered(spark.read
          .parquet(entries.map(e => base.resolve(e.relPath).toString): _*))
        var next = v + 1
        while (Files.exists(base.resolve(s"_a$next"))) next += 1
        val dataDir = base.resolve(s"_a$next")
        df.write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
        commitFilesManifest(base, next,
          ManifestStats.collectStats(df, dataDir.toString,
            (Lakehouse.BronzeStatsCols ++ Seq(xCol, yCol)).distinct, s"_a$next"))
        gcBronze(base, next)
      case None =>
        materialize(layer, name, clustered(table(layer, name)),
          statsCols = Seq(xCol, yCol))
    }
  }

  /** Materialize as a BUCKETED catalog table (`<layer>_<name>`): rows
    * hash-partitioned into `buckets` files on `bucketCols` at write time, so
    * joins/aggregations on those columns skip their shuffle entirely — the
    * co-located-join technique for fact tables repeatedly joined on the same
    * key at scale (bucket both sides the same way once, never shuffle them
    * again). Read back via [[bucketedTable]]; bucket metadata lives in the
    * session catalog. */
  def materializeBucketed(
      layer: String, name: String, df: DataFrame,
      bucketCols: Seq[String], buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", dir(layer, s"${name}__bucketed").toString)
      .saveAsTable(s"${physicalSchema(layer)}_$name")

  def bucketedTable(layer: String, name: String): DataFrame =
    spark.table(s"${physicalSchema(layer)}_$name")

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    }
}

object Lakehouse {

  /** Default file-stats columns for bronze logs: `snapshot_date` (the
    * incremental-refresh prune key — file skipping replaces hive
    * partition pruning) and `run_id` (bounds idempotent re-ingest deletes
    * to the files a run actually touched). */
  val BronzeStatsCols: Seq[String] = Seq("snapshot_date", "run_id")

  /** dbt-style runtime schema indirection (reference `dbt/models/schema.yml:5`
    * + `scripts/dbt_run_gold.py:211` resolve schema names per environment at
    * run time): `GRAFT_SCHEMA_BRONZE` / `GRAFT_SCHEMA_SILVER` /
    * `GRAFT_SCHEMA_GOLD` re-point a logical layer at a different physical
    * schema directory — the dev-sandbox / blue-green pattern — without any
    * code change. `env` is injectable so specs can exercise the parse
    * without mutating the process environment. */
  def envSchemaOverrides(env: String => Option[String] = sys.env.get): Map[String, String] =
    Seq("bronze", "silver", "gold")
      .flatMap(l => env(s"GRAFT_SCHEMA_${l.toUpperCase}").map(l -> _))
      .toMap
}
