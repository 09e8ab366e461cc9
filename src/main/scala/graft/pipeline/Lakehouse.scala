package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Path-backed three-layer medallion catalog: `bronze` / `silver` / `gold`
  * namespaces, one parquet directory per table under `root`.
  *
  * Plays the role Unity Catalog + Delta play for the reference
  * (`lakeflow/bootstrap_unity_catalog.sql`): bronze tables are
  * snapshot_date-partitioned append-only parquet; "DELETE WHERE run_id"
  * (the reference's idempotent re-run primitive, Delta DML at
  * `ingest_data_api_to_bronze.py:91-93`) is emulated with
  * rewrite-filter-swap, which is exactly what a copy-on-write table format
  * does under the hood — at cluster scale this slot is filled by Delta (a
  * one-line `format("delta")` swap); the engine semantics above it are
  * identical.
  *
  * Partitioning posture for 100 TB: bronze partitioned by `snapshot_date`
  * so silver refreshes prune to the snapshots they need; silver/gold are
  * full-refresh materializations (the reference's `CREATE OR REFRESH
  * MATERIALIZED VIEW` semantics — recompute is the correctness baseline,
  * incremental refresh an optimization on top).
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
  * of losing updates. Remaining divergence from Delta (README "Known
  * divergence"): bronze appends/deletes are directory-based, not logged.
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

  def table(layer: String, name: String): DataFrame =
    spark.read.parquet(currentDataDir(layer, name).toString)

  /** Committed version number of a materialized table (0 = plain layout /
    * never materialized under the manifest protocol). */
  def tableVersion(layer: String, name: String): Int = currentVersion(dir(layer, name))

  /** Versions still on disk, ascending. Retention is bounded: [[materialize]]
    * GCs all but the committed version and its immediate predecessor, so
    * this is at most two entries — enough for "what did the last refresh
    * change" diffs without Delta's unbounded log. */
  def tableVersions(layer: String, name: String): Seq[Int] = {
    val base = dir(layer, name)
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
    spark.read.parquet(dir(layer, name).resolve(s"_v$version").toString)
  }

  /** Append rows (bronze ingest; partitioned by snapshot_date). */
  def appendBronze(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).partitionBy("snapshot_date")
      .parquet(dir("bronze", name).toString)

  /** Idempotent re-run delete: drop all rows of `run_id` before re-append. */
  def deleteByRunId(name: String, runId: String): Unit =
    deleteBronzeWhere(name, org.apache.spark.sql.functions.col("run_id").equalTo(runId))

  /** Predicate delete — "DELETE WHERE <condition>" over a bronze table.
    * Copy-on-write: materialize the retained rows next to the live dir, then
    * swap — the live table is never half-written. Rows where `condition` is
    * null are treated as matching (dropped), the DML convention the run-id
    * variant above has always had. */
  def deleteBronzeWhere(name: String, condition: org.apache.spark.sql.Column): Unit = {
    val live = dir("bronze", name)
    if (Files.exists(live)) {
      val tmp = Paths.get(root, physicalSchema("bronze"), s".${name}__rewrite")
      deleteRecursively(tmp)
      val retained = spark.read.parquet(live.toString)
        .filter(!condition)
      if (retained.isEmpty) {
        // a partitioned write of zero rows yields a directory with no data
        // files — unreadable later; write one empty unpartitioned file so the
        // schema survives (snapshot_date becomes a plain column, same schema)
        retained.repartition(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      } else {
        retained.write.mode(SaveMode.Overwrite).partitionBy("snapshot_date")
          .parquet(tmp.toString)
      }
      deleteRecursively(live)
      Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    }
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
  def materialize(layer: String, name: String, df: DataFrame): Unit = {
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
    writeVersion(base, next, df)
    publishIfMonotonic(base, next)
    gcVersions(base)
  }

  /** Write the immutable `_v{next}` data directory and its manifest tmp.
    * No commit happens here — the previous version stays live. */
  private def writeVersion(base: Path, next: Int, df: DataFrame): Unit = {
    val dataDir = base.resolve(s"_v$next")
    deleteRecursively(dataDir) // debris from a crashed earlier attempt
    df.write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
    val live = Files.list(dataDir).toArray.map(_.asInstanceOf[Path].getFileName.toString)
      .filter(_.endsWith(".parquet")).sorted
    val tmp = base.resolve(s".$ManifestName.$next.tmp")
    Files.write(tmp, (next.toString +: live).mkString("\n")
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
    * table's files at a target partition count. */
  def compact(layer: String, name: String, numFiles: Int = 1): Unit =
    materialize(layer, name, table(layer, name).repartition(numFiles))

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
