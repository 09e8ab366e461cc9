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
  */
final class Lakehouse(val spark: SparkSession, val root: String,
    schemaOverrides: Map[String, String] = Lakehouse.envSchemaOverrides()) {

  /** Logical → physical schema name (dbt-style indirection; identity unless
    * overridden via constructor or `GRAFT_SCHEMA_*` env vars). */
  def physicalSchema(layer: String): String = schemaOverrides.getOrElse(layer, layer)

  private def dir(layer: String, name: String): Path =
    Paths.get(root, physicalSchema(layer), name)

  def exists(layer: String, name: String): Boolean = Files.exists(dir(layer, name))

  def table(layer: String, name: String): DataFrame =
    spark.read.parquet(dir(layer, name).toString)

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

  /** Materialize one silver/gold model (MV refresh = full recompute). */
  def materialize(layer: String, name: String, df: DataFrame): Unit = {
    // write-then-swap so a refresh never reads its own half-written output
    val tmp = Paths.get(root, physicalSchema(layer), s".${name}__refresh")
    deleteRecursively(tmp)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val live = dir(layer, name)
    deleteRecursively(live)
    Files.createDirectories(live.getParent)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
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
