package graft.pipeline

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Bronze ingestion: the envelope row builder + idempotent
  * delete-by-run_id-then-append sink (reference
  * `job_tasks/bronze/ingest_data_api_to_bronze.py:91-93,185-200`) and the
  * run-context log (reference `job_tasks/bronze/init_run_context.py`,
  * `job_tasks/ops/finalize_run_log.py`).
  *
  * Payload fetching stays behind [[PayloadSource]] so the real HTTP client
  * (YouTube Data/Analytics APIs, driver-side, paginated) is pluggable while
  * tests inject fixture JSON — the same seam the reference gets from
  * payloads being opaque strings until silver parses them.
  */
object Bronze {

  /** One bronze envelope row (fixed 7-column contract — SURVEY §1.2). */
  final case class Envelope(
      snapshotDate: Date,
      ingestTsUtc: Timestamp,
      sourceSystem: String,
      requestId: String,
      schemaVersion: String,
      runId: String,
      payload: String)

  /** Run context published between tasks
    * (reference `init_run_context.py:75-101`). */
  final case class RunContext(
      runId: String,
      requestId: String,
      snapshotDate: Date,
      ingestTsUtc: Timestamp,
      sourceSystem: String = "youtube",
      schemaVersion: String = "v1")

  /** A source of raw payload JSON per bronze table (fixture or live HTTP). */
  trait PayloadSource {
    /** table name -> payload JSON strings to land this run */
    def payloads(ctx: RunContext): Map[String, Seq[String]]
  }

  def envelopeDf(spark: SparkSession, rows: Seq[Envelope]): DataFrame = {
    val data = rows.map(e => Row(
      e.snapshotDate, e.ingestTsUtc, e.sourceSystem, e.requestId,
      e.schemaVersion, e.runId, e.payload))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, math.min(rows.size, 4))),
      Schemas.bronzeEnvelope)
  }

  /** Land one run's payloads: per table, delete any prior rows of this
    * run_id (idempotent re-run), then append one envelope row per payload. */
  def ingest(lake: Lakehouse, ctx: RunContext, source: PayloadSource): Unit =
    source.payloads(ctx).foreach { case (tableName, payloads) =>
      require(Schemas.bronzeTables.contains(tableName), s"unknown bronze table $tableName")
      lake.deleteByRunId(tableName, ctx.runId)
      val rows = payloads.map(p => Envelope(
        ctx.snapshotDate, ctx.ingestTsUtc, ctx.sourceSystem, ctx.requestId,
        ctx.schemaVersion, ctx.runId, p))
      if (rows.nonEmpty) lake.appendBronze(tableName, envelopeDf(lake.spark, rows))
    }

  /** Append the run-context log row (reference `init_run_context.py:143-158`);
    * finalize (status update) is a delete+append of the same run_id row —
    * the parquet emulation of the reference's `UPDATE ... WHERE run_id`
    * (`finalize_run_log.py:191-202`). */
  def logRunStart(lake: Lakehouse, ctx: RunContext, contextJson: String): Unit = {
    import lake.spark.implicits._
    val df = Seq(
      (ctx.runId, ctx.requestId, ctx.snapshotDate, ctx.ingestTsUtc, ctx.sourceSystem,
        ctx.schemaVersion, contextJson, null.asInstanceOf[String],
        null.asInstanceOf[Timestamp]))
      .toDF("run_id", "request_id", "snapshot_date", "ingest_ts_utc", "source_system",
        "schema_version", "context_json", "run_status", "finalized_ts_utc")
    lake.appendBronze("run_context_log", df)
  }

  def finalizeRun(lake: Lakehouse, runId: String, status: String, finalizedTs: Timestamp): Unit = {
    require(Set("success", "failed", "cancelled", "unknown").contains(status))
    import org.apache.spark.sql.functions._
    val updated = lake.table("bronze", "run_context_log")
      .filter(col("run_id") === runId)
      .withColumn("run_status", lit(status))
      .withColumn("finalized_ts_utc", lit(finalizedTs))
      // a run recovering from an interrupted finalize has 2 rows; they
      // differ only in the columns just overwritten, so this collapses them
      .dropDuplicates()
    val updatedRows = updated.collect() // tiny: one row per run
    if (updatedRows.nonEmpty) {
      // Append the superseding row BEFORE dropping the stale one: a crash
      // mid-finalize then leaves a recoverable duplicate (readers take the
      // row latest by finalize-else-ingest time — Checks.latestRunSuccess),
      // never a vanished run record. The delete keeps exactly the rows at
      // this finalize's timestamp, so re-finalizing converges to one row.
      lake.appendBronze("run_context_log",
        lake.spark.createDataFrame(
          lake.spark.sparkContext.parallelize(updatedRows.toSeq, 1), updated.schema))
      lake.deleteBronzeWhere("run_context_log",
        col("run_id") === runId &&
          (col("finalized_ts_utc").isNull || col("finalized_ts_utc") =!= lit(finalizedTs)),
        Seq(ManifestStats.StatEq("run_id", runId)))
    }
  }
}
