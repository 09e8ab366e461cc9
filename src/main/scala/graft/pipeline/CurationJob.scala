package graft.pipeline

import java.sql.{Date, Timestamp}
import java.util.UUID

import graft.operators.{Curation, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The curation counterpart of [[Job]]: one orchestrated run that takes a
  * raw document corpus through the full funnel — exact dedup → near-dup
  * cluster drop → repetition quality gate → weighted language mix — and
  * materializes a `curated` layer next to bronze/silver/gold:
  *
  *   - `curated.curated_documents` — the surviving corpus subset;
  *   - `curated.curation_packs`   — (doc → shard/bin) token-budget packing
  *                                  assignments for the survivors;
  *   - `curated.curation_funnel_stats` — per-stage doc/token attrition,
  *                                  stamped with the run_id.
  *
  * Run lifecycle reuses the lakehouse run log (logRunStart → finalizeRun,
  * `run_if: ALL_DONE` semantics), so the post-deploy smoke checks govern
  * curation runs exactly like ingest runs. Every sampling decision is a
  * pure hash of doc_id (Curation.scala), so a re-run — or a run on a
  * differently-partitioned cluster — materializes the identical subset;
  * the spec pins re-run idempotence.
  */
object CurationJob {

  final case class CurationReport(
      runId: String,
      status: String,
      /** (stage, docs, tokens) in funnel order. */
      funnel: Seq[(String, Long, Long)],
      error: Option[Throwable])

  def run(
      lake: Lakehouse,
      docs: DataFrame,
      weights: Seq[(String, Double)],
      minJaccard: Double = 0.5,
      qualityMinDistinctFrac: Double = 0.35,
      qualityMaxTopBigramFrac: Double = 0.12,
      packBudget: Int = 512,
      packShards: Int = 8,
      now: Timestamp = new Timestamp(System.currentTimeMillis()),
      runId: String = UUID.randomUUID().toString): CurationReport = {

    val snapshot = Date.valueOf(now.toLocalDateTime.toLocalDate)
    val ctx = Bronze.RunContext(runId, UUID.randomUUID().toString, snapshot, now)
    Bronze.logRunStart(lake, ctx,
      s"""{"mode":"curation","min_jaccard":$minJaccard,"pack_budget":$packBudget}""")

    var status = "success"
    var failure: Option[Throwable] = None
    var funnel: Seq[(String, Long, Long)] = Seq.empty
    try {
      val stages = Curation.curationFunnel(docs, weights, minJaccard,
        qualityMinDistinctFrac, qualityMaxTopBigramFrac)

      // Two actions read the funnel (the survivor materialization and the
      // stats write); persisting the intermediate stages keeps the
      // exact-dedup shuffle, the LSH pipeline, and the per-row quality
      // metrics at ONE execution each instead of once per consumer.
      val cached = stages.tail.map { case (n, df) => n -> df.persist() }
      try {
        lake.materialize("curated", "curated_documents", cached.last._2)

        val survivors = lake.table("curated", "curated_documents")
        lake.materialize("curated", "curation_packs",
          Curation.packSequences(survivors, "doc_id",
              TextAnalysis.tokenCount(col("text")).cast("bigint"), packBudget, packShards)
            .select(col("doc_id"), col("shard").cast("bigint").as("shard"), col("bin"),
              col("doc_tokens")))

        val stats = Curation.funnelStats(stages.head +: cached)
          .withColumn("run_id", lit(runId))
          .withColumn("snapshot_date", lit(snapshot))
        lake.materialize("curated", "curation_funnel_stats", stats)
      } finally cached.foreach(_._2.unpersist())

      funnel = lake.table("curated", "curation_funnel_stats")
        .orderBy(col("stage_idx")).collect()
        .map(r => (r.getAs[String]("stage"), r.getAs[Long]("docs"), r.getAs[Long]("tokens")))
        .toSeq

      // funnel sanity is a run gate: counts must be monotone non-increasing
      val counts = funnel.map(_._2)
      if (counts.isEmpty || counts.zip(counts.tail).exists { case (a, b) => b > a })
        throw new IllegalStateException(s"non-monotone funnel: $funnel")
    } catch {
      case scala.util.control.NonFatal(t) =>
        status = "failed"
        failure = Some(t)
      case t: Throwable =>
        // Fatal throwables (OOM, thread interruption) must not be converted
        // into a normal-looking failed run record: finalize best-effort with
        // status "unknown" — distinguishable in the log from a clean
        // nonfatal failure — so the run log isn't left dangling, then let
        // the VM see the error. finalizeRun appends the superseding row
        // before deleting the stale one, so even an interrupt mid-finalize
        // cannot lose the record.
        try Bronze.finalizeRun(lake, runId, "unknown",
          new Timestamp(System.currentTimeMillis()))
        catch { case _: Throwable => () }
        throw t
    }

    Bronze.finalizeRun(lake, runId, status, new Timestamp(System.currentTimeMillis()))
    CurationReport(runId, status, funnel, failure)
  }
}
