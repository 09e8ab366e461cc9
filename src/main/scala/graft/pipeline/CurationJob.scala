package graft.pipeline

import java.sql.{Date, Timestamp}
import java.util.UUID

import graft.operators.{Curation, Dedup, TextAnalysis}
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
      val toks = TextAnalysis.tokens(col("text"))

      val keepers = docs
        .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val s1 = docs.join(keepers, Seq("doc_id"), "left_semi")

      val nonCanonical = Curation.connectedComponents(
          Dedup.lshNearDupPairs(docs, "doc_id", "text", minJaccard))
        .filter(col("member_id") =!= col("cluster_id"))
        .select(col("member_id").as("doc_id"))
      val s2 = s1.join(nonCanonical, Seq("doc_id"), "left_anti")

      val s3 = s2.filter(
        round(TextAnalysis.distinctTokenFrac(toks), 6) >= qualityMinDistinctFrac &&
          round(TextAnalysis.topBigramFrac(toks), 6) <= qualityMaxTopBigramFrac)

      val s4 = Curation.weightedMix(s3, "lang", "doc_id", weights)

      lake.materialize("curated", "curated_documents", s4)

      val survivors = lake.table("curated", "curated_documents")
      lake.materialize("curated", "curation_packs",
        Curation.packSequences(survivors, "doc_id",
            TextAnalysis.tokenCount(col("text")).cast("bigint"), packBudget, packShards)
          .select(col("doc_id"), col("shard").cast("bigint").as("shard"), col("bin"),
            col("doc_tokens")))

      def stage(idx: Int, name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("docs"),
            coalesce(sum(TextAnalysis.tokenCount(col("text")).cast("bigint")), lit(0L)).as("tokens"))
          .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
            col("docs"), col("tokens"))

      val stats = stage(0, "raw", docs)
        .unionAll(stage(1, "exact_dedup", s1))
        .unionAll(stage(2, "neardup_clusters", s2))
        .unionAll(stage(3, "quality_filter", s3))
        .unionAll(stage(4, "weighted_mix", survivors))
        .withColumn("run_id", lit(runId))
        .withColumn("snapshot_date", lit(snapshot))
      lake.materialize("curated", "curation_funnel_stats", stats)

      funnel = lake.table("curated", "curation_funnel_stats")
        .orderBy(col("stage_idx")).collect()
        .map(r => (r.getAs[String]("stage"), r.getAs[Long]("docs"), r.getAs[Long]("tokens")))
        .toSeq

      // funnel sanity is a run gate: counts must be monotone non-increasing
      val counts = funnel.map(_._2)
      if (counts.isEmpty || counts.zip(counts.tail).exists { case (a, b) => b > a })
        throw new IllegalStateException(s"non-monotone funnel: $funnel")
    } catch {
      case t: Throwable =>
        status = "failed"
        failure = Some(t)
    }

    Bronze.finalizeRun(lake, runId, status, new Timestamp(System.currentTimeMillis()))
    CurationReport(runId, status, funnel, failure)
  }
}
