package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationJobSpec extends SparkSpec {

  private lazy val lake = new Lakehouse(spark, Files.createTempDirectory("graft-cur").toString)
  private lazy val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")

  private val weights = Seq("en" -> 1.0, "de" -> 0.75, "es" -> 0.5, "fr" -> 0.5, "zh" -> 0.25)
  private def ts(s: String) = Timestamp.valueOf(s)

  test("curation run materializes a monotone funnel and a consistent curated layer") {
    val report = CurationJob.run(lake, docs, weights,
      now = ts("2025-06-01 10:00:00"), runId = "cur1")
    assert(report.status == "success", report.toString)
    assert(report.funnel.map(_._1) ==
      Seq("raw", "exact_dedup", "neardup_clusters", "quality_filter", "weighted_mix"))
    val counts = report.funnel.map(_._2)
    assert(counts.head == docs.count())
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a }, counts.toString)
    assert(counts.last > 0)

    // curated_documents matches the final funnel stage; packs cover exactly
    // the survivors, one row each
    val curated = lake.table("curated", "curated_documents")
    assert(curated.count() == counts.last)
    val packs = lake.table("curated", "curation_packs")
    assert(packs.count() == counts.last)
    assert(packs.join(curated, Seq("doc_id"), "left_anti").isEmpty)

    // run lifecycle: logged + finalized success → smoke checks on the run log pass
    assert(Checks.latestRunSuccess.run(lake).isEmpty)
  }

  test("a failing stage marks the run failed and still finalizes the run log") {
    val failLake = new Lakehouse(spark, Files.createTempDirectory("graft-curfail").toString)
    // corpus without the `lang` column the weighted mix strata need
    val broken = docs.drop("lang")
    val report = CurationJob.run(failLake, broken, weights,
      now = ts("2025-06-03 10:00:00"), runId = "curX")
    assert(report.status == "failed")
    assert(report.error.isDefined)
    // ALL_DONE semantics: the run log row records the failure
    val bad = Checks.latestRunSuccess.run(failLake).collect().map(_.getString(0))
    assert(bad.toSeq == Seq("failed"))
  }

  test("re-run is idempotent: identical curated subset, fresh funnel stamp") {
    val before = lake.table("curated", "curated_documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val report = CurationJob.run(lake, docs, weights,
      now = ts("2025-06-02 10:00:00"), runId = "cur2")
    assert(report.status == "success")
    val after = lake.table("curated", "curated_documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before, "hash-keyed sampling must make re-runs identical")
    val stamped = lake.table("curated", "curation_funnel_stats")
      .select("run_id").distinct().collect().map(_.getString(0))
    assert(stamped.toSeq == Seq("cur2"))
  }
}
