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

    // the OPTIMIZE pass ran (reference: optimize_tables every job);
    // nothing is fragmented on run 1, so it must have been all-skip
    assert(report.maintenance.exists(_.status == "ok"), report.maintenance.toString)
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

  test("incremental run appends only genuinely-new survivors; reruns add nothing") {
    import spark.implicits._
    val incLake = new Lakehouse(spark, Files.createTempDirectory("graft-inc").toString)
    val boot = CurationJob.run(incLake, docs, weights,
      now = ts("2025-07-01 10:00:00"), runId = "boot")
    assert(boot.status == "success")
    val curated0 = incLake.table("curated", "curated_documents")
    // eager snapshot: the incremental run swaps the table files underneath
    // this pre-swap DataFrame, so collect everything the test needs NOW
    val ids0 = curated0.select($"doc_id").as[Long].collect().toSet
    val n0 = ids0.size.toLong
    val sample = curated0.orderBy($"doc_id").select($"text", $"lang").head()
    val (curText, curLang) = (sample.getString(0), sample.getString(1))

    def mk(id: Long, text: String, lang: String) =
      (id, text, lang, "batch_src", text.length.toLong)
    val freshA = (1 to 24).map(i => s"freshword$i").mkString(" ")
    val junky = Seq.fill(30)("spam").mkString(" ")
    val batch = Seq(
      mk(10001L, curText, curLang),                 // exact dup of curated → drops (stage 2)
      mk(10002L, curText + " tinysuffix", curLang), // near-dup of curated → drops (stage 4)
      mk(10003L, freshA, "en"),                     // fresh → survives (canonical of 10004)
      mk(10004L, freshA + " extrabit", "en"),       // within-batch near-dup → drops (stage 3)
      mk(10005L, junky, "en")                       // low quality → drops (stage 5)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")

    val inc = CurationJob.runIncremental(incLake, batch, weights,
      now = ts("2025-07-02 10:00:00"), runId = "inc1")
    assert(inc.status == "success", inc.toString)
    assert(inc.funnel.map(_._1) == Seq("raw_batch", "exact_dedup", "exact_vs_curated",
      "neardup_batch", "neardup_vs_curated", "quality_filter", "weighted_mix"))
    assert(inc.funnel.map(_._2) == Seq(5L, 5L, 4L, 3L, 2L, 1L, 1L),
      s"funnel attrition: ${inc.funnel}")

    val curated1 = incLake.table("curated", "curated_documents")
    assert(curated1.count() == n0 + 1)
    val added = curated1.select($"doc_id").as[Long].collect().toSet -- ids0
    assert(added == Set(10003L), s"added $added")
    // packs appended for exactly the new survivor; stats carry both runs
    val packs = incLake.table("curated", "curation_packs")
    assert(packs.filter($"doc_id" === 10003L).count() == 1)
    assert(packs.count() == n0 + 1)
    val runs = incLake.table("curated", "curation_funnel_stats")
      .select("run_id").distinct().as[String].collect().toSet
    assert(runs == Set("boot", "inc1"))

    // rerunning the same batch adds nothing: every doc now dups the layer
    val inc2 = CurationJob.runIncremental(incLake, batch, weights,
      now = ts("2025-07-03 10:00:00"), runId = "inc2")
    assert(inc2.status == "success", inc2.toString)
    assert(incLake.table("curated", "curated_documents").count() == n0 + 1)
    assert(inc2.funnel.last._2 == 0L, inc2.funnel.toString)
    // and the run log finalized cleanly each time
    assert(Checks.latestRunSuccess.run(incLake).isEmpty)
  }

  test("classifier gate adds a funnel stage that filters exactly by score sign") {
    val gateLake = new Lakehouse(spark, Files.createTempDirectory("graft-curgate").toString)
    val report = CurationJob.run(gateLake, docs, weights,
      classifierMinScoreMilli = Some(0L),
      now = ts("2025-06-03 10:00:00"), runId = "curgate1")
    assert(report.status == "success", report.toString)
    assert(report.funnel.map(_._1) == Seq("raw", "exact_dedup", "neardup_clusters",
      "quality_filter", "classifier_gate", "weighted_mix"))
    // gate semantics: survivors of the gate stage are exactly the
    // quality_filter stage minus non-positive classifier scores
    val Seq(qDocs, gDocs) = report.funnel.slice(3, 5).map(_._2)
    assert(gDocs <= qDocs)
    val curated = gateLake.table("curated", "curated_documents")
    val scoreOk = curated.filter(
      graft.operators.TextAnalysis.hashedLinearScoreMilli(
        graft.operators.TextAnalysis.tokens(col("text"))) <= 0L).count()
    assert(scoreOk == 0L, s"$scoreOk curated docs have non-positive scores")
    assert(curated.count() > 0)

    // incremental runs apply the same gate: a positive-scoring new doc
    // appends, and the gated stage appears in the batch funnel
    val batch = spark.createDataFrame(Seq(
      (90001L, "the quick brown fox jumps over the lazy dog near the river bank today", "en", "web", 70L)
    )).toDF("doc_id", "text", "lang", "source", "n_chars")
    val inc = CurationJob.runIncremental(gateLake, batch, weights,
      classifierMinScoreMilli = Some(Long.MinValue), // gate present, passes all
      now = ts("2025-06-04 10:00:00"), runId = "curgate2")
    assert(inc.status == "success", inc.toString)
    assert(inc.funnel.map(_._1).contains("classifier_gate"))
  }
}
