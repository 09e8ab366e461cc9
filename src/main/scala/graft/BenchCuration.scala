package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.pipeline.{CurationJob, Lakehouse}
import org.apache.spark.sql.functions._

/** Curation-pipeline benchmark: full day-0 funnel vs an incremental day-N
  * batch against the standing layer, on SPARK_GRAFT_SF_DIR's documents.
  * Prints one JSON line. The claim under test: incremental cost tracks the
  * BATCH, not the corpus — at 100 TB that is the difference between a
  * nightly job and an impossibility (the standing corpus contributes one
  * fingerprint scan + one band-posting side of an equi-join, both linear
  * passes with no self-pairing).
  */
object BenchCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session(appName = "graft-bench-curation")
    val docs = Graft.table(spark, sfDir, "documents")
    val weights = Seq("en" -> 1.0, "de" -> 0.75, "es" -> 0.5, "fr" -> 0.5, "zh" -> 0.25)
    val lake = new Lakehouse(spark, Files.createTempDirectory("graft-bench-cur").toString)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // day-0 bootstrap over the whole corpus
    val (boot, fullSec) = timed {
      CurationJob.run(lake, docs, weights,
        now = Timestamp.valueOf("2026-01-01 00:00:00"), runId = "bench-boot")
    }
    require(boot.status == "success", s"bootstrap failed: ${boot.error}")

    // day-N batch: 50 docs — half fresh (re-keyed + suffixed so they are
    // genuinely new), half verbatim copies of curated docs (must all drop)
    val base = docs.orderBy(col("doc_id")).limit(50).collect()
    import spark.implicits._
    val batch = base.zipWithIndex.map { case (r, i) =>
      val fresh = i % 2 == 0
      val txt = if (fresh) r.getAs[String]("text") + s" incremental marker token$i" * 3
        else r.getAs[String]("text")
      (1000000L + i, txt, r.getAs[String]("lang"), r.getAs[String]("source"),
        txt.length.toLong)
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")

    val (inc, incSec) = timed {
      CurationJob.runIncremental(lake, batch, weights,
        now = Timestamp.valueOf("2026-01-02 00:00:00"), runId = "bench-inc")
    }
    require(inc.status == "success", s"incremental failed: ${inc.error}")

    println(s"""{"metric":"curation","full_sec":$fullSec,"incremental_sec":$incSec,""" +
      s""""corpus_docs":${docs.count()},"batch_docs":50,""" +
      s""""incremental_survivors":${inc.funnel.last._2},"sf":"$sfDir"}""")
    spark.stop()
  }
}
