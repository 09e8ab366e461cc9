package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReportsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.Graft.table(spark, dir, "documents")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("index-derived report equals the c27 query exactly") {
    val fromIndex = Reports.corpusReportFromIndex(Reports.corpusReportIndex(docs))
    val direct = graft.queries.CurationQueries.c27CorpusReport.run(spark, dir)
    assert(fromIndex.columns.toSeq == direct.columns.toSeq)
    assert(rows(fromIndex) == rows(direct))
  }

  test("incremental merge equals a full index rebuild, in any batch order") {
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    val full = Reports.corpusReportIndex(docs)
    val mergedA = Reports.mergeCorpusReportIndex(Reports.corpusReportIndex(half1), half2)
    val mergedB = Reports.mergeCorpusReportIndex(Reports.corpusReportIndex(half2), half1)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      rows(df.orderBy("source", "lang", "fp", "n_tok"))
    assert(sorted(mergedA) == sorted(full))
    assert(sorted(mergedB) == sorted(full))
    // and the derived report is therefore identical too
    assert(rows(Reports.corpusReportFromIndex(mergedA))
      == rows(Reports.corpusReportFromIndex(full)))
  }

  test("index size is bounded by distinct combinations, not corpus size") {
    val idx = Reports.corpusReportIndex(docs)
    val n = docs.count()
    val k = idx.count()
    assert(k <= n)
    // duplicated fingerprints with equal (source, lang, n_tok) must collapse
    val dupDocs = docs.unionByName(docs)
    assert(Reports.corpusReportIndex(dupDocs).count() == k,
      "re-ingesting identical docs must not grow the index")
  }
}
