package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source-format breadth (SURVEY §2.1): the engine's operators are
  * format-agnostic DataFrame transforms — prove the ingest seam reads the
  * same rows from CSV, JSON, and ORC as from the canonical parquet, with
  * explicit schemas (streaming/ingest paths never infer).
  */
class SourcesSpec extends SparkSpec {

  test("csv / json / orc round-trip the documents table bit-for-bit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sources_").toString
    val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val schema = docs.schema

    docs.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    docs.write.mode("overwrite").json(s"$tmp/json")
    docs.write.mode("overwrite").orc(s"$tmp/orc")

    val fromCsv = spark.read.schema(schema).option("header", "true")
      .option("multiLine", "true").option("escape", "\"").csv(s"$tmp/csv")
    val fromJson = spark.read.schema(schema).json(s"$tmp/json")
    val fromOrc = spark.read.schema(schema).orc(s"$tmp/orc")

    val want = docs.orderBy("doc_id").collect().toSeq
    Seq("csv" -> fromCsv, "json" -> fromJson, "orc" -> fromOrc).foreach {
      case (fmt, df) =>
        assert(df.schema == schema, s"$fmt schema drift: ${df.schema}")
        val got = df.orderBy("doc_id").collect().toSeq
        assert(got == want, s"$fmt rows differ (got ${got.size}, want ${want.size})")
    }
  }

  test("a quality query computes identical results over any source format") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sources_q_").toString
    val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    docs.write.mode("overwrite").json(s"$tmp/json")
    val fromJson = spark.read.schema(docs.schema).json(s"$tmp/json")
    def score(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        graft.operators.TextAnalysis.hashedLinearScoreMilli(
          graft.operators.TextAnalysis.tokens(col("text"))).as("s"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(score(fromJson) == score(docs))
  }
}
