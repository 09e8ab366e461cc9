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

  test("corrupt JSON records: PERMISSIVE captures them in a column, FAILFAST throws") {
    // real ingestion concern: one bad line must not silently vanish rows
    // (PERMISSIVE default) and must be loud when the pipeline asks for it
    val tmp = java.nio.file.Files.createTempDirectory("graft_corrupt_").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "data.json"),
      """{"doc_id": 1, "text": "ok"}
        |{"doc_id": 2 "text": "missing comma"}
        |{"doc_id": 3, "text": "also ok"}
        |""".stripMargin)
    val schema = "doc_id BIGINT, text STRING, _corrupt_record STRING"
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(tmp)
    // cache first: Spark refuses filtering on only the corrupt column of a
    // raw scan (internal-row pushdown limitation) — the documented pattern
    permissive.cache()
    try {
      assert(permissive.count() == 3, "no row may vanish under PERMISSIVE")
      val bad = permissive.filter(col("_corrupt_record").isNotNull).collect()
      assert(bad.length == 1 && bad(0).getAs[String]("_corrupt_record").contains("missing comma"))
      val good = permissive.filter(col("_corrupt_record").isNull)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(good == Seq(1L, 3L))
    } finally permissive.unpersist()
    val failfast = spark.read.schema("doc_id BIGINT, text STRING")
      .option("mode", "FAILFAST").json(tmp)
    val err = intercept[org.apache.spark.SparkException] { failfast.collect() }
    assert(err.getMessage.toLowerCase.contains("malformed") ||
      Option(err.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  // ── DataSourceV2 REST source (partition-per-chunk parallel ingest) ───────

  import graft.pipeline.DataApiIngest
  import graft.pipeline.Json._

  /** Thread-safe echo client: answers a videos request with one item per
    * requested id (parallel tasks call it concurrently). */
  private object EchoVideosClient extends DataApiIngest.DataApiClient {
    def getJson(path: String, params: Map[String, String]): JObj = {
      assert(path == "videos", s"unexpected path $path")
      assert(params("part") == "id,snippet,contentDetails,statistics,status,topicDetails")
      JObj.of("items" -> JArr(params("id").split(",").toSeq.map(id =>
        JObj.of("id" -> JStr(id), "snippet" -> JObj.of("title" -> JStr(s"title of $id"))))))
    }
  }

  test("V2 REST source plans one partition per 50-id chunk and lands every item with provenance") {
    val ids = (1 to 120).map(i => f"v$i%03d")
    val key = RestClientRegistry.register(() => EchoVideosClient)
    try {
      val df = spark.read.format("graft.sources.RestVideosSource")
        .option("clientKey", key)
        .option("videoIds", ids.mkString(","))
        .option("chunkSize", "50")
        .load()
      assert(df.rdd.getNumPartitions == 3, "one input partition per chunk (50+50+20)")
      val rows = df.orderBy("chunk_idx", "item_idx").collect()
      assert(rows.length == 120)
      // chunk provenance matches the sequential walk's grouping
      assert(rows.map(_.getInt(0)).toSeq == ids.indices.map(_ / 50))
      // items arrive in request order within each chunk
      val roundTripped = rows.map(r => r.getString(2)).toSeq
      assert(roundTripped.zip(ids).forall { case (json, id) => json.contains(s""""id":"$id"""") })
    } finally RestClientRegistry.unregister(key)
  }

  test("V2 parallel fetch reproduces the sequential envelope byte-for-byte") {
    val ids = (1 to 120).map(i => f"v$i%03d")
    val sequential = DataApiIngest.fetchVideosByIds(EchoVideosClient, ids).render
    val parallel = DataApiIngest.fetchVideosByIdsParallel(spark, () => EchoVideosClient, ids)
    assert(parallel == sequential)
    // the empty-id edge produces the same (empty) envelope on both paths
    assert(DataApiIngest.fetchVideosByIdsParallel(spark, () => EchoVideosClient, Seq.empty)
      == DataApiIngest.fetchVideosByIds(EchoVideosClient, Seq.empty).render)
  }

  test("V2 source fails fast on a missing client registration") {
    val df = spark.read.format("graft.sources.RestVideosSource")
      .option("clientKey", "no-such-key")
      .option("videoIds", "a,b")
      .load()
    val e = intercept[Exception] { df.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("no DataApiClient factory")))
  }
}
