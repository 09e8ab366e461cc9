package graft.sql

import graft.{Graft, SparkSpec}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The native codegen expression must be value-identical to the
  * higher-order-function composition it replaces (which is what the DuckDB
  * oracles restate). */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edgeCases = Seq(
    "", "a", "ab", "abcd", "abcde", "abcdef",
    "the quick brown fox", "  spaces  and\ttabs ",
    "unicodé çhars ünd émojis", "ASCII only 0123456789",
    "ππππππ greek", "日本語のテキスト").toDF("text")

  test("native expression matches the HOF specification on edge cases") {
    val cmp = edgeCases.select(
      Dedup.shingleHashes(col("text")).as("native"),
      Dedup.shingleHashesPortableHof(col("text")).as("hof"))
    cmp.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("native expression matches the HOF specification on the fixture corpus") {
    val docs = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
      Dedup.shingleHashes(col("text")).as("native"),
      Dedup.shingleHashesPortableHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty)
  }

  test("native minhash signature matches the HOF specification on the fixture corpus") {
    val docs = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val hset = array_distinct(Dedup.shingleHashes(col("text")))
    val diff = docs.select(
      Dedup.minhashSignature(hset).as("native"),
      Dedup.minhashSignatureHof(hset).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty)
  }

  test("fused band keys match bandKeys∘minhashSignature (HOF) on the fixture corpus") {
    val docs = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val hset = array_distinct(Dedup.shingleHashes(col("text")))
    val diff = docs.select(
      Dedup.minhashBandKeys(hset).as("native"),
      Dedup.bandKeys(Dedup.minhashSignatureHof(hset)).as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(diff.isEmpty)
  }

  test("float-vector dot null-poisons on null elements like the HOF fold") {
    import graft.operators.Similarity
    val df = spark.sql("""
      SELECT array(CAST(NULL AS FLOAT), CAST(2.0 AS FLOAT)) AS a,
             array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS b""")
    val r = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1)) // both null — not 8.0
  }

  test("native float-vector dot matches the HOF fold bit-for-bit") {
    import graft.operators.Similarity
    val e = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(e.limit(3).select(col("embedding").as("b")))
    val diff = pairs.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof")) // bit-exact: same fold order
    assert(diff.isEmpty)
  }

  test("fused subspace distance matches the slice+dot composition bit-for-bit") {
    import graft.operators.Similarity
    def fused(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
        m: Int, subDim: Int) =
      org.apache.spark.sql.graft.ColumnShim.column(
        FloatSubDist2(
          org.apache.spark.sql.graft.ColumnShim.expression(a),
          org.apache.spark.sql.graft.ColumnShim.expression(b), m, subDim))
    def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
        m: Int, subDim: Int) =
      graft.operators.Clustering.subDist2Composed(a, b, m, subDim)
    val e = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = e.select(col("embedding").as("a"))
      .crossJoin(e.limit(5).select(col("embedding").as("b")))
    (0 until 16).foreach { m =>
      val diff = pairs.select(
        fused(col("a"), col("b"), m, 4).as("fast"),
        composed(col("a"), col("b"), m, 4).as("ref"))
        .filter(col("fast") =!= col("ref")) // bit-exact: identical fold order
      assert(diff.isEmpty, s"subspace $m diverged")
    }
    // null-poisoning parity: a null INSIDE the slice nulls both, a null
    // OUTSIDE it affects neither; a slice past the end is 0.0 on both
    val edge = spark.sql("""
      SELECT array(CAST(NULL AS FLOAT), CAST(2.0 AS FLOAT),
                   CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS a,
             array(CAST(5.0 AS FLOAT), CAST(6.0 AS FLOAT),
                   CAST(7.0 AS FLOAT), CAST(8.0 AS FLOAT)) AS b""")
    val r = edge.select(
      fused(col("a"), col("b"), 0, 2).as("f0"),
      composed(col("a"), col("b"), 0, 2).as("c0"),
      fused(col("a"), col("b"), 1, 2).as("f1"),
      composed(col("a"), col("b"), 1, 2).as("c1"),
      fused(col("a"), col("b"), 7, 2).as("f7"),
      composed(col("a"), col("b"), 7, 2).as("c7")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1)) // null in slice 0
    assert(!r.isNullAt(2) && r.getDouble(2) == r.getDouble(3)) // slice 1 clean
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0) // past the end
    // mismatched effective lengths null both
    val mm = spark.sql("""
      SELECT array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)) AS a,
             array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT)) AS b""")
    val r2 = mm.select(
      fused(col("a"), col("b"), 1, 2).as("f"),
      composed(col("a"), col("b"), 1, 2).as("c")).collect().head
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  test("native subspace dot matches the slice+dot composition bit-for-bit") {
    def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
        m: Int, subDim: Int) =
      graft.operators.Clustering.subDotNative(a, b, m, subDim)
    def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
        m: Int, subDim: Int) =
      graft.operators.Clustering.subDotComposed(a, b, m, subDim)
    val e = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = e.select(col("embedding").as("a"))
      .crossJoin(e.limit(5).select(col("embedding").as("b")))
    (0 until 16).foreach { m =>
      val diff = pairs.select(
        native(col("a"), col("b"), m, 4).as("fast"),
        composed(col("a"), col("b"), m, 4).as("ref"))
        .filter(col("fast") =!= col("ref")) // bit-exact: identical fold order
      assert(diff.isEmpty, s"subspace $m diverged")
    }
    // null-poisoning / slice-edge parity, same matrix as FloatSubDist2's
    val edge = spark.sql("""
      SELECT array(CAST(NULL AS FLOAT), CAST(2.0 AS FLOAT),
                   CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS a,
             array(CAST(5.0 AS FLOAT), CAST(6.0 AS FLOAT),
                   CAST(7.0 AS FLOAT), CAST(8.0 AS FLOAT)) AS b""")
    val r = edge.select(
      native(col("a"), col("b"), 0, 2).as("f0"),
      composed(col("a"), col("b"), 0, 2).as("c0"),
      native(col("a"), col("b"), 1, 2).as("f1"),
      composed(col("a"), col("b"), 1, 2).as("c1"),
      native(col("a"), col("b"), 7, 2).as("f7"),
      composed(col("a"), col("b"), 7, 2).as("c7")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1)) // null in slice 0
    assert(!r.isNullAt(2) && r.getDouble(2) == r.getDouble(3)) // slice 1 clean
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0) // past the end
    val mm = spark.sql("""
      SELECT array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)) AS a,
             array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT)) AS b""")
    val r2 = mm.select(
      native(col("a"), col("b"), 1, 2).as("f"),
      composed(col("a"), col("b"), 1, 2).as("c")).collect().head
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  test("sorted intersect size equals size(array_intersect) on sorted distinct arrays") {
    val sets = Graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select(array_sort(array_distinct(Dedup.shingleHashes(col("text")))).as("hset"))
    val pairs = sets.select(col("hset").as("a")).crossJoin(sets.limit(5).select(col("hset").as("b")))
    def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.ColumnShim.column(
        SortedIntersectSize(
          org.apache.spark.sql.graft.ColumnShim.expression(a),
          org.apache.spark.sql.graft.ColumnShim.expression(b)))
    val diff = pairs.select(
      native(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.isEmpty)
  }

  test("sentence-split generator: trims, drops empties, 1-based index, null-safe") {
    import spark.implicits._
    val df = Seq(
      (1L, "One. Two!  Three?"),
      (2L, "no terminator at all"),
      (3L, "...!?"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val out = df.select(col("id"),
        org.apache.spark.sql.graft.ColumnShim.column(
          SentenceSplit(org.apache.spark.sql.graft.ColumnShim.expression(col("text")))))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 1, "One"), (1L, 2, "Two"), (1L, 3, "Three"),
      (2L, 1, "no terminator at all")))
  }

  test("token counts map equals the relational explode-groupBy counts") {
    import graft.operators.TextAnalysis
    val docs = Graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), lower(col("text")).as("text"))
    def tokenCounts(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.ColumnShim.column(
        TokenCounts(org.apache.spark.sql.graft.ColumnShim.expression(c)))
    val native = docs
      .select(col("doc_id"), explode(tokenCounts(TextAnalysis.tokens(col("text")))).as(Seq("term", "tf")))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val relational = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(native == relational)
    // edge cases: empty + whitespace-only text produce empty maps
    import spark.implicits._
    val edge = Seq("", "   ", "a a a").toDF("text")
      .select(tokenCounts(TextAnalysis.tokens(col("text"))).as("m"))
      .collect().map(_.getMap[String, Long](0))
    assert(edge(0).isEmpty && edge(1).isEmpty)
    assert(edge(2) == Map("a" -> 3L))
  }

  test("registered as a SQL function via GraftExtensions") {
    val r = spark.sql("SELECT shingle_hashes('abcdef') AS h, shingle_hashes('abcdef', 3) AS h3")
      .collect().head
    assert(r.getSeq[Long](0).length == 2) // 6 chars, n=5 -> 2 windows
    assert(r.getSeq[Long](1).length == 4) // n=3 -> 4 windows
  }

  test("the whole native family is callable from SQL text") {
    val r = spark.sql("""
      SELECT minhash_signature(shingle_hashes('the quick brown fox')) AS sig,
             minhash_band_keys(shingle_hashes('the quick brown fox')) AS bands,
             simhash_from_tokens(array('the', 'quick', 'fox')) AS sh,
             token_counts(array('a', 'b', 'a')) AS tc,
             float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                           array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
             sorted_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS isz
    """).collect().head
    assert(r.getSeq[Long](0).length == 24)
    assert(r.getSeq[Long](1).length == 6) // 24 sig rows / 4 per band
    assert(r.getLong(2) != 0L)
    assert(r.getMap[String, Long](3) == Map("a" -> 2L, "b" -> 1L))
    assert(r.getDouble(4) == 11.0)
    assert(r.getInt(5) == 2)
    val sentences = spark.sql(
      "SELECT sentence_split('One. Two!') AS (sentence_idx, sentence) FROM range(1)")
    assert(sentences.collect().map(_.getString(1)).toSeq == Seq("One", "Two"))
    val cdc = spark.sql(
      "SELECT cdc_chunk_hashes('abcdef'), cdc_chunk_hashes('abcdef', 4, 8)").collect().head
    assert(cdc.getSeq[Long](0).nonEmpty && cdc.getSeq[Long](1).nonEmpty)
    val hls = spark.sql("""
      SELECT hashed_linear_score(array('a', 'b', 'a')) AS s,
             hashed_linear_score(array('a', 'b', 'a'), 64) AS sd,
             hashed_linear_score(array('a'), 64) + hashed_linear_score(array('b', 'a'), 64) AS sum64
    """).collect().head
    assert(hls.getLong(0) != 0L)
    assert(hls.getLong(1) == hls.getLong(2)) // additive over bags at any dim
    // the aggregate registrations: MG heavy hitters + the bloom pair
    val agg = spark.sql("""
      SELECT misra_gries(v, 2) AS mg,
             might_contain((SELECT bloom_filter_agg(xxhash64(v), 10L, 80L)
                            FROM VALUES ('a'),('b'),('a') AS t(v)),
                           xxhash64('a')) AS hit,
             might_contain((SELECT bloom_filter_agg(xxhash64(v), 10L, 80L)
                            FROM VALUES ('a'),('b'),('a') AS t(v)),
                           xxhash64('zzzz')) AS miss
      FROM VALUES ('a'),('b'),('a') AS t(v)
    """).collect().head
    assert(agg.getMap[String, Long](0) == Map("a" -> 2L, "b" -> 1L))
    assert(agg.getBoolean(1))
    assert(!agg.getBoolean(2)) // 80 bits for 2 items: miss fp-rate ~ 0
  }

  test("expression participates in whole-stage codegen (no CodegenFallback)") {
    val docs = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val df = docs.select(Dedup.shingleHashes(col("text")).as("h"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan)
  }
}
