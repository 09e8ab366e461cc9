package graft.operators

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),  // close to 1
    (3L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 1
    (4L, Array(-1.0f, 0.0f, 0.0f))  // opposite of 1
  ).toDF("id", "embedding")

  test("brute-force top-k ranks by cosine, excludes self, breaks ties by id") {
    val res = Similarity.bruteForceTopK(vecs, vecs, 3)
      .filter(col("query_id") === 1L)
      .orderBy(col("rank"))
      .collect()
    assert(res.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L, 4L))
    val cosines = res.map(_.getAs[Double]("cosine"))
    assert(cosines(0) > 0.99 && cosines(1) == 0.0 && cosines(2) == -1.0)
    assert(!res.exists(_.getAs[Long]("neighbor_id") == 1L))
  }

  test("LSH only scores candidates within probe distance of a shared table bucket") {
    // 64-dim real fixture: every result pair must collide in ≥1 hash table
    // at Hamming distance ≤ 1 (the probe radius) — i.e. the candidate set
    // really is bucket-restricted, not a disguised cross product
    val e = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.filter(col("id") % 100 === 0)
    val keys = e.select(col("id"), Similarity.tableKeys(col("embedding")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val res = Similarity.lshTopK(q, e, 5).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val qk = keys(r.getAs[Long]("query_id"))
      val ck = keys(r.getAs[Long]("neighbor_id"))
      val collides = qk.zip(ck).exists { case (a, b) =>
        java.lang.Long.bitCount(a ^ b) <= 1
      }
      assert(collides, s"pair ${r.mkString(",")} shares no probed bucket")
    }
  }

  test("LSH results agree with brute force on shared candidates") {
    val e = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.filter(col("id") % 100 === 0)
    val brute = Similarity.bruteForceTopK(q, e, 1000)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Double]("cosine")).toMap
    val lsh = Similarity.lshTopK(q, e, 5).collect()
    lsh.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(math.abs(brute(key) - r.getAs[Double]("cosine")) < 1e-12)
    }
  }

  test("bounded top-k aggregate equals the window top-k row for row") {
    val e = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.filter(col("id") % 100 === 0)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val window = collect(Similarity.bruteForceTopKWindow(q, e, 5))
    val agg = collect(Similarity.bruteForceTopK(q, e, 5))
    assert(agg == window)
  }

  test("LSH ANN recall@5 vs exact top-5 meets the floor") {
    // Recall lever at fixed recall shortfall: more sign planes → smaller
    // buckets → fewer candidates but lower recall; multi-probe (flip one
    // plane bit per probe) or multiple plane tables raise recall without
    // growing any single bucket — the standard production levers.
    val e = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.filter(col("id") % 50 === 0)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("rank") <= 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.bruteForceTopK(q, e, 5))
    val ann = hits(Similarity.lshTopK(q, e, 5))
    val recall = (ann & exact).size.toDouble / exact.size
    info(f"ANN recall@5 = $recall%.3f (${(ann & exact).size}/${exact.size})")
    assert(recall >= 0.6, f"recall@5 $recall%.3f below 0.6 floor")
  }

  test("signBits: native packing equals the shiftleft/bitwiseOR fold specification") {
    val e = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val diff = e.select(
        Similarity.signBits(col("embedding"), 64).as("native"),
        Similarity.signBitsFold(col("embedding"), 64).as("fold"))
      .filter(col("native") =!= col("fold"))
    assert(diff.isEmpty)
  }

  test("hammingDist: unrolled codegen form equals the HOF specification, multi-word") {
    // the r16 unroll must be bit-identical to the zip_with/aggregate
    // spelling across word counts and random sign patterns
    val rnd = new scala.util.Random(3)
    val rows = (1 to 200).map(_ => (rnd.nextLong(), Array.fill(2)(rnd.nextLong()),
      Array.fill(2)(rnd.nextLong())))
    val df = spark.createDataFrame(rows).toDF("id", "a", "b")
    val diff = df.select(
        Similarity.hammingDist(col("a"), col("b"), 2).as("u"),
        Similarity.hammingDistHof(col("a"), col("b")).as("h"))
      .filter(col("u") =!= col("h"))
    assert(diff.isEmpty)
  }

  test("binary-quantized ANN: packing round-trips signs, recall@5 meets the floor, shortlist lever works") {
    val e = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    // sign-bit packing: popcount of the word equals the non-negative count
    val packed = e.select(col("id"),
      Similarity.signBits(col("embedding"), 64).as("bits"),
      aggregate(transform(col("embedding"),
        v => when(v >= 0f, 1L).otherwise(0L)), lit(0L), (a, v) => a + v).as("nonneg"))
      .select(col("id"),
        aggregate(transform(col("bits"), w => bit_count(w).cast("long")),
          lit(0L), (a, v) => a + v).as("pop"), col("nonneg"))
    assert(packed.filter(col("pop") =!= col("nonneg")).isEmpty)

    val q = e.filter(col("id") % 50 === 0)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("rank") <= 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.bruteForceTopK(q, e, 5))
    val bin50 = hits(Similarity.binaryTopK(q, e, 5, shortlist = 50))
    val recall50 = (bin50 & exact).size.toDouble / exact.size
    info(f"binary ANN recall@5 (shortlist 50) = $recall50%.3f")
    assert(recall50 >= 0.6, f"recall@5 $recall50%.3f below 0.6 floor")
    // the recall lever: a wider shortlist can only help (exact rerank)
    val bin200 = hits(Similarity.binaryTopK(q, e, 5, shortlist = 200))
    val recall200 = (bin200 & exact).size.toDouble / exact.size
    info(f"binary ANN recall@5 (shortlist 200) = $recall200%.3f")
    assert(recall200 >= recall50)
  }

  test("SQ8 ADC ANN: scale cancels out of the estimate, recall@5 near-exact, shortlist lever works") {
    val e = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.filter(col("id") % 50 === 0)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("rank") <= 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.bruteForceTopK(q, e, 5))
    // scale cancellation: scaling a corpus vector by any positive constant
    // leaves its int8 ADC cosine estimate unchanged (same codes up to the
    // scale, which divides out) — verified by scaling EVERY corpus vector
    // 2x (a power of two, so the float scaling is EXACT and codes cannot
    // shift by an ulp at a rounding boundary) and getting identical top-5s
    val scaled = e.select(col("id"),
      transform(col("embedding"), v => (v * lit(2.0f)).cast("float")).as("embedding"))
    val sq50 = hits(Similarity.sq8TopK(q, e, 5, shortlist = 50))
    val sq50scaled = hits(Similarity.sq8TopK(q, scaled, 5, shortlist = 50))
    assert(sq50 == sq50scaled, "per-vector scale did not cancel out of the estimate")
    // int8 quantization noise sits far below the inter-neighbor cosine
    // gaps on this corpus — the SQ8 tier's selling point: near-exact
    // recall at 4x compression
    val recall50 = (sq50 & exact).size.toDouble / exact.size
    info(f"SQ8 ADC recall@5 (shortlist 50) = $recall50%.3f")
    assert(recall50 >= 0.9, f"recall@5 $recall50%.3f below the 0.9 SQ8 floor")
    // the recall lever: a wider shortlist can only help (exact rerank)
    val sq200 = hits(Similarity.sq8TopK(q, e, 5, shortlist = 200))
    val recall200 = (sq200 & exact).size.toDouble / exact.size
    info(f"SQ8 ADC recall@5 (shortlist 200) = $recall200%.3f")
    assert(recall200 >= recall50)
  }

  test("approx_count_distinct stays within 10% of exact on fixture data") {
    val ev = Graft.table(spark, "/root/testdata/sf0.001", "events")
    val r = ev.agg(
      approx_count_distinct(col("user_id"), 0.02).as("approx"),
      countDistinct(col("user_id")).as("exact")).collect().head
    val (a, x) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - x) / x < 0.1, s"approx $a vs exact $x")
  }

  test("JL projection: parity with independent math; distances preserved within the JL band") {
    val e = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val proj = Similarity.jlProject(e, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (0 until 16).map(d => r.getAs[Double](s"proj_$d")).toArray).toMap
    val vecs = e.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    // independent reimplementation of one projection row
    val w0 = Similarity.jlWeights(0, 64)
    vecs.take(5).foreach { case (id, v) =>
      val want = v.indices.foldLeft(0.0)((s, i) => s + v(i).toDouble * w0(i).toDouble)
      assert(math.abs(proj(id)(0) - want) < 1e-9, s"vec $id proj_0")
    }
    // JL bound: ||Pa - Pb||^2 / k estimates ||a - b||^2; k = 16 gives a
    // ~25% standard error per pair — the MEDIAN ratio over many pairs must
    // sit well inside [0.7, 1.3]
    val ids = vecs.keys.toSeq.sorted.take(40)
    val ratios = (for {
      Seq(a, b) <- ids.combinations(2).toSeq
    } yield {
      val d2 = vecs(a).indices.foldLeft(0.0)((s, i) =>
        s + math.pow(vecs(a)(i).toDouble - vecs(b)(i).toDouble, 2))
      val p2 = (0 until 16).foldLeft(0.0)((s, d) =>
        s + math.pow(proj(a)(d) - proj(b)(d), 2)) / 16.0
      p2 / d2
    }).sorted
    val median = ratios(ratios.size / 2)
    assert(median > 0.7 && median < 1.3, f"median distortion $median%.3f outside JL band")
  }

  test("MMR rerank skips a redundant near-duplicate in favor of a diverse pick") {
    // candidates: two near-identical high-relevance vectors (1, 2) and a
    // diverse lower-relevance one (3). Pure relevance order is 1, 2, 3;
    // MMR must pick 1, then 3 (2's similarity to 1 wipes its margin).
    val cands = Seq((1L, 0.95), (2L, 0.94), (3L, 0.80)).toDF("id", "rel")
    val sims = Seq(
      (1L, 2L, 0.99), (2L, 1L, 0.99),
      (1L, 3L, 0.05), (3L, 1L, 0.05),
      (2L, 3L, 0.05), (3L, 2L, 0.05)).toDF("a", "b", "sim")
    val picks = Similarity.mmrRerank(cands, "id", "rel", sims, "a", "b", "sim",
        lambdaRel = 0.7, muDiv = 0.3, k = 3)
      .orderBy(col("pick")).select("id").as[Long].collect().toSeq
    assert(picks == Seq(1L, 3L, 2L), s"got $picks")
  }

  test("MMR with mu = 0 reduces to pure relevance order; stops when exhausted") {
    val cands = Seq((1L, 0.9), (2L, 0.8)).toDF("id", "rel")
    val sims = Seq((1L, 2L, 0.99), (2L, 1L, 0.99)).toDF("a", "b", "sim")
    val picks = Similarity.mmrRerank(cands, "id", "rel", sims, "a", "b", "sim",
        lambdaRel = 1.0, muDiv = 0.0, k = 5)
      .orderBy(col("pick")).select("id").as[Long].collect().toSeq
    assert(picks == Seq(1L, 2L), s"k beyond candidates must stop early: $picks")
  }

  test("s10 kNN classify: one prediction per query, votes bounded, labels real") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.SimilarityQueries.s10KnnClassify.run(spark, dir).collect()
    val nq = graft.Graft.table(spark, dir, "embeddings")
      .filter(col("vec_id") % 37 === 0).count()
    assert(out.length == nq, s"one row per query expected: ${out.length} vs $nq")
    val labels = graft.Graft.table(spark, dir, "embeddings")
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    out.foreach { r =>
      val votes = r.getAs[Long]("votes")
      assert(votes >= 1L && votes <= 10L, s"votes out of range: $votes")
      assert(labels.contains(r.getAs[Int]("pred_label")), "pred must be a corpus label")
    }
    // majority vote can never be beaten by an unreported label with more votes:
    // re-derive votes for one query and check the winner matches
    val q0 = out.head.getAs[Long]("query_id")
    val knn = Similarity.bruteForceTopK(
      graft.Graft.table(spark, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding")).filter(col("id") === q0),
      graft.Graft.table(spark, dir, "embeddings").select(col("vec_id").as("id"), col("embedding")),
      10)
    val nbrLabels = knn.join(
        graft.Graft.table(spark, dir, "embeddings")
          .select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
      .select("label").collect().map(_.getInt(0))
    val tally = nbrLabels.groupBy(identity).map { case (l, xs) => (l, xs.length) }
    val maxVotes = tally.values.max
    val expected = tally.filter(_._2 == maxVotes).keys.toSeq
    val got = out.find(_.getAs[Long]("query_id") == q0).get
    assert(expected.contains(got.getAs[Int]("pred_label")),
      s"winner ${got.getAs[Int]("pred_label")} not among max-vote labels $expected")
    assert(got.getAs[Long]("votes") == maxVotes.toLong)
  }
}
