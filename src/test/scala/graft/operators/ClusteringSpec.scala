package graft.operators

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def emb(dir: String) =
    Graft.table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))

  private lazy val sf0001 = emb("/root/testdata/sf0.001")

  test("seed cells: deterministic md5 stride — same seeds on every run, ~sqrt(n) of them") {
    val a = Clustering.seedCells(sf0001, "vec_id", "embedding")
      .select("cell_id").as[Long].collect().sorted
    val b = Clustering.seedCells(sf0001, "vec_id", "embedding")
      .select("cell_id").as[Long].collect().sorted
    assert(a.sameElements(b))
    val n = sf0001.count()
    // expected n/stride ≈ ceil(sqrt(n)); allow generous hash variance
    val expected = Clustering.cellCount(n)
    assert(a.length > expected / 3 && a.length < expected * 3,
      s"got ${a.length} seeds for n=$n (expected ≈ $expected)")
  }

  test("assignment: every non-zero vector gets exactly one cell, the argmax-cosine one") {
    val cells = Clustering.seedCells(sf0001, "vec_id", "embedding")
    val assign = Clustering.assignCells(sf0001, "vec_id", "embedding", cells)
    assert(assign.count() == sf0001.count())
    assert(assign.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)

    // parity with the window spelling of argmax
    val scored = sf0001
      .select(col("vec_id"), col("embedding"), Similarity.l2Norm(col("embedding")).as("nm"))
      .join(broadcast(cells))
      .select(col("vec_id"),
        (Similarity.dot(col("embedding"), col("c_emb")) / (col("nm") * col("c_norm"))).as("cos"),
        col("cell_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos").desc, col("cell_id").asc)
    val windowed = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cell_id"))
    assert(assign.select("vec_id", "cell_id").exceptAll(windowed).count() == 0)
    assert(windowed.exceptAll(assign.select("vec_id", "cell_id")).count() == 0)
  }

  test("IVF results are a subset of cell members and scores match brute force exactly") {
    val q = sf0001.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("id"), col("embedding"))
    val c = sf0001.select(col("vec_id").as("id"), col("embedding"))
    val ivf = Clustering.ivfTopK(q, c, 5, nprobe = 12).collect()
    assert(ivf.nonEmpty)
    // every IVF (query, neighbor, cosine) must appear in the exact scored set
    // with the identical cosine (IVF approximates WHICH pairs are scored,
    // never the score itself)
    val exact = Similarity.bruteForceTopK(q, c, 500 /* all pairs at this sf */)
      .collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine"))
      .toMap
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(exact.contains(key), s"IVF returned non-corpus pair $key")
      assert(math.abs(exact(key) - r.getAs[Double]("cosine")) < 1e-12)
    }
  }

  test("IVF recall@5 vs exact s01 meets the measured floor at nprobe=12") {
    val q = sf0001.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("id"), col("embedding"))
    val c = sf0001.select(col("vec_id").as("id"), col("embedding"))
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = sets(Similarity.bruteForceTopK(q, c, 5))
    val ivf = sets(Clustering.ivfTopK(q, c, 5, nprobe = 12))
    val recall = exact.map { case (qid, ex) =>
      ivf.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    // measured 0.74 at sf0.01 / 0.66 at sf0.1 (see ClusterQueries.NProbe);
    // floor set well under the measured band to stay non-flaky across SFs
    assert(recall >= 0.4, f"IVF recall@5 = $recall%.2f below floor")
  }

  test("two-level IVF recall@5 vs exact meets the measured floor; results are exact cosines") {
    val q = sf0001.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("id"), col("embedding"))
    val c = sf0001.select(col("vec_id").as("id"), col("embedding"))
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exactDf = Similarity.bruteForceTopK(q, c, 5)
    val exactCos = exactDf.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Double]("cosine")).toMap
    val twoDf = Clustering.twoLevelTopK(q, c, 5,
      graft.queries.ClusterQueries.NProbeCoarse, graft.queries.ClusterQueries.NProbeFine)
    // every returned score is an EXACT cosine (the approximation is only
    // WHICH pairs get scored)
    val allExact = Similarity.bruteForceTopK(q, c, c.count().toInt)
    val allCos = allExact.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Double]("cosine")).toMap
    twoDf.collect().foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(allCos.contains(key), s"two-level returned non-corpus pair $key")
      assert(math.abs(allCos(key) - r.getAs[Double]("cosine")) < 1e-12)
    }
    val exact = sets(exactDf)
    val two = sets(twoDf)
    val recall = exact.map { case (qid, ex) =>
      two.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    // measured 0.98 at sf0.001/0.01 (toy corpora — probes nearly exhaust
    // them) and 0.54 at sf0.1; floor well under the local measurement
    assert(recall >= 0.6, f"two-level recall@5 = $recall%.2f below floor")
  }

  test("two-level budget probe: corpus-sized budget == probing every reachable fine cell; tiny budget stays exact and bounded") {
    import graft.queries.ClusterQueries.NProbeCoarse
    val q = sf0001.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("id"), col("embedding"))
    val c = sf0001.select(col("vec_id").as("id"), col("embedding"))
    val (coarse, fineAll, assign) = Clustering.twoLevelIndex(c, "id", "embedding")
    val fineCount = fineAll.count().toInt
    val corpusN = c.count()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Number]("rank").longValue(),
        r.getAs[Long]("neighbor_id"))).sorted.toSeq
    // a budget covering the whole corpus probes exactly the fine cells a
    // fixed probe of ALL fine cells reaches — identical results
    val fixedAll = Clustering.twoLevelTopKFromIndex(q, c, coarse, fineAll, assign,
      5, NProbeCoarse, fineCount)
    val budgetAll = Clustering.twoLevelTopKFromIndex(q, c, coarse, fineAll, assign,
      5, NProbeCoarse, 1, candidateBudget = Some(corpusN))
    assert(rows(budgetAll) == rows(fixedAll),
      "corpus-sized budget must equal the probe-everything fixed config")
    // a tiny budget returns a (possibly smaller) EXACT-scored subset
    val allCos = Similarity.bruteForceTopK(q, c, corpusN.toInt).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Double]("cosine")).toMap
    val tiny = Clustering.twoLevelTopKFromIndex(q, c, coarse, fineAll, assign,
      5, NProbeCoarse, 1, candidateBudget = Some(1L)).collect()
    assert(tiny.nonEmpty, "budget=1 must still probe at least one fine cell")
    tiny.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(allCos.contains(key), s"budget probe returned non-corpus pair $key")
      assert(math.abs(allCos(key) - r.getAs[Double]("cosine")) < 1e-12,
        "budget probe must return exact cosines")
    }
    val perQuery = tiny.groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length)
    assert(perQuery.values.forall(_ <= 5))
  }

  test("semantic dedup: in-cell near-dups drop, min id of a chain survives") {
    // fixture: 3 near-identical vectors (a chain) + 1 orthogonal, in 2-dim
    // space padded to 8 dims so seed selection stays sane
    def v(xs: Double*) = xs.map(_.toFloat).toArray ++ Array.fill(6)(0.0f)
    val df = Seq(
      (10L, v(1.0, 0.01)), (11L, v(1.0, 0.02)), (12L, v(1.0, 0.03)),
      (20L, v(0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val res = Clustering.semanticDedup(df, "vec_id", "embedding", 0.95)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("kept")).toMap
    assert(res(20L), "orthogonal vector must survive")
    // the near-dup trio: whoever shares a cell with a smaller-id twin drops.
    // With any cell layout the smallest id present in each cell survives.
    val dupIds = Seq(10L, 11L, 12L)
    assert(dupIds.exists(res(_)), "at least the smallest id of the chain survives")
    val cells = Clustering.semanticDedup(df, "vec_id", "embedding", 0.95)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell_id")).toMap
    dupIds.groupBy(cells).foreach { case (_, members) =>
      val kept = members.filter(res(_))
      assert(kept == List(members.min),
        s"cell with members $members kept $kept, expected only ${members.min}")
    }
  }

  test("FloatVecSumAgg matches the posexplode spelling and skips null rows") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(0.5f, 0.5f, 0.5f)),
      (2L, Array(1.0f, 1.0f, 1.0f))
    ).toDF("g", "v")
      .union(Seq((2L, null.asInstanceOf[Array[Float]])).toDF("g", "v"))
    val agg = org.apache.spark.sql.graft.ColumnShim.column(
      graft.sql.FloatVecSumAgg(
        org.apache.spark.sql.graft.ColumnShim.expression(col("v")))
        .toAggregateExpression())
    val native = df.groupBy("g").agg(agg.as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val spelled = df.filter(col("v").isNotNull)
      .select(col("g"), posexplode(col("v")))
      .groupBy(col("g"), col("pos")).agg(sum(col("col").cast("double")).as("s"))
      .groupBy(col("g"))
      .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .select(col("g"), transform(col("ps"), p => p.getField("s")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(native == spelled)
    assert(native(1L) == Seq(1.5, 2.5, 3.5))
  }

  test("IVF at rest: corpus written partitioned by cell_id — probes become partition pruning") {
    // the production layout the ivfTopK scaladoc claims: materialize
    // (cell_id, vec_id, embedding) partitioned by cell_id; a probe filter
    // then prunes unread cells at the parquet-directory level
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val cells = Clustering.materializedCells(sf0001, "vec_id", "embedding")
    val assign = Clustering.assignCells(sf0001, "vec_id", "embedding", cells)
    assign.join(sf0001, "vec_id")
      .write.partitionBy("cell_id").mode("overwrite").parquet(dir)

    val atRest = spark.read.parquet(dir)
    val allCells = cells.select("cell_id").as[Long].collect().sorted
    val probed = allCells.take(3)
    val q = atRest.filter(col("cell_id").isin(probed: _*))
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
    // the probe predicate must be a PARTITION filter (directory-level
    // pruning), not a data filter over a full scan
    assert(scan.contains("PartitionFilters") && scan.contains("cell_id"), scan)
    // and the scan must report reading exactly the probed partitions
    val fileScan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail(s"no file scan in\n$scan"))
    assert(fileScan.metrics("numPartitions").value == probed.length,
      s"read ${fileScan.metrics("numPartitions").value} partitions, expected ${probed.length}")
    val expected = assign.filter(col("cell_id").isin(probed: _*)).count()
    assert(q.count() == expected)
    assert(expected < assign.count(), "probe must read a strict subset")
  }

  test("kmeans: WCSS non-increasing per Lloyd iteration; final assignment is argmin") {
    val model = Clustering.kmeans(spark, sf0001, "vec_id", "embedding", iters = 3)
    assert(model.wcss.length == 4) // seed + 3 refinements
    model.wcss.sliding(2).foreach { case Array(prev, next) =>
      // float-rounded centroids can nudge WCSS by ulps near convergence
      assert(next <= prev * (1 + 1e-9) + 1e-6,
        s"WCSS increased: ${model.wcss.mkString(", ")}")
    }
    assert(model.wcss.last < model.wcss.head, "Lloyd refinement never improved WCSS")

    // final assignment = argmin over final centroids (replay independently)
    val assign = Clustering.assignKMeans(spark, sf0001, "vec_id", "embedding", model.centroids)
    val vecs = sf0001.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = assign.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell_id")).toMap
    def d2(a: Array[Float], c: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - c(i).toDouble; s += d * d; i += 1 }
      s
    }
    got.foreach { case (vid, cid) =>
      val best = model.centroids.map { case (id, c) => (d2(vecs(vid), c), id) }.min
      assert(best._2 == cid || math.abs(best._1 - model.centroids.collectFirst {
        case (`cid`, c) => d2(vecs(vid), c)
      }.get) < 1e-9, s"vec $vid assigned $cid, argmin says ${best._2}")
    }
  }

  test("PQ codes: one row per vector, every code a codebook POSITION") {
    val cells = Clustering.materializedCells(sf0001, "vec_id", "embedding")
    val nCells = cells.count()
    val codes = Clustering.pqCodes(sf0001, "vec_id", "embedding", cells, 8, 8)
    assert(codes.count() == sf0001.count())
    val rows = codes.collect()
    rows.foreach { r =>
      (0 until 8).foreach { m =>
        val c = r.getAs[Long](s"code_$m")
        assert(c >= 1 && c <= nCells,
          s"vec ${r.getAs[Long]("vec_id")} code_$m = $c outside [1, $nCells]")
      }
    }
  }

  test("PQ ADC: estimate is EXACT for codebook members; raw vs rerank recall") {
    // a seed vector quantizes to (a subvector identical to) itself in every
    // subspace, so its ADC estimate equals the true squared distance
    val q = sf0001.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("id"), col("embedding"))
    val c = sf0001.select(col("vec_id").as("id"), col("embedding"))
    val cells = Clustering.materializedCells(sf0001, "vec_id", "embedding")
    val seedIds = cells.select("cell_id").as[Long].collect().toSet
    val vecs = sf0001.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    def sub(v: Array[Float], m: Int) = v.slice(m * 8, m * 8 + 8)
    def dot(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def estRef(a: Array[Float], b: Array[Float]) = (0 until 8).map { m =>
      val (as, bs) = (sub(a, m), sub(b, m))
      BigDecimal(dot(as, as) + dot(bs, bs) - 2.0 * dot(as, bs))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    // raw ADC (rerank = 0), k = corpus size so every seed appears as a
    // neighbor: estimates for seed neighbors must be exact
    val raw = Clustering.pqTopK(q, c, 500, 8, 8, rerank = 0)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("pq_dist2")))
    val seedHits = raw.filter { case (_, n, _) => seedIds.contains(n) }
    assert(seedHits.nonEmpty)
    seedHits.foreach { case (qid, nid, est) =>
      val exact = estRef(vecs(qid), vecs(nid))
      assert(math.abs(est - exact) < 1e-8 * (1.0 + exact),
        s"($qid,$nid): est $est vs exact-on-seed $exact")
    }
    // rerank recall floor (measured 0.92 at sf0.001; floor well under)
    def top5(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val qids = q.select("id").as[Long].collect()
    val exactTop = qids.map { qid =>
      qid -> vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) =>
          val d = vecs(qid).indices.foldLeft(0.0)((s, i) =>
            s + math.pow(vecs(qid)(i).toDouble - v(i).toDouble, 2))
          (d, id)
        }.sorted.take(5).map(_._2).toSet
    }.toMap
    val pq = top5(Clustering.pqTopK(q, c, 5, 8, 8, rerank = 100))
    val recall = exactTop.map { case (qid, ex) =>
      pq.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exactTop.size
    assert(recall >= 0.6, f"PQ+rerank recall@5 = $recall%.2f below floor")
  }

  test("diverseSample caps dense cells, keeps sparse cells whole, is layout-invariant") {
    val cells = Clustering.seedCells(sf0001, "vec_id", "embedding")
    val assigned = Clustering.assignCells(sf0001, "vec_id", "embedding", cells)
    val cellSizes = assigned.groupBy("cell_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cap = 3
    val picked = Clustering.diverseSample(assigned, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val perCell = picked.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
    // every cell represented; dense capped exactly; sparse kept whole
    assert(perCell.keySet == cellSizes.keySet)
    cellSizes.foreach { case (c, n) =>
      assert(perCell(c) == math.min(n, cap.toLong), s"cell $c: ${perCell(c)} of $n")
    }
    // deterministic under a different physical layout
    val repicked = Clustering.diverseSample(assigned.repartition(17), cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(picked.toSet == repicked.toSet, "selection changed with partitioning")
  }

  test("two-level index: every vector lands in a fine cell of its own coarse cell; layout-invariant") {
    val (coarse, fineAll, assign) = Clustering.twoLevelIndex(sf0001, "vec_id", "embedding")
    val nCoarse = coarse.count()
    val n = sf0001.count()
    // coarse codebook is ~⁴√n — the only driver-sized structure
    assert(nCoarse > 0 && nCoarse < math.sqrt(math.sqrt(n.toDouble)) * 4,
      s"$nCoarse coarse cells for n=$n")
    // every coarse cell has at least one fine seed (its own coarse seed)
    val coarseIds = coarse.select("cell_id").as[Long].collect().toSet
    val fineCoarse = fineAll.select("coarse_id").distinct().as[Long].collect().toSet
    assert(coarseIds.subsetOf(fineCoarse))
    // full assignment, one fine cell per vector, and the fine cell belongs
    // to the vector's coarse cell
    assert(assign.count() == n)
    assert(assign.groupBy("vec_id").count().filter(col("count") > 1).isEmpty)
    val badPair = assign.join(
        fineAll.select(col("coarse_id").as("f_coarse"), col("fine_id")), "fine_id")
      .filter(col("coarse_id") =!= col("f_coarse"))
    assert(badPair.isEmpty, "a vector was assigned a fine cell outside its coarse cell")
    // deterministic under a different physical layout
    val (_, _, assign2) = Clustering.twoLevelIndex(sf0001.repartition(13), "vec_id", "embedding")
    assert(assign.orderBy("vec_id").collect().toSeq == assign2.orderBy("vec_id").collect().toSeq)
  }

  test("driver collects are size-gated: oversized codebooks fail fast, defaults unchanged") {
    // this corpus yields more than 2 seed cells — a cap of 2 must trip the
    // gate instead of silently pulling the codebook through the driver
    val e1 = intercept[IllegalArgumentException] {
      Clustering.materializedCells(sf0001, "vec_id", "embedding", maxDriverCells = 2)
    }
    assert(e1.getMessage.contains("maxDriverCells"))
    val e2 = intercept[IllegalArgumentException] {
      Clustering.kmeans(spark, sf0001, "vec_id", "embedding", iters = 0, maxDriverCells = 2)
    }
    assert(e2.getMessage.contains("maxDriverCells"))
    // under the default cap the gated path is value-identical to seedCells
    val gated = Clustering.materializedCells(sf0001, "vec_id", "embedding")
      .select("cell_id").as[Long].collect().sorted
    val direct = Clustering.seedCells(sf0001, "vec_id", "embedding")
      .select("cell_id").as[Long].collect().sorted
    assert(gated.sameElements(direct))
  }

  test("IVFPQ: at-rest probe equals inline build; rerank recall meets the floor") {
    val q = sf0001.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("id"), col("embedding"))
    val c = sf0001.select(col("vec_id").as("id"), col("embedding"))
    import graft.queries.ClusterQueries.{NProbe, NumSub, SubDim, PqRerank}
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getAs[Long](0), r.getAs[Any](1).toString, r.getAs[Long](2))).toSet
    val inline = Clustering.ivfPqTopK(q, c, 5, NProbe, NumSub, SubDim, rerank = PqRerank)
    // from-index with the same (deterministically rebuilt) artifacts
    val cells = Clustering.materializedCells(c, "id", "embedding")
    val assign = Clustering.assignCells(c, "id", "embedding", cells)
    val codes = Clustering.pqCodes(c, "id", "embedding", cells, NumSub, SubDim)
    val atRest = Clustering.ivfPqTopKFromIndex(q, c, cells, assign, codes,
      5, NProbe, NumSub, SubDim, rerank = PqRerank)
    assert(rows(inline) == rows(atRest), "at-rest probe diverged from inline build")
    // recall floor: measured 0.54 at sf0.001 / 0.74 at sf0.01 (bounded by
    // the IVF candidate restriction; rerank recovers the PQ estimate loss)
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = sets(Similarity.bruteForceTopK(q, c, 5))
    val got = sets(inline)
    val recall = exact.map { case (qid, ex) =>
      got.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    assert(recall >= 0.4, f"IVFPQ recall@5 = $recall%.2f below floor")
  }

  test("residual IVFADC: at-rest equals inline; rerank recall within [floor, probe bound]") {
    val q = sf0001.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("id"), col("embedding"))
    val c = sf0001.select(col("vec_id").as("id"), col("embedding"))
    import graft.queries.ClusterQueries.{NProbe, NumSub, SubDim}
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getAs[Long](0), r.getAs[Any](1).toString, r.getAs[Long](2))).toSet
    val inline = Clustering.ivfAdcResidualTopK(q, c, 5, NProbe, NumSub, SubDim)
    val cells = Clustering.materializedCells(c, "id", "embedding")
    val rcb = Clustering.residualCodebook(cells)
    val codes = Clustering.residualPqCodes(c, "id", "embedding", cells, rcb, NumSub, SubDim)
    val atRest = Clustering.ivfAdcResidualFromIndex(q, c, cells, rcb, codes,
      5, NProbe, NumSub, SubDim)
    assert(rows(inline) == rows(atRest), "at-rest probe diverged from inline build")
    // structure: one residual-codebook entry per coarse cell; every code a
    // codebook entry; each vector carries its coarse cell
    assert(rcb.count() == cells.count())
    val nRcodes = rcb.count()
    val codeRows = codes.collect()
    assert(codeRows.map(_.getAs[Long]("vec_id")).toSet.size == codeRows.length)
    (0 until NumSub).foreach(m => codeRows.foreach { r =>
      val c = r.getAs[Long](s"code_$m")
      assert(c >= 1 && c <= nRcodes, s"code_$m = $c outside [1, $nRcodes]")
    })
    // recall frontier (measured, tools/RecallAb): with rerank the recall
    // of BOTH PQ variants is capped by — and at sf0.01 saturates — the
    // IVF candidate-restriction bound (0.74 @ nprobe=12), so the
    // estimator-quality claim lives on the RAW path. On this synthetic
    // near-orthogonal corpus residual coding measures ≈ non-residual
    // (no cluster structure for the residual frame to exploit — the
    // regime where FAISS's default wins is multi-modal data), so the
    // pinned properties are: rerank recall meets the same floor as s11,
    // and never exceeds the probe bound it is mathematically capped by.
    import graft.queries.ClusterQueries.PqRerank
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = sets(Similarity.bruteForceTopK(q, c, 5))
    def recallOf(df: org.apache.spark.sql.DataFrame) = {
      val got = sets(df)
      exact.map { case (qid, ex) =>
        got.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
      }.sum / exact.size
    }
    val bound = recallOf(
      Clustering.ivfTopKFromIndex(q, c, cells,
        Clustering.assignCells(c, "id", "embedding", cells), 5, NProbe))
    val reranked = recallOf(Clustering.ivfAdcResidualFromIndex(q, c, cells, rcb, codes,
      5, NProbe, NumSub, SubDim, rerank = PqRerank))
    assert(reranked >= 0.4, f"residual IVFADC rerank recall $reranked%.2f below floor")
    assert(reranked <= bound + 1e-9,
      f"recall $reranked%.2f exceeded the probe bound $bound%.2f — candidate leak")
  }

  test("foldIntoIndex: incremental fold equals one-shot assignment exactly") {
    val e = sf0001.select(col("vec_id").as("id"), col("embedding"))
    val base = e.filter(col("id") % 10 =!= 7)
    val delta = e.filter(col("id") % 10 === 7)
    assert(delta.count() > 0, "fixture has no delta slice")
    val cells = Clustering.materializedCells(base, "id", "embedding")
    val folded = Clustering.foldIntoIndex(delta, "id", "embedding", cells,
      Clustering.assignCells(base, "id", "embedding", cells))
    val oneShot = Clustering.assignCells(e, "id", "embedding", cells)
    val f = folded.orderBy("vec_id").collect().map(_.toString).toSeq
    val o = oneShot.orderBy("vec_id").collect().map(_.toString).toSeq
    assert(f == o, "incremental fold diverged from one-shot assignment")
    // probes over the folded index are therefore the one-shot probes
    val q = e.filter(col("id") % 50 === 0)
    assert(Clustering.ivfTopKFromIndex(q, e, cells, folded, 5, 4)
        .orderBy("query_id", "rank").collect().map(_.toString).toSeq
      == Clustering.ivfTopKFromIndex(q, e, cells, oneShot, 5, 4)
        .orderBy("query_id", "rank").collect().map(_.toString).toSeq)
  }

  test("ivfTopKAdaptive: budget extremes bracket the fixed-nprobe probe") {
    val e = sf0001.select(col("vec_id").as("id"), col("embedding"))
    val q = e.filter(col("id") % 50 === 0)
    val cells = Clustering.materializedCells(e, "id", "embedding")
    val assign = Clustering.assignCells(e, "id", "embedding", cells)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    // budget 1: exactly one cell probed per query == nprobe 1
    assert(rows(Clustering.ivfTopKAdaptive(q, e, cells, assign, 5, 1L))
      == rows(Clustering.ivfTopKFromIndex(q, e, cells, assign, 5, 1)))
    // budget ≥ corpus: every cell probed == nprobe = all cells (exhaustive)
    val nCells = cells.count().toInt
    assert(rows(Clustering.ivfTopKAdaptive(q, e, cells, assign, 5, e.count() + 1))
      == rows(Clustering.ivfTopKFromIndex(q, e, cells, assign, 5, nCells)))
    // a mid budget probes a per-query VARIABLE cell count but stays exact
    // on whatever it scores: results are a subset-ranking of exhaustive
    val mid = Clustering.ivfTopKAdaptive(q, e, cells, assign, 5, 100L)
    assert(mid.groupBy("query_id").count().collect().forall(_.getLong(1) <= 5))
  }

  test("cellSkewReport flags only cells above the split factor") {
    // constructed assignment: cell 1 ×8, cell 2 ×2, cell 3 ×2 (mean 4;
    // only cell 1 exceeds 2×mean... 8 > 8 is false — use ×9 to exceed)
    val assign = ((1 to 9).map(i => (i.toLong, 1L)) ++
      Seq((101L, 2L), (102L, 2L), (103L, 3L))).toDF("vec_id", "cell_id")
    val rep = Clustering.cellSkewReport(assign).collect()
      .map(r => r.getAs[Long]("cell_id") ->
        (r.getAs[Long]("n_members"), r.getAs[Boolean]("needs_split"))).toMap
    // mean = 12/3 = 4; threshold 8: cell 1 (9) splits, cells 2 (2) and 3 (1) don't
    assert(rep(1L) == ((9L, true)), s"got ${rep(1L)}")
    assert(rep(2L) == ((2L, false)))
    assert(rep(3L) == ((1L, false)))
  }
}
