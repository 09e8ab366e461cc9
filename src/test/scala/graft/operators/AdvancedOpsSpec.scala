package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 operators: integer PageRank, gap fill / forward fill, MERGE
  * upsert, blocked fuzzy ER, exact-moment stats, cross-doc block dedup. */
class AdvancedOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Graphs.pageRankMicro ------------------------------------------------

  private def star: org.apache.spark.sql.DataFrame = {
    // hub "h" connected to 4 spokes, symmetric; plus a 2-cycle pair off to
    // the side. Hub must out-rank every spoke, pair members tie.
    val pairs = Seq(("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"), ("x", "y"))
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
  }

  test("pageRankMicro: hub out-ranks spokes, symmetric nodes tie, mass sane") {
    val r = Graphs.pageRankMicro(spark, star, 5).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("h") > r("a"), r.toString)
    assert(Seq("a", "b", "c", "d").map(r).distinct.size == 1, "spokes must tie")
    assert(r("x") == r("y"), "2-cycle members must tie")
    // with symmetric edges no mass is lost beyond floor-division dust:
    // total stays within N * (teleport..unit) band
    val total = r.values.sum
    assert(total > 6L * Graphs.TeleportMicro && total <= 7L * Graphs.RankUnit, total.toString)
  }

  test("pageRankMicro agrees with the double reference on ranking order") {
    val li = graft.Graft.table(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_partkey") < 40)
    val pairs = li.select(concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
      concat(lit("p"), col("l_partkey").cast("string")).as("dst")).distinct()
    val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val intRanks = Graphs.pageRankMicro(spark, edges, 5)
      .orderBy(col("rank_micro").desc, col("node")).select("node").as[String].collect()
    val dblRanks = Graphs.pageRankDouble(spark, edges, 5)
      .orderBy(col("rank").desc, col("node")).select("node").as[String].collect()
    // micro-unit quantization can flip near-ties; top of the order must agree
    assert(intRanks.take(5).sameElements(dblRanks.take(5)),
      s"int=${intRanks.take(5).toSeq} dbl=${dblRanks.take(5).toSeq}")
  }

  test("pageRankMicro is partition-layout independent") {
    val e = star
    val a = Graphs.pageRankMicro(spark, e, 3).orderBy("node").collect().toSeq
    val b = Graphs.pageRankMicro(spark, e.repartition(7), 3).orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("bfsDepths: min depth from any seed, unreached excluded, empty-frontier rounds harmless") {
    // path a-b-c-d-e plus isolated pair f-g; seeds {a, e}: min-depth from
    // EITHER end (c reached from both at 2), f/g unreached
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("f", "g"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("a", "e").toDF("node")
    val r = Graphs.bfsDepths(spark, edges, seeds, maxDepth = 10).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 0L, "e" -> 0L, "b" -> 1L, "d" -> 1L, "c" -> 2L), r.toString)
    // maxDepth 10 on a diameter-2 reach: rounds 3..10 are empty joins, no
    // duplicate or deeper rows appear
    assert(Graphs.bfsDepths(spark, edges, seeds, maxDepth = 10).count() == 5)
    // depth bound respected
    val shallow = Graphs.bfsDepths(spark, edges, Seq("a").toDF("node"), maxDepth = 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(shallow == Map("a" -> 0L, "b" -> 1L, "c" -> 2L), shallow.toString)
  }

  test("pageRankMicro denseInflow/edgeCountHint: bit-identical ranks on random symmetric graphs") {
    // denseInflow skips the per-iteration dangling fill under the
    // symmetric-edge-set guarantee; edgeCountHint re-sizes every internal
    // exchange — NEITHER may change a single rank (integer arithmetic is
    // partitioning-exact and the contrib key set is the node set)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 20 + rnd.nextInt(30)
      val pairs = (1 to 120).map(_ => (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
        .filter(p => p._1 != p._2).distinct
      val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
      val base = Graphs.pageRankMicro(spark, edges, 5)
        .orderBy("node").collect().toSeq
      val dense = Graphs.pageRankMicro(spark, edges, 5, denseInflow = true,
        edgeCountHint = Some(pairs.size.toLong * 2))
        .orderBy("node").collect().toSeq
      assert(base == dense, s"trial $trial diverged")
    }
  }

  test("bfsDepths undirected/edgeCountHint: identical depths on random symmetric graphs") {
    // undirected=true excludes only the last two layers (valid because one
    // hop changes depth by at most 1 on a symmetric edge set); depths must
    // match the general path exactly, across several random graphs and
    // depth caps
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 15 + rnd.nextInt(25)
      val pairs = (1 to 80).map(_ => (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
        .filter(p => p._1 != p._2).distinct
      val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
      val seeds = Seq(s"n0", s"n1").toDF("node")
      val depth = 1 + rnd.nextInt(5)
      val base = Graphs.bfsDepths(spark, edges, seeds, depth)
        .orderBy("node").collect().toSeq
      val und = Graphs.bfsDepths(spark, edges, seeds, depth, undirected = true,
        edgeCountHint = Some(pairs.size.toLong * 2))
        .orderBy("node").collect().toSeq
      assert(base == und, s"trial $trial depth $depth diverged")
    }
  }

  test("bfsDepths is partition-layout independent") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("f", "g"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val x = Graphs.bfsDepths(spark, edges, seeds, 4).orderBy("node").collect().toSeq
    val y = Graphs.bfsDepths(spark, edges.repartition(7), seeds, 4)
      .orderBy("node").collect().toSeq
    assert(x == y)
  }

  // ---- TimeSeries.gapFillForwardFill --------------------------------------

  test("gapFillForwardFill densifies and carries last observation forward") {
    val daily = Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-04", 40.0),
      (2L, "2024-03-10", 5.0))
      .toDF("k", "day", "v").withColumn("day", to_date(col("day")))
    val out = TimeSeries.gapFillForwardFill(daily, "k", "day", "v")
      .orderBy("k", "day")
      .select(col("k"), col("day").cast("string"), col("value_filled"), col("is_gap"))
      .as[(Long, String, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-01-01", 10.0, false),
      (1L, "2024-01-02", 10.0, true),
      (1L, "2024-01-03", 10.0, true),
      (1L, "2024-01-04", 40.0, false),
      (2L, "2024-03-10", 5.0, false)), out.toString)
  }

  test("gapFillForwardFill: first day per key is never a gap") {
    val daily = Seq((1L, "2024-05-05", 1.0), (1L, "2024-05-09", 2.0))
      .toDF("k", "day", "v").withColumn("day", to_date(col("day")))
    val first = TimeSeries.gapFillForwardFill(daily, "k", "day", "v")
      .orderBy("day").limit(1).select("is_gap").as[Boolean].head()
    assert(!first)
  }

  test("rollingMeanDays uses the event-time range, not row count") {
    val filled = Seq((1L, "2024-01-01", 10.0), (1L, "2024-01-02", 20.0),
      (1L, "2024-01-05", 30.0))
      .toDF("k", "day", "v").withColumn("day", to_date(col("day")))
    val out = TimeSeries.rollingMeanDays(filled, "k", "day", "v", days = 3)
      .orderBy("day").select("rolling_avg").as[Double].collect().toSeq
    // day 5's 3-day window covers days 3..5 → only the 30.0 row
    assert(out == Seq(10.0, 15.0, 30.0), out.toString)
  }

  test("rollingAnomaly flags a planted spike; constant windows never flag") {
    val filled = ((1 to 10).map(d => (1L, f"2024-01-$d%02d", 100.0)) :+
      ((1L, "2024-01-11", 500.0)) :+ ((1L, "2024-01-12", 100.0)))
      .toDF("k", "day", "v").withColumn("day", to_date(col("day")))
    val out = TimeSeries.rollingAnomaly(filled, "k", "day", "v", days = 7, zThreshold = 2.0)
      .orderBy("day")
      .select(col("day").cast("string"), col("z"), col("is_anomaly"))
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getBoolean(2)))
    // constant prefix: exact-zero spread → NULL z, no flag
    assert(out.take(10).forall { case (_, z, f) => z.isEmpty && !f }, out.mkString(","))
    // the spike day: way outside its trailing window
    val spike = out.find(_._1 == "2024-01-11").get
    assert(spike._3, s"spike not flagged: $spike")
    // the day after: window now contains the spike, 100.0 is within 2σ
    val after = out.find(_._1 == "2024-01-12").get
    assert(!after._3, s"normal day flagged: $after")
  }

  // ---- Merge.upsert --------------------------------------------------------

  private val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "bal")
  private val source = Seq((2L, "B2", 200.0), (9L, "new", 90.0))
    .toDF("k", "name", "bal")

  test("upsert updates matched rows, inserts new keys, passes the rest") {
    val out = Merge.upsert(target, source, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "B2", 200.0), (3L, "c", 30.0),
      (9L, "new", 90.0)), out.toString)
  }

  test("upsert: a NULL source column overwrites (strict MERGE, not coalesce)") {
    val s = Seq((2L, Option.empty[String], Option(200.0))).toDF("k", "name", "bal")
    val row = Merge.upsert(target, s, "k").filter(col("k") === 2)
      .select("name").collect().head
    assert(row.isNullAt(0), "matched update must take the source value even when NULL")
  }

  test("upsertSmallSource matches upsert and never shuffles the target") {
    val a = Merge.upsert(target, source, "k").orderBy("k").collect().toSeq
    val b = Merge.upsertSmallSource(target, source, "k").orderBy("k").collect().toSeq
    assert(a == b)
    val plan = Merge.upsertSmallSource(target, source, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"anti-join must broadcast the source:\n$plan")
  }

  // ---- EntityResolution ----------------------------------------------------

  test("blockedLevenshteinPairs: only in-block pairs within maxDist, ordered") {
    val df = Seq((1L, "cold widget"), (2L, "gold widget"), (3L, "small widget"),
      (4L, "cold bolt")).toDF("id", "name")
    val out = EntityResolution.blockedLevenshteinPairs(
        df, "id", "name", split(col("name"), " ").getItem(1), maxDist = 2)
      .select("id_a", "id_b", "edit_dist").as[(Long, Long, Int)].collect().toSeq.sorted
    // (1,2) lev=1 in block widget; (1,3) lev=4 excluded; (1,4) different block
    assert(out == Seq((1L, 2L, 1)), out.toString)
    assert(out.forall(p => p._1 < p._2))
  }

  test("blockHistogram surfaces hot blocks before the join") {
    val df = Seq.tabulate(20)(i => (i.toLong, if (i < 15) "x common" else s"y$i rare"))
      .toDF("id", "name")
    val h = EntityResolution.blockHistogram(df, split(col("name"), " ").getItem(1))
      .orderBy(col("block_size").desc).limit(1)
      .as[(String, Long)].collect().head
    assert(h == ("common", 15L))
  }

  // ---- Stats.momentStats ---------------------------------------------------

  test("momentStats matches Spark's float aggregates to 1e-6") {
    val li = graft.Graft.table(spark, "/root/testdata/sf0.001", "lineitem")
    val ours = Stats.momentStats(li, Seq(col("l_returnflag")),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy("l_returnflag")
      .select("stddev_x", "covar_xy", "corr_xy").as[(Double, Double, Double)]
      .collect()
    val ref = li.groupBy("l_returnflag")
      .agg(stddev(col("l_quantity")), covar_samp(col("l_quantity"), col("l_extendedprice")),
        corr(col("l_quantity"), col("l_extendedprice")))
      .orderBy("l_returnflag")
      .as[(String, Double, Double, Double)].collect()
    ours.zip(ref).foreach { case ((sd, cv, cr), (_, rsd, rcv, rcr)) =>
      assert(math.abs(sd - rsd) < 1e-6, s"stddev $sd vs $rsd")
      assert(math.abs(cv - rcv) < math.abs(rcv) * 1e-9 + 1e-6, s"covar $cv vs $rcv")
      assert(math.abs(cr - rcr) < 1e-6, s"corr $cr vs $rcr")
    }
  }

  test("momentStats: n=1 group gets NULL sample moments") {
    val df = Seq(("g", 1.0, 2.0)).toDF("g", "x", "y")
    val row = Stats.momentStats(df, Seq(col("g")), col("x"), col("y")).collect().head
    assert(row.isNullAt(row.fieldIndex("var_x")))
    assert(row.isNullAt(row.fieldIndex("corr_xy")))
    assert(row.getDouble(row.fieldIndex("mean_x")) == 1.0)
  }

  // ---- TextAnalysis.dedupBlocksAcrossDocs ---------------------------------

  test("dedupBlocksAcrossDocs drops later cross-doc occurrences, keeps first") {
    val docs = Seq(
      (1L, "a b c d x y z w"),        // blocks: "a b c d", "x y z w"
      (2L, "p q r s a b c d"),        // second block duplicates doc 1's first
      (3L, "a b c d a b c d"))        // both blocks already seen
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupBlocksAcrossDocs(docs, "doc_id", "text", blockTokens = 4)
      .orderBy("doc_id")
      .select("text_deduped", "n_dropped").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a b c d x y z w", 0L), ("p q r s", 1L), ("", 2L)), out.toString)
  }

  test("dedupBlocksAcrossDocs is a superset of within-doc dedup") {
    val docs = Seq((7L, "a b c d a b c d e f g h")).toDF("doc_id", "text")
    val within = TextAnalysis.dedupBlocksWithinDoc(docs, "doc_id", "text", 4)
      .select("text_deduped").as[String].head()
    val across = TextAnalysis.dedupBlocksAcrossDocs(docs, "doc_id", "text", 4)
      .select("text_deduped").as[String].head()
    assert(within == across, "single-doc corpus: the two cleaners must agree")
    assert(across == "a b c d e f g h")
  }

  test("timeWeightedAvg holds values across gaps where plain AVG overweights bursts") {
    // value 10 holds from t=0 to the burst's first reading at t=101, then a
    // 10-reading burst of value 0 over 101..110: TWA = 10·101/110 ≈ 9.18 —
    // where plain AVG = 10/11 ≈ 0.91 lets the burst dominate
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val rows = ((1L, at(0), 10.0) +:
      (1 to 10).map(i => (i + 1L, at(100 + i), 0.0))).map { case (id, ts, v) => (1L, id, ts, v) }
    val df = rows.toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeries.timeWeightedAvg(df, "user_id", "ts", "value", "event_id")
      .collect().head
    assert(out.getAs[Long]("n_segments") == 10L)
    assert(out.getAs[Long]("span_us") == 110L * 1000000L)
    assert(out.getAs[Double]("twa") == math.rint(10.0 * 101 / 110 * 1e6) / 1e6,
      s"twa = ${out.getAs[Double]("twa")}")
    // zero-span key (simultaneous observations) is dropped, not 0/0
    val same = Seq((2L, 1L, at(0), 5.0), (2L, 2L, at(0), 7.0))
      .toDF("user_id", "event_id", "ts", "value")
    assert(TimeSeries.timeWeightedAvg(same, "user_id", "ts", "value", "event_id").count() == 0L)
  }

  test("triangleCounts equals the naive all-triples reference on a random graph") {
    // deterministic pseudo-random sparse graph: 40 nodes, ~120 edges
    val rng = new scala.util.Random(7)
    val raw = Seq.fill(160)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    val edges = raw.toDF("u", "v")
    val got = Graphs.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive reference: adjacency set, check all C(n,3) triples
    val adj = raw.filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val nodes = adj.map(_._1).toSeq.sorted
    val triples = for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if adj((i, j)) && adj((j, k)) && adj((i, k))
    } yield Seq(i, j, k)
    val naive = triples.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(got == naive, s"got $got\nnaive $naive")
  }

  test("triangleCounts: orientation caps wedge fan-out under a star hot node") {
    // star center 0 connected to 1..30 (hub degree 30) plus one triangle
    // 1-2-0: naive wedge join at the hub generates C(30,2)=435 candidates;
    // oriented, the hub is every edge's TARGET (max degree), so its
    // out-degree is 0 and the only wedges come from low-degree corners.
    val star = (1 to 30).map(i => (0L, i.toLong))
    val edges = (star :+ ((1L, 2L))).toDF("u", "v")
    val got = Graphs.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), got.toString)
  }

  test("triangleCounts lifecycle knobs: count hint + uncached stay value-identical and lazy") {
    val rng = new scala.util.Random(11)
    val edges = Seq.fill(120)((rng.nextInt(30).toLong, rng.nextInt(30).toLong)).toDF("u", "v")
    val base = Graphs.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hinted-broadcast, hinted-shuffle, and uncached paths all agree
    val hintedBc = Graphs.triangleCounts(edges, orientedEdgeCountHint = Some(100L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hintedShuffle = Graphs.triangleCounts(edges,
        closureBroadcastMaxEdges = 1L, orientedEdgeCountHint = Some(100L), cacheOriented = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hintedBc == base && hintedShuffle == base)
    // with a hint and no cache, DEFINING the frame runs no Spark job —
    // plan-only callers (explain/plan audits) stay free
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val lazyDf = Graphs.triangleCounts(edges, orientedEdgeCountHint = Some(100L),
      cacheOriented = false)
    lazyDf.queryExecution.executedPlan // force planning, not execution
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, s"plan-only call launched ${after - before} job(s)")
  }

  test("psiDrift: ~0 on identical slices, large on a planted shift, finite on an empty slice") {
    // same distribution in both slices: PSI ≈ 0 (exactly 0 up to smoothing
    // asymmetry when totals match)
    val same = (1 to 1000).map(i => ("a", (i % 10) * 10.0 + 5.0, i <= 500)).toDF("g", "v", "ref")
    val psiSame = Stats.psiDrift(same, "g", col("v"), col("ref"),
        lo = BigDecimal(0), width = BigDecimal(10), nbins = 10)
      .select("psi").as[Double].head()
    assert(math.abs(psiSame) < 0.001, s"identical slices scored $psiSame")
    // planted shift: reference mass in bins 0-4, comparison in bins 5-9
    val shifted = ((1 to 500).map(i => ("a", (i % 5) * 10.0 + 5.0, true)) ++
      (1 to 500).map(i => ("a", 50.0 + (i % 5) * 10.0 + 5.0, false))).toDF("g", "v", "ref")
    val psiShift = Stats.psiDrift(shifted, "g", col("v"), col("ref"),
        lo = BigDecimal(0), width = BigDecimal(10), nbins = 10)
      .select("psi").as[Double].head()
    assert(psiShift > 1.0, s"full shift scored only $psiShift")
    // one slice empty: Laplace smoothing keeps every term finite
    val oneSided = (1 to 100).map(i => ("a", i.toDouble, true)).toDF("g", "v", "ref")
    val psiOne = Stats.psiDrift(oneSided, "g", col("v"), col("ref"),
        lo = BigDecimal(0), width = BigDecimal(10), nbins = 10)
      .select("psi").as[Double].head()
    assert(!psiOne.isNaN && !psiOne.isInfinite, s"empty slice produced $psiOne")
  }

  test("exactMedianByValue: odd/even interpolation, duplicates, equals Spark's percentile(0.5)") {
    val hand = Seq(
      ("odd", 1.0), ("odd", 2.0), ("odd", 9.0),            // median 2.0
      ("even", 1.0), ("even", 2.0), ("even", 3.0), ("even", 10.0), // (2+3)/2
      ("dup", 5.0), ("dup", 5.0), ("dup", 5.0), ("dup", 7.0)       // middles both 5
    ).toDF("g", "v")
    val got = Stats.exactMedianByValue(hand, Seq(col("g")), col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map("odd" -> (3L, 2.0), "even" -> (4L, 2.5), "dup" -> (4L, 5.0)), got.toString)
    // random cross-check vs Spark's exact percentile (which buffers values)
    val rnd = new scala.util.Random(7)
    val data = (1 to 500).map(_ => (s"g${rnd.nextInt(3)}",
      math.round(rnd.nextDouble() * 10000) / 100.0)).toDF("g", "v")
    val ours = Stats.exactMedianByValue(data, Seq(col("g")), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ref = data.groupBy("g").agg(expr("percentile(v, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.foreach { case (g, m) =>
      assert(math.abs(m - ref(g)) < 1e-9, s"$g: value-space $m vs percentile ${ref(g)}")
    }
  }

  test("chiSquareDrift: exact on a hand table, ~0 for identical mixes, large for a flip") {
    // hand 2x2 table: ref (30 a, 10 b), cmp (10 a, 30 b)
    // E(a,ref)=E(a,cmp)=20 etc.; chi2 = 4 * (10^2/20) = 20
    val hand = (Seq.fill(30)(("a", true)) ++ Seq.fill(10)(("b", true)) ++
      Seq.fill(10)(("a", false)) ++ Seq.fill(30)(("b", false))).toDF("cat", "ref")
    val r = Stats.chiSquareDrift(hand, col("cat"), col("ref")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 40 && r.getLong(2) == 40)
    assert(math.abs(r.getDouble(3) - 20.0) < 1e-6, s"chi2 ${r.getDouble(3)}")
    assert(r.getLong(4) == 1)
    // identical mixes: chi2 exactly 0
    val same = (Seq.fill(25)(("a", true)) ++ Seq.fill(25)(("a", false)) ++
      Seq.fill(15)(("b", true)) ++ Seq.fill(15)(("b", false))).toDF("cat", "ref")
    assert(Stats.chiSquareDrift(same, col("cat"), col("ref"))
      .collect().head.getDouble(3) == 0.0)
  }

  test("ksDrift: hand CDFs, 0 for identical slices, 1 for disjoint, NULL one-sided") {
    // ref {1,2,3} vs cmp {2,3,4}: max CDF gap is 1/3 (at every step)
    val hand = (Seq((1.0, true), (2.0, true), (3.0, true)) ++
      Seq((2.0, false), (3.0, false), (4.0, false)))
      .map { case (v, r) => ("g", v, r) }.toDF("g", "v", "ref")
    val h = Stats.ksDrift(hand, "g", col("v"), col("ref")).collect().head
    assert(h.getLong(1) == 3 && h.getLong(2) == 3)
    assert(math.abs(h.getDouble(3) - 1.0 / 3.0) < 1e-6, s"ks ${h.getDouble(3)}")
    // identical multisets: D exactly 0
    val same = (1 to 200).map(i => ("g", (i % 20).toDouble, i <= 100)).toDF("g", "v", "ref")
    assert(Stats.ksDrift(same, "g", col("v"), col("ref"))
      .collect().head.getDouble(3) == 0.0)
    // disjoint supports: D exactly 1
    val disj = ((1 to 50).map(i => ("g", i.toDouble, true)) ++
      (1 to 50).map(i => ("g", 1000.0 + i, false))).toDF("g", "v", "ref")
    assert(Stats.ksDrift(disj, "g", col("v"), col("ref"))
      .collect().head.getDouble(3) == 1.0)
    // a group with an empty slice has no comparison: ks_d is NULL
    val oneSided = (1 to 10).map(i => ("g", i.toDouble, true)).toDF("g", "v", "ref")
    assert(Stats.ksDrift(oneSided, "g", col("v"), col("ref")).collect().head.isNullAt(3))
  }

  test("mutualInfo: ~0 when independent, NMI=1 when deterministic, exact on a hand table") {
    // independent uniform 4x4 grid: every cell count equal -> MI exactly 0
    val indep = (0 until 1600).map(i => (s"x${i % 4}", s"y${(i / 4) % 4}")).toDF("x", "y")
    val ri = Stats.mutualInfo(indep, col("x"), col("y")).collect().head
    assert(ri.getLong(0) == 1600 && ri.getLong(1) == 4 && ri.getLong(2) == 4)
    assert(math.abs(ri.getDouble(3)) < 1e-9, s"independent MI ${ri.getDouble(3)}")
    // y determined by x (bijection): MI = H(X), NMI = 1
    val det = (0 until 900).map(i => (s"x${i % 3}", s"y${i % 3}")).toDF("x", "y")
    val rd = Stats.mutualInfo(det, col("x"), col("y")).collect().head
    assert(math.abs(rd.getDouble(3) - math.log(3.0)) < 1e-6, s"MI ${rd.getDouble(3)}")
    assert(math.abs(rd.getDouble(4) - 1.0) < 1e-6, s"NMI ${rd.getDouble(4)}")
    // hand 2x2: cells (a,p)=40 (a,q)=10 (b,p)=10 (b,q)=40, n=100
    val hand = (Seq.fill(40)(("a", "p")) ++ Seq.fill(10)(("a", "q")) ++
      Seq.fill(10)(("b", "p")) ++ Seq.fill(40)(("b", "q"))).toDF("x", "y")
    val want = 2 * (0.4 * math.log(0.4 / 0.25) + 0.1 * math.log(0.1 / 0.25))
    val rh = Stats.mutualInfo(hand, col("x"), col("y")).collect().head
    assert(math.abs(rh.getDouble(3) - want) < 1e-6, s"hand MI ${rh.getDouble(3)} want $want")
  }

  test("olsByGroup: exact fit recovered, NULLs on degenerate groups, matches regr_slope") {
    // perfect line y = 2x + 1 -> slope 2, intercept 1, r2 = 1
    val line = (1 to 50).map(i => ("fit", i.toDouble, 2.0 * i + 1.0)).toDF("g", "x", "y")
    val rl = Stats.olsByGroup(line, Seq(col("g")), col("x"), col("y")).collect().head
    assert(rl.getDouble(2) == 2.0 && rl.getDouble(3) == 1.0 && rl.getDouble(4) == 1.0,
      rl.toString)
    // constant x: dx = 0 -> all fit columns NULL; n = 1 likewise
    val degen = (Seq(("constx", 5.0, 1.0), ("constx", 5.0, 2.0), ("single", 1.0, 1.0)))
      .toDF("g", "x", "y")
    Stats.olsByGroup(degen, Seq(col("g")), col("x"), col("y")).collect().foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), r.toString)
    }
    // noisy data: agrees with Spark's own regr_slope/regr_intercept to 1e-6
    val rnd = new scala.util.Random(11)
    val noisy = (1 to 400).map { _ =>
      val x = math.round(rnd.nextDouble() * 1000) / 100.0
      ("g", x, math.round((3.0 * x + 7.0 + rnd.nextGaussian()) * 100) / 100.0)
    }.toDF("g", "x", "y")
    val ours = Stats.olsByGroup(noisy, Seq(col("g")), col("x"), col("y")).collect().head
    val ref = noisy.groupBy("g")
      .agg(expr("regr_slope(y, x)").as("s"), expr("regr_intercept(y, x)").as("i"))
      .collect().head
    assert(math.abs(ours.getDouble(2) - ref.getDouble(1)) < 1e-6)
    assert(math.abs(ours.getDouble(3) - ref.getDouble(2)) < 1e-6)
  }

  // ---- Graphs.hierarchyRollup ---------------------------------------------

  test("hierarchyRollup resolves root + depth over a mixed forest, incl. a deep chain") {
    // two trees + an 11-deep chain (forces the log-rounds path: 4 rounds
    // resolve depth ≤ 16, 3 would not)
    val parents = (Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(1L)), (4L, Some(2L)), // tree at 1
      (10L, None), (11L, Some(10L))) ++ // tree at 10
      (21L to 31L).map(n => (n, Some(n - 1))) ++ Seq((20L, None)) // chain 20..31
      ).toDF("node", "parent")
    val got = Graphs.hierarchyRollup(parents, rounds = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((1L, 0L)) && got(4L) == ((1L, 2L)) && got(3L) == ((1L, 1L)))
    assert(got(11L) == ((10L, 1L)))
    assert(got(20L) == ((20L, 0L)) && got(31L) == ((20L, 11L)))
    assert(got.size == parents.count())
  }

  test("hierarchyRollup is a stable fixpoint: extra rounds change nothing") {
    val parents = (3L to 200L).map(n => (n, Some(n / 3))).toDF("node", "parent")
      .union(Seq((1L, None: Option[Long]), (2L, None: Option[Long])).toDF("node", "parent"))
    val a = Graphs.hierarchyRollup(parents, rounds = 4).orderBy("node").collect().toSeq
    val b = Graphs.hierarchyRollup(parents, rounds = 9).orderBy("node").collect().toSeq
    assert(a == b)
    val roots = a.map(_.getLong(1)).toSet
    assert(roots == Set(1L, 2L)) // every n/3 chain terminates at root 1 or 2
  }

  test("hierarchyRollup validateParents fails fast on an orphaned parent instead of dropping rows") {
    // node 5's parent 99 never appears as a node: the default silently
    // drops 5 from the output; validation turns that into a fast error
    val malformed = Seq((1L, None), (2L, Some(1L)), (5L, Some(99L)))
      .toDF("node", "parent")
    val e = intercept[IllegalArgumentException] {
      Graphs.hierarchyRollup(malformed, rounds = 2, validateParents = true)
    }
    assert(e.getMessage.contains("parent"))
    // well-formed input is unchanged by validation
    val ok = Seq((1L, None), (2L, Some(1L)), (3L, Some(2L))).toDF("node", "parent")
    val plain = Graphs.hierarchyRollup(ok, rounds = 2).orderBy("node").collect().toSeq
    val checked = Graphs.hierarchyRollup(ok, rounds = 2, validateParents = true)
      .orderBy("node").collect().toSeq
    assert(plain == checked)
  }

  test("personalized PageRank: all-seeds degenerates to standard; seedless components stay 0") {
    import spark.implicits._
    // two disconnected components: a-b-c cycle and x-y pair
    val edges = Seq(("a","b"), ("b","c"), ("c","a"), ("x","y"), ("y","x"))
      .toDF("src", "dst")
    val allNodes = Seq("a","b","c","x","y").toDF("node")
    val std = Graphs.pageRankMicro(spark, edges, iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val allSeeded = Graphs.personalizedPageRankMicro(spark, edges, allNodes, iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(allSeeded == std, "teleporting to every node must equal standard PageRank")
    // seeds only in the cycle: the x-y component receives no mass at all
    val seeded = Graphs.personalizedPageRankMicro(spark, edges,
        Seq("a").toDF("node"), iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seeded("x") == 0L && seeded("y") == 0L, s"unreachable nodes must stay 0: $seeded")
    assert(seeded("a") > 0L && seeded("b") > 0L && seeded("c") > 0L)
  }

  // ---- Graphs.adamicAdar ---------------------------------------------------

  test("adamicAdar: hand-computed scores, adjacent pairs excluded, hub cap, orientation-proof") {
    // triangle 1-2-3 plus pendant 3-4: degrees 1:2, 2:2, 3:3, 4:1.
    // Only (1,4) and (2,4) are non-adjacent with a common neighbor (3)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val w3 = math.round(1e9 / math.log(3.0))
    val got = Graphs.adamicAdar(edges).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) ->
        (r.getAs[Long]("common_neighbors"), r.getAs[Long]("aa_e9"))).toMap
    assert(got == Map((1L, 4L) -> (1L, w3), (2L, 4L) -> (1L, w3)), got.toString)
    // a caller passing BOTH orientations must get the identical result
    // (degrees would otherwise double)
    val both = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val got2 = Graphs.adamicAdar(both).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) ->
        (r.getAs[Long]("common_neighbors"), r.getAs[Long]("aa_e9"))).toMap
    assert(got2 == got, "orientation normalization failed")
    // hub cap: with maxDegree = 2 the only wedge center (3, degree 3) is
    // excluded, so no pair survives
    assert(Graphs.adamicAdar(edges, maxDegree = 2).isEmpty)
    // two common neighbors SUM: square 1-2, 2-3, 3-4, 4-1 — (1,3) and
    // (2,4) each share two degree-2 neighbors
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    val w2 = math.round(1e9 / math.log(2.0))
    val gotSq = Graphs.adamicAdar(sq).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) ->
        (r.getAs[Long]("common_neighbors"), r.getAs[Long]("aa_e9"))).toMap
    assert(gotSq == Map((1L, 3L) -> (2L, 2 * w2), (2L, 4L) -> (2L, 2 * w2)), gotSq.toString)
  }
}
