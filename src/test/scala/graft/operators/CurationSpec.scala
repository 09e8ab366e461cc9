package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("rateThreshold quantizes to 3 hex digits; 1.0 keeps everything") {
    assert(Curation.rateThreshold(0.5) == "800")
    assert(Curation.rateThreshold(0.125) == "200")
    assert(Curation.rateThreshold(0.0) == "000")
    assert(Curation.rateThreshold(1.0) == "g")
    // every hex prefix sorts below "g"
    assert("fff" < "g")
    // rates that ROUND to 4096 must also keep-all: the 4-char "1000" would
    // sort below most 3-char prefixes and invert the filter to ~6% kept
    assert(Curation.rateThreshold(0.9999) == "g")
    assert(Curation.rateThreshold(0.99987) == "fff")
    val df = (1L to 400L).toDF("id")
    assert(Curation.hashSample(df, "id", 0.9999).count() == 400)
  }

  test("hashSample is deterministic and partition-layout-independent") {
    val df = (1L to 2000L).toDF("id")
    val a = Curation.hashSample(df, "id", 0.25).select("id").as[Long].collect().sorted
    val b = Curation.hashSample(df.repartition(13), "id", 0.25)
      .select("id").as[Long].collect().sorted
    assert(a.sameElements(b), "sample must not depend on partitioning")
    // rate lands near 25% (md5 prefix is uniform; 2000 draws, loose 5σ band)
    assert(math.abs(a.length / 2000.0 - 0.25) < 0.05, s"got ${a.length}/2000")
  }

  test("hashSample at rate 1.0 keeps all rows, at 0.0 none") {
    val df = (1L to 100L).toDF("id")
    assert(Curation.hashSample(df, "id", 1.0).count() == 100)
    assert(Curation.hashSample(df, "id", 0.0).count() == 0)
  }

  test("stratifiedSample bounds every stratum at n and is deterministic") {
    val df = Seq.tabulate(300)(i => (i.toLong, s"s${i % 3}")).toDF("id", "stratum")
    val s1 = Curation.stratifiedSample(df, "stratum", "id", 7)
    val counts = s1.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 7), counts.toString)
    val s2 = Curation.stratifiedSample(df.repartition(9), "stratum", "id", 7)
    assert(s1.select("id").as[Long].collect().sorted
      .sameElements(s2.select("id").as[Long].collect().sorted))
  }

  test("weightedMix is a whitelist: unlisted strata drop, rate-1.0 strata keep all") {
    val df = Seq.tabulate(400)(i => (i.toLong, if (i % 2 == 0) "keep" else "other"))
      .toDF("id", "stratum")
    val mixed = Curation.weightedMix(df, "stratum", "id", Seq("keep" -> 1.0))
    val kept = mixed.select("stratum").distinct().as[String].collect()
    assert(kept.toSeq == Seq("keep"))
    assert(mixed.count() == 200)
  }

  test("hashShard is key-type-agnostic, nonnegative, and covers all shards") {
    val nums = (1L to 500L).toDF("k")
      .select(Curation.hashShard($"k", 8).as("s")).as[Int].collect()
    val strs = (1L to 500L).map(_.toString).toDF("k")
      .select(Curation.hashShard($"k", 8).as("s")).as[Int].collect()
    // md5 runs over the key's string form, so 42L and "42" shard identically
    assert(nums.sameElements(strs), "shard must be a function of the key's string form")
    assert(nums.forall(s => s >= 0 && s < 8))
    assert(nums.distinct.sorted.toSeq == (0 until 8), "all shards reachable")
    // negative numeric keys — the case raw `key % shards` gets wrong — stay in range
    val negs = (-200L to -1L).toDF("k")
      .select(Curation.hashShard($"k", 8).as("s")).as[Int].collect()
    assert(negs.forall(s => s >= 0 && s < 8))
    // shard counts past the old 16-bit ceiling are accepted and in range
    val big = (1L to 50L).toDF("k")
      .select(Curation.hashShard($"k", 1000000).as("s")).as[Int].collect()
    assert(big.forall(s => s >= 0 && s < 1000000))
  }

  test("curation ops reject inputs that already carry their working columns") {
    val df = Seq((1L, "a", 5L)).toDF("id", "stratum", "doc_tokens")
    val e = intercept[IllegalArgumentException] {
      Curation.tokenQuotaMix(df, "stratum", "id", lit(1L), Seq("a" -> 10L))
    }
    assert(e.getMessage.contains("doc_tokens"))
    val df2 = Seq((1L, "a", 3)).toDF("id", "stratum", "sample_rank")
    intercept[IllegalArgumentException] {
      Curation.stratifiedSample(df2, "stratum", "id", 2)
    }
  }

  test("tokenOutCol reroutes token output so doc_tokens-carrying inputs pass") {
    val df = Seq((1L, "a", 5L), (2L, "a", 5L)).toDF("id", "stratum", "doc_tokens")
    val mixed = Curation.tokenQuotaMix(df, "stratum", "id", lit(1L), Seq("a" -> 10L),
      tokenOutCol = "mix_tokens")
    assert(mixed.columns.contains("mix_tokens") && mixed.columns.contains("doc_tokens"))
    assert(mixed.count() == 2)
    val packed = Curation.packSequences(df, "id", lit(1L), budget = 10, shards = 2,
      tokenOutCol = "pack_tokens")
    assert(packed.columns.contains("pack_tokens"))
    assert(packed.count() == 2)
  }

  test("packSequences: bins respect the budget cut and partition the shard") {
    val df = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    val packed = Curation.packSequences(df, "doc_id", lit(30L), budget = 100, shards = 4)
      .select($"shard".cast("long"), $"bin", $"doc_tokens", $"running")
      .as[(Long, Long, Long, Long)].collect()
    // a doc's bin is determined by the running total BEFORE it
    packed.foreach { case (_, bin, tok, running) =>
      assert(bin == (running - tok) / 100, s"bin mismatch: $bin vs ${(running - tok) / 100}")
    }
    // a non-final bin closes only once its last doc's running total crosses
    // the next budget boundary (greedy cut contract: bins cannot stay open
    // past the line, so underfill is bounded by one doc's tokens)
    val byShard = packed.groupBy(_._1)
    byShard.foreach { case (_, rows) =>
      val bins = rows.groupBy(_._2)
      val last = bins.keys.max
      bins.filter(_._1 < last).foreach { case (b, docs) =>
        val lastRunning = docs.map(_._4).max
        assert(lastRunning >= (b + 1) * 100,
          s"non-final bin $b closed at running=$lastRunning before the boundary")
      }
    }
  }

  test("tokenQuotaMix fills each quota within one doc's overshoot; small strata give all") {
    val df = Seq.tabulate(120)(i => (i.toLong, s"s${i % 3}", 10L + i % 7))
      .toDF("id", "stratum", "tok")
    // s0/s1 hold ~40 docs × ~13 tokens ≈ 520 tokens; quota 200 binds.
    // s2's quota (100000) exceeds its supply → everything kept.
    val quotas = Seq("s0" -> 200L, "s1" -> 200L, "s2" -> 100000L)
    val mixed = Curation.tokenQuotaMix(df, "stratum", "id", col("tok"), quotas)
      .groupBy($"stratum").agg(sum($"doc_tokens").as("t"), max($"doc_tokens").as("m"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    Seq("s0", "s1").foreach { s =>
      val (tot, maxDoc) = mixed(s)
      assert(tot >= 200 && tot < 200 + maxDoc, s"$s: $tot not in [200, 200+$maxDoc)")
    }
    val supply2 = df.filter($"stratum" === "s2").agg(sum($"tok")).as[Long].head()
    assert(mixed("s2")._1 == supply2, "under-supplied stratum must contribute everything")
  }

  test("connectedComponents resolves a chain (multi-iteration) and isolates") {
    // chain 1-2-3-4-5 forces label 1 to propagate over several iterations;
    // 10-11 is a separate component; pair input uses id_a < id_b
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Curation.connectedComponents(pairs)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (10L, 10L), (11L, 10L)))
  }

  test("hashSplit: total, disjoint, partition-independent, and consistent with hashSample") {
    val df = (1 to 4000).map(i => (i.toLong, s"doc$i")).toDF("doc_id", "payload")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = Curation.hashSplit(df, "doc_id", splits)
    // total + disjoint: every row gets exactly one label, none fall to 'rest'
    val byLabel = labeled.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel.values.sum == 4000L)
    // ~80/10/10 within quantization + hash noise
    assert(byLabel("train") > 3000 && byLabel("val") > 250 && byLabel("test") > 250, byLabel)
    // partition-layout independence
    val relabeled = Curation.hashSplit(df.repartition(17), "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val first = labeled.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(relabeled == first)
    // the train split IS the 0.8 hash sample (same thresholds, same keys)
    val train = labeled.filter($"split" === "train").select($"doc_id").as[Long].collect().toSet
    val sampled = Curation.hashSample(df, "doc_id", 0.8).select($"doc_id").as[Long].collect().toSet
    assert(train == sampled)
  }

  test("quality keeper picks the cluster's best-quality doc, not the min id") {
    // three near-identical docs; doc 3 carries extra stopwords → highest
    // t03 quality score, so the keeper must be 3 even though min id is 1
    val base = "spark engines process large analytic workloads with columnar storage layers"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),
      (3L, base + " the of and to in is it that for a")
    ).toDF("doc_id", "text")
    val labels = Curation.connectedComponents(
      graft.operators.Dedup.lshNearDupPairs(docs, "doc_id", "text", 0.5))
    assert(labels.count() == 3, "fixture docs must form one 3-member cluster")
    val quality = docs.select($"doc_id".as("member_id"),
      graft.operators.TextAnalysis.qualityScore($"text").as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster_id").orderBy($"quality".desc, $"member_id".asc)
    val keeper = labels.join(quality, "member_id")
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"member_id").as[Long].head()
    assert(keeper == 3L, s"expected quality argmax 3, got $keeper")
  }

  test("adaptiveThreshold keeps each stratum's rows at or above its own quantile") {
    // stratum x: values 1..5, median 3 → keep {3,4,5};
    // stratum y: values 10..13, median 11.5 → keep {12,13} — per-stratum
    // cutoffs, not a global one (a global median would gate x entirely away)
    val df = (Seq(("x", _: Int)).flatMap(f => (1 to 5).map(f)) ++
      (10 to 13).map(v => ("y", v))).toDF("stratum", "v")
    val kept = Curation.adaptiveThreshold(df, "stratum", $"v", 0.5)
      .select($"stratum", $"v").as[(String, Int)].collect().toSet
    assert(kept == Set(("x", 3), ("x", 4), ("x", 5), ("y", 12), ("y", 13)))
  }

  test("adaptiveThreshold rejects inputs already carrying the threshold column") {
    val df = Seq(("x", 1, 0.0)).toDF("stratum", "v", "stratum_threshold")
    val e = intercept[IllegalArgumentException](
      Curation.adaptiveThreshold(df, "stratum", $"v", 0.5))
    assert(e.getMessage.contains("stratum_threshold"))
  }

  test("star contraction equals label propagation on random graph families") {
    val rnd = new scala.util.Random(99)
    def check(pairs: Seq[(Long, Long)], tag: String): Unit = {
      val df = pairs.toDF("id_a", "id_b")
      val star = Curation.connectedComponents(df)
        .as[(Long, Long)].collect().sorted.toSeq
      val prop = Curation.connectedComponentsPropagation(df, maxIter = 200)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(star == prop, s"$tag: star=$star prop=$prop")
    }
    // deep chain (the propagation worst case — star closes it in ~log rounds)
    check((1L until 60L).map(i => (i, i + 1)), "chain-60")
    // clique + isolated pair + star
    check((1L to 8L).combinations(2).map(s => (s(0), s(1))).toSeq ++
      Seq((100L, 101L)) ++ (21L to 25L).map(i => (20L, i)), "clique+pair+star")
    // random sparse graphs
    for (round <- 1 to 4) {
      val n = 40 + rnd.nextInt(40)
      val edges = (1 to n).map(_ =>
        (1L + rnd.nextInt(30).toLong, 1L + rnd.nextInt(30).toLong))
        .filter(p => p._1 != p._2)
      check(edges, s"random-$round")
    }
  }

  test("connectedComponents merges components discovered through a late bridge") {
    // two stars 1-{2,3} and 7-{8,9} bridged by 3-9: one component, min 1
    val pairs = Seq((1L, 2L), (1L, 3L), (7L, 8L), (7L, 9L), (3L, 9L))
      .toDF("id_a", "id_b")
    val labels = Curation.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(labels.map(_._2).distinct.toSeq == Seq(1L))
    assert(labels.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L, 7L, 8L, 9L))
  }

  test("temperature mix: exact sqrt-share targets, flattening, prefix stability") {
    // counts 400/100/25 → √ weights 20/10/5 → shares 4/7, 2/7, 1/7
    val df = ((1 to 400).map(i => (i.toLong, "A")) ++
      (401 to 500).map(i => (i.toLong, "B")) ++
      (501 to 525).map(i => (i.toLong, "C"))).toDF("doc_id", "source")
    val got = Curation.temperatureMix(df, "source", "doc_id", 70L)
      .select("doc_id", "source").as[(Long, String)].collect()
    val bySrc = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bySrc("A").size == 40 && bySrc("B").size == 20 && bySrc("C").size == 10)
    // flattening: head share shrinks (400/525 → 4/7), tail share grows
    assert(40.0 / 70 < 400.0 / 525 && 10.0 / 70 > 25.0 / 525)
    // monotone prefix: a bigger budget keeps everything the smaller one chose
    val bigger = Curation.temperatureMix(df, "source", "doc_id", 140L)
      .select("doc_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet.subsetOf(bigger))
    // deterministic rerun
    val again = Curation.temperatureMix(df, "source", "doc_id", 70L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got.map(_._1).toSet)
  }

  test("k-anonymity audit flags exactly the sub-k quasi-identifier groups") {
    val df = (Seq.fill(5)(("en", "web")) ++ Seq.fill(2)(("de", "web")) ++
      Seq(("fr", "book"))).toDF("lang", "source")
    val got = Curation.kAnonymityAudit(df, Seq("lang", "source"), 3)
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("en", "web", 5L, false),
      ("de", "web", 2L, true),
      ("fr", "book", 1L, true)))
    // enforcement: suppression leaves a k-anonymous frame (only en/web)
    val released = Curation.kAnonymitySuppress(df, Seq("lang", "source"), 3)
      .as[(String, String)].collect()
    assert(released.length == 5 && released.forall(_ == (("en", "web"))))
    val reAudit = Curation.kAnonymityAudit(
      Curation.kAnonymitySuppress(df, Seq("lang", "source"), 3), Seq("lang", "source"), 3)
      .filter(col("at_risk")).count()
    assert(reAudit == 0L)
  }

  test("weightedSample: no duplicates, k rows, partition-layout independent") {
    val df = (1 to 500).map(i => (i.toLong, (i % 10) + 1)).toDF("id", "w")
    val a = Curation.weightedSample(df, "id", col("w"), 50)
      .select("id").as[Long].collect().toSeq
    assert(a.length == 50 && a.distinct.length == 50)
    val b = Curation.weightedSample(df.repartition(13), "id", col("w"), 50)
      .select("id").as[Long].collect().toSeq
    assert(a.sorted == b.sorted, "selection must not depend on layout")
  }

  test("weightedSample favors heavy rows (A-ES bias check)") {
    // two weight classes, 10:1 — the heavy half must dominate the sample
    // far beyond its 50% population share (E[share] ≈ 10/11)
    val df = (1 to 1000).map(i => (i.toLong, if (i <= 500) 10L else 1L)).toDF("id", "w")
    val heavy = Curation.weightedSample(df, "id", col("w"), 200)
      .filter(col("id") <= 500).count()
    assert(heavy >= 150, s"heavy class got $heavy of 200 — not plausibly ∝ weight")
  }

  test("lDiversityAudit flags large-but-uniform groups k-anonymity misses") {
    // group (en, web): 5 rows (k-anonymous at k=3) but ONE sensitive value
    // → l-diversity must flag it; (de, web): 3 rows, 3 distinct values → ok
    val df = (Seq.fill(5)(("en", "web", 1L)) ++
      Seq(("de", "web", 1L), ("de", "web", 2L), ("de", "web", 3L)))
      .toDF("lang", "source", "band")
    val got = Curation.lDiversityAudit(df, Seq("lang", "source"), col("band"), 3)
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("en", "web", 5L, 1L, true),
      ("de", "web", 3L, 3L, false)))
  }

  test("weightedSample rejects k <= 0 and a preexisting score column") {
    val df = Seq((1L, 1L)).toDF("id", "w")
    intercept[IllegalArgumentException] {
      Curation.weightedSample(df, "id", col("w"), 0)
    }
    intercept[IllegalArgumentException] {
      Curation.weightedSample(df.withColumn("es_score", lit(0.0)), "id", col("w"), 1)
    }
  }

  test("epochMix: full epochs exact, fractional epoch ~rate, zero-epoch strata absent") {
    val docs = (1 to 2000).map(i => (i.toLong, s"s${i % 4}")).toDF("doc_id", "source")
    val recipe = Seq("s0" -> 2500, "s1" -> 1000, "s2" -> 500, "s3" -> 0)
    val out = Curation.epochMix(docs, "source", "doc_id", recipe).cache()
    val perDoc = out.groupBy(col("doc_id"), col("source")).count()
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    // every emitted doc count is floor(epochs) or floor+1 for its stratum
    perDoc.foreach { case (s2, n) =>
      val full = recipe.toMap.apply(s2) / 1000
      assert(n == full || n == full + 1, s"$s2: $n copies")
    }
    assert(!perDoc.exists(_._1 == "s3"), "zero-epoch stratum leaked rows")
    // fractional mass: s0 has 500 docs at 2.5 epochs -> E[extra] = 250;
    // the md5 rule is a fixed deterministic sample, just bound it loosely
    val s0Extra = perDoc.count { case (s2, n) => s2 == "s0" && n == 3 }
    assert(s0Extra > 175 && s0Extra < 325, s"s0 fractional epoch count $s0Extra")
    // s1 (exactly 1.0 epochs) must emit exactly one copy per doc
    assert(perDoc.filter(_._1 == "s1").forall(_._2 == 1L))
    // deterministic under partition layout
    val again = Curation.epochMix(docs.repartition(13), "source", "doc_id", recipe)
      .select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = out.select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first == again, "epoch selection changed with partitioning")
  }

  test("negativePairs: no self-pairs, bounded count, balanced usage, layout-invariant") {
    val docs = (1 to 400).map(_.toLong).toDF("doc_id")
    val pairs = Curation.negativePairs(docs, "doc_id", k = 3, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(pairs.forall { case (a, _, n) => a != n }, "self-pair emitted")
    val perAnchor = pairs.groupBy(_._1).map(_._2.size)
    assert(perAnchor.forall(_ <= 3) && perAnchor.sum > 1100,
      s"anchor negative counts off: ${perAnchor.toSeq.distinct}")
    // ring shifts use every row as a negative ~k times (balanced usage —
    // the property independent random sampling lacks)
    val usage = pairs.groupBy(_._3).map(_._2.size)
    assert(usage.max <= 6, s"some row over-used as negative: ${usage.max}")
    // deterministic under partition layout
    val again = Curation.negativePairs(docs.repartition(7), "doc_id", k = 3, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == pairs.toSet, "pairing changed with partitioning")
    // degenerate buckets: with n=1 per bucket every candidate is a
    // self-pair and must vanish, not surface
    val tiny = Seq(1L).toDF("doc_id")
    assert(Curation.negativePairs(tiny, "doc_id", k = 3, buckets = 8).count() == 0)
  }

  test("importanceResample prefers target-typical docs and is layout-stable") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha", true),
      (2L, "alpha alpha beta beta alpha", true),
      (3L, "gamma delta gamma delta gamma", false),
      (4L, "delta delta gamma gamma delta", false),
      (5L, "alpha beta alpha gamma alpha", false),
      (6L, "gamma delta delta delta gamma", false)
    ).toDF("doc_id", "text", "tgt")
    val scored = Curation.importanceResample(docs, "doc_id", "text",
      col("tgt"), k = 6, temperature = 0.05)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    // docs written in target vocabulary score above raw-only docs
    assert(scored(5L) > scored(6L), s"target-vocab doc must outscore: $scored")
    assert(scored(1L) > scored(3L), s"$scored")
    // k bounds the output; rank is 1..k
    val top2 = Curation.importanceResample(docs, "doc_id", "text", col("tgt"), k = 2)
    assert(top2.count() == 2)
    assert(top2.select("sample_rank").as[Int].collect().sorted.sameElements(Array(1, 2)))
    // deterministic under partition layout (scores AND selection)
    val again = Curation.importanceResample(docs.repartition(7), "doc_id", "text",
      col("tgt"), k = 6, temperature = 0.05)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(again == scored, "resample changed with partitioning")
  }

  test("importanceResample low temperature concentrates on high scores") {
    // 30 target-ish docs vs 30 raw-only; with tau → 0 the draw must pick
    // the score-ordered head (Gumbel noise is bounded; score/tau dominates)
    val docs = (1L to 30L).map(i => (i, "alpha beta alpha beta", i <= 15)) ++
      (31L to 60L).map(i => (i, "gamma delta gamma delta", false))
    val df = docs.toDF("doc_id", "text", "tgt")
    val picked = Curation.importanceResample(df, "doc_id", "text", col("tgt"),
      k = 10, temperature = 1e-6)
      .select("doc_id").as[Long].collect().toSet
    // all 10 winners come from the 30 alpha/beta docs (strictly higher score)
    assert(picked.forall(_ <= 30L), s"low-tau draw leaked low-score docs: $picked")
  }

  test("curationFunnel optional DSIR stage bounds the budget and matches a direct draw") {
    val docs = ((1L to 40L).map(i => (i, s"alpha beta alpha w$i", "en")) ++
      (41L to 80L).map(i => (i, s"gamma delta gamma w$i", "en"))).toDF("doc_id", "text", "lang")
    val isTgt = col("doc_id") <= 20L  // target = a subset of the alpha/beta docs
    val stages = Curation.curationFunnel(docs, Seq("en" -> 1.0), minJaccard = 0.99,
      minDistinctFrac = 0.0, maxTopBigramFrac = 1.0,
      dsirTarget = Some((isTgt, 25)))
    val names = stages.map(_._1)
    assert(names.contains("importance_resample"), names.toString)
    assert(names.last == "weighted_mix")
    val prev = stages(names.indexOf("importance_resample") - 1)._2
    val stage = stages(names.indexOf("importance_resample"))._2
    val stageIds = stage.select("doc_id").as[Long].collect().toSet
    assert(stageIds.size <= 25, s"budget exceeded: ${stageIds.size}")
    val prevIds = prev.select("doc_id").as[Long].collect().toSet
    assert(stageIds.subsetOf(prevIds), "stage must be a subset of its input")
    // matches a direct draw over the same input
    val direct = Curation.importanceResample(prev, "doc_id", "text", isTgt, 25)
      .select("doc_id").as[Long].collect().toSet
    assert(stageIds == direct, "funnel stage diverged from direct importanceResample")
    // stage rows keep the document schema (semi-join, not projection)
    assert(stage.columns.toSeq == docs.columns.toSeq)
  }

  test("leakage-safe split (c26): near-dup pairs never straddle splits; singletons match c14") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Graft.table(spark, dir, "documents")
    val out = graft.queries.CurationQueries.c26LeakageSafeSplit.run(spark, dir)
      .select("doc_id", "split_key", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == docs.count())
    // THE property: every LSH near-dup pair shares one split
    val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(out(a)._2 == out(b)._2, s"pair ($a,$b) split across ${out(a)._2}/${out(b)._2}")
    }
    // docs with no near-dup keep their own key, so they split exactly like c14
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val plain = Curation.hashSplit(docs.select(col("doc_id")), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filterNot(kv => paired(kv._1)).foreach { case (id, (key, split)) =>
      assert(key == id, s"singleton $id must represent itself")
      assert(split == plain(id), s"singleton $id diverged from the per-doc split")
    }
  }

  test("held-out backoff LM (t20): scores non-negative, short docs NULL, backoff branch exercised") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.TextQueries.t20BackoffXent.run(spark, dir).collect()
    assert(rows.length == 500)
    val scored = rows.filterNot(_.isNullAt(1)).map(r => r.getLong(0) -> r.getDouble(1))
    // -ln P of probabilities <= 1 on every branch
    scored.foreach { case (id, x) => assert(x >= 0.0, s"doc $id scored negative xent $x") }
    // the held-out half guarantees genuinely unseen bigrams: docs OUTSIDE
    // the train half must on average score worse than docs inside it
    val inTrain = graft.Graft.table(spark, dir, "documents")
      .filter(substring(Curation.hashKey(col("doc_id")), 1, 3) <
        lit(Curation.rateThreshold(0.5)))
      .select("doc_id").as[Long].collect().toSet
    val (tr, held) = scored.partition(kv => inTrain(kv._1))
    assert(tr.nonEmpty && held.nonEmpty)
    val trMean = tr.map(_._2).sum / tr.length
    val heldMean = held.map(_._2).sum / held.length
    assert(heldMean > trMean,
      s"held-out mean $heldMean should exceed train mean $trMean under a held-out model")
  }

  test("c27 corpus report: planted duplicates and languages produce exact rates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("c27spec").toString
    Seq(
      (1L, "alpha beta gamma", "en", "srcA", 16L),
      (2L, "alpha  beta   gamma", "de", "srcA", 19L),  // same after whitespace normalize
      (3L, "delta epsilon", "en", "srcA", 13L),
      (4L, "zeta", "en", "srcB", 4L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.CurationQueries.c27CorpusReport.run(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("srcA")
    assert(a.getAs[Long]("n_docs") == 3)
    assert(a.getAs[Long]("n_tokens") == 8)        // 3 + 3 + 2
    // docs 1 and 2 collide on the normalized fingerprint -> 1 dup of 3
    assert(math.abs(a.getAs[Double]("exact_dup_rate") - 1.0 / 3.0) < 1e-6)
    assert(a.getAs[Long]("n_langs") == 2)
    val b = rows("srcB")
    assert(b.getAs[Long]("n_docs") == 1 && b.getAs[Double]("exact_dup_rate") == 0.0)
  }

  test("t21 fertility: a pure alpha-word corpus has fertility exactly 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t21spec").toString
    Seq(
      (1L, "alpha beta gamma", "en", "s", 16L),
      (2L, "delta epsilon", "en", "s", 13L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.TextQueries.t21TokenizerFertility.run(spark, dir).collect()
    assert(r.length == 1)
    // every whitespace word is one [A-Za-z]+ run -> bpe tokens == words
    assert(r.head.getAs[Double]("fertility") == 1.0, r.head.toString)
    assert(r.head.getAs[Long]("bpe_tokens") == r.head.getAs[Long]("word_tokens"))
  }

  test("s13 filtered search: every returned neighbor satisfies the predicate") {
    val rows = graft.queries.SimilarityQueries.s13FilteredTopK
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val labels = graft.Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val n = r.getAs[Long]("neighbor_id")
      assert(labels(n) % 2 == 0, s"neighbor $n has odd label ${labels(n)}")
    }
  }

  test("training-data pipeline composition: funnel → epoch shuffle → span corruption → packing") {
    // the ops must CHAIN: curation survivors flow through the data-loader
    // ordering, the denoising objective, and token-budget packing with
    // conserved row counts and deterministic output — the end-to-end shape
    // a pretraining data pipeline runs nightly
    val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
    def chain() = {
      val survivors = Curation.curationFunnel(docs,
        weights = Seq(), minJaccard = 0.5,
        minDistinctFrac = 0.2, maxTopBigramFrac = 0.2)
        .collectFirst { case ("quality_filter", df) => df }.get
        .select(col("doc_id"), col("text"))
      val ordered = Curation.epochShuffle(survivors, "doc_id", epoch = 1L, numShards = 4)
      val corrupted = TextAnalysis.spanCorrupt(
        ordered.drop("shard", "pos_in_shard"), "doc_id", "text")
      val packed = Curation.packSequences(
        corrupted.select(col("doc_id"), col("n_tokens"), col("n_masked_tokens"),
          col("n_sentinels"),
          // packed length = corrupted-input tokens: unmasked + one sentinel
          // token per span
          (col("n_tokens") - col("n_masked_tokens") + col("n_sentinels")).as("len")),
        "doc_id", col("len"), budget = 256, shards = 4)
      (survivors, ordered, corrupted, packed)
    }
    val (survivors, ordered, corrupted, packed) = chain()
    val n = survivors.count()
    assert(n > 0 && n < docs.count(), "funnel must drop something and keep something")
    // row conservation through every stage
    assert(ordered.count() == n && corrupted.count() == n && packed.count() == n)
    // greedy-cut contract: every non-final bin's last running total crosses
    // its budget boundary (underfill bounded by one doc's tokens)
    val bins = packed.groupBy(col("shard"), col("bin"))
      .agg(max(col("running")).as("last_running")).collect()
    val lastBin = bins.groupBy(_.getAs[Int]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("bin")).max).toMap
    bins.foreach { r =>
      val (s, b, lr) = (r.getAs[Int]("shard"), r.getAs[Long]("bin"),
        r.getAs[Long]("last_running"))
      if (b != lastBin(s))
        assert(lr >= (b + 1) * 256, s"shard $s bin $b closed at running=$lr")
    }
    // deterministic end to end: the full chain reruns identically
    val again = chain()._4.collect().map(_.toString).sorted.toSeq
    assert(again == packed.collect().map(_.toString).sorted.toSeq)
  }

  test("epochShuffle: dense per-shard positions, epoch reshuffles, layout-invariant") {
    val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"))
    def run(epoch: Long, df: org.apache.spark.sql.DataFrame = docs) =
      Curation.epochShuffle(df, "doc_id", epoch, numShards = 8)
        .select("doc_id", "shard", "pos_in_shard").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val e1 = run(1L)
    // every doc exactly once, shards in range, positions dense per shard
    assert(e1.map(_._1).distinct.length == e1.length && e1.length == docs.count())
    e1.groupBy(_._2).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 8)
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length).toSeq,
        s"shard $shard positions not dense")
    }
    // deterministic: rerun and a different input layout give identical rows
    assert(run(1L).sortBy(_._1).toSeq == e1.sortBy(_._1).toSeq)
    assert(run(1L, docs.repartition(13)).sortBy(_._1).toSeq == e1.sortBy(_._1).toSeq)
    // a new epoch is a genuinely different permutation (shards AND order)
    val e2 = run(2L)
    val moved = e1.sortBy(_._1).zip(e2.sortBy(_._1))
      .count { case ((_, s1, p1), (_, s2, p2)) => s1 != s2 || p1 != p2 }
    assert(moved > e1.length / 2, s"epoch salt barely reshuffled ($moved moved)")
    // collision guard: an occupied output column name fails fast
    intercept[IllegalArgumentException] {
      Curation.epochShuffle(docs.withColumn("shard", lit(1)), "doc_id", 1L, 8)
    }
  }
  test("concatChunk: slices tile every chunk and every doc exactly; docs cross boundaries") {
    val docs = (1L to 120L).map { i =>
      // token counts 1..60, several docs far larger than the chunk size
      val n = (i % 60 + 1).toInt * (if (i % 17 == 0) 9 else 1)
      (i, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val L = 64
    val out = Curation.concatChunk(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), chunkTokens = L, shards = 4)
    val rows = out.select("shard", "doc_id", "doc_tokens", "seq_id", "doc_off",
        "chunk_off", "span")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // per (shard, seq): spans tile [0, L) exactly; only the shard's last
    // chunk may fall short
    rows.groupBy(t => (t._1, t._4)).foreach { case ((sh, seq), g) =>
      val slices = g.map(t => (t._6, t._7)).sortBy(_._1) // (chunk_off, span)
      assert(slices.head._1 == 0, s"shard $sh seq $seq does not start at 0")
      slices.sliding(2).foreach {
        case Array((o1, s1), (o2, _)) =>
          assert(o1 + s1 == o2, s"gap/overlap in shard $sh seq $seq")
        case _ =>
      }
      val total = slices.map(_._2).sum
      val lastSeq = rows.filter(_._1 == sh).map(_._4).max
      if (seq < lastSeq) assert(total == L, s"shard $sh seq $seq holds $total of $L")
      else assert(total <= L)
    }
    // per doc: slices tile [0, doc_tokens) contiguously across chunks
    rows.groupBy(_._2).foreach { case (doc, g) =>
      val slices = g.map(t => (t._5, t._7)).sortBy(_._1) // (doc_off, span)
      assert(slices.head._1 == 0, s"doc $doc does not start at offset 0")
      slices.sliding(2).foreach {
        case Array((o1, s1), (o2, _)) => assert(o1 + s1 == o2, s"doc $doc gap")
        case _ =>
      }
      assert(slices.map(_._2).sum == g.head._3, s"doc $doc slices do not sum to its tokens")
    }
    // the oversized docs really do cross chunk boundaries
    assert(rows.groupBy(_._2).exists(_._2.length >= 3),
      "no document spans 3+ chunks - fixture too small to prove crossing")
    // deterministic under repartitioning
    val again = Curation.concatChunk(docs.repartition(7), "doc_id",
      TextAnalysis.tokenCount(col("text")), chunkTokens = L, shards = 4)
      .select("shard", "doc_id", "seq_id", "doc_off", "chunk_off", "span")
      .collect().map(_.toSeq).toSet
    val first = out.select("shard", "doc_id", "seq_id", "doc_off", "chunk_off", "span")
      .collect().map(_.toSeq).toSet
    assert(again == first, "concatChunk depends on partition layout")
  }

}
