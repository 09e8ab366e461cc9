package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "  The quick   brown fox jumps over the lazy dog "), // ws/case variant
    (4L, "the quick brown fox jumps over the lazy cat"), // near dup
    (5L, "completely different content about spark engines")
  ).toDF("doc_id", "text")

  test("exact dedup groups whitespace/case-normalized duplicates, keeper = min id") {
    val groups = Dedup.exactDedupGroups(docs, "doc_id", "text").collect()
    val g = groups.find(_.getAs[Long]("dup_count") == 3L)
    assert(g.isDefined) // docs 1, 2, 3 share a fingerprint
    assert(g.get.getAs[Long]("keeper_id") == 1L)
    assert(groups.length == 3) // {1,2,3}, {4}, {5}
  }

  // this 5-doc fixture is 80% near-identical docs, so the production df cap
  // (drop shingles in > 50% of the corpus) would drop the very shingles the
  // semantics tests rely on — pass fraction 1.0 (= keep all) to test the
  // Jaccard math itself; the cap behavior has its own spec below
  test("jaccard pairs: exact duplicates score 1.0; near dups high; unrelated absent") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.3, maxDocFreqFraction = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 4L)) > 0.5 && pairs((1L, 4L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("df cap bounds candidates under a corpus-wide hot shingle") {
    // 20 docs, each with unique content plus one shingle-length marker
    // shared by ALL of them: uncapped, that one hot key alone generates all
    // 190 pairs; with the 50% df cap the hot shingle is dropped before the
    // self-join and only genuinely-similar docs pair up.
    val uniq = (1 to 18).map(i => (i.toLong, ('a' + i).toChar.toString * 30))
    val twins = Seq((100L, "identical twin payload text"), (101L, "identical twin payload text"))
    val hot = " COMMONTAG"
    val corpus = (uniq ++ twins).map { case (id, t) => (id, t + hot) }.toDF("doc_id", "text")

    val base = Dedup.shingleSets(corpus, "doc_id", "text")
    val uncapped = Dedup.cappedCandidatePairs(base, maxDocFreqFraction = 1.0).count()
    val capped = Dedup.cappedCandidatePairs(base, maxDocFreqFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == 190L) // hot shingle alone = all C(20,2) pairs
    assert(capped == Set((100L, 101L)), // twins still found via their rare shingles
      s"capped candidates should be exactly the twins, got $capped")
    // and the qualifying pair survives end-to-end with exact jaccard 1.0
    val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((100L, 101L)) == 1.0)
  }

  test("minhash signatures are deterministic and equal for identical shingle sets") {
    val sig = Dedup.minhashSignature(Dedup.shingleHashes(col("text")))
    val sigs = docs.select(col("doc_id"), sig.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(5L))
    assert(sigs(1L).length == Dedup.NumHashes)
  }

  test("LSH near-dup pairs are a subset of exact jaccard pairs at the same threshold") {
    val lsh = Dedup.lshNearDupPairs(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, maxDocFreqFraction = 1.0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((1L, 2L))) // identical docs always collide in every band
  }

  test("simhash: identical token multisets hash identically; disjoint texts differ") {
    val sh = Dedup.simhashFromTokens(TextAnalysis.tokens(col("text")))
    val hashes = docs.select(col("doc_id"), sh.as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L))
    assert(hashes(1L) != hashes(5L))
    // near-dup: small hamming distance (≤ 8 of 32 bits for a 1-token change)
    val ham = java.lang.Long.bitCount(hashes(1L) ^ hashes(4L))
    assert(ham <= 8, s"hamming distance $ham")
  }

  test("native simhash is bit-identical to the 32-fold HOF specification") {
    val fixture = docs.select(col("doc_id"), col("text"))
      .union(Seq((90L, ""), (91L, "   "), (92L, "one"),
        (93L, "répété répété unicode ünïcode")).toDF("doc_id", "text"))
    val native = Dedup.simhashFromTokens(TextAnalysis.tokens(col("text")))
    val hof = Dedup.simhash32Hof(transform(TextAnalysis.tokens(col("text")),
      t => Dedup.polyHashStr(t)))
    val rows = fixture.select(col("doc_id"), native.as("n"), hof.as("h")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: native ${r.getLong(1)} != hof ${r.getLong(2)}")
    }
  }

  test("portable polyHash matches an independent reimplementation") {
    val got = docs.select(Dedup.polyHashStr(col("text")).as("h"))
      .collect().map(_.getLong(0))
    def ref(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % Dedup.P)
    val want = docs.select("text").collect().map(r => ref(r.getString(0)))
    assert(got.toSeq == want.toSeq)
  }

  test("contamination scan flags verbatim benchmark leaks, not vocabulary overlap") {
    import spark.implicits._
    val benchDoc = "which of the following statements about photosynthesis is correct answer"
    val evalSet = Seq((100L, benchDoc)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, benchDoc + " padded with some training text around the leaked question"),
      // same vocabulary, different order — NOT verbatim, must stay clean
      (2L, "statements about correct photosynthesis answer the following of which is"),
      (3L, "entirely unrelated training document content")
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationScan(corpus, evalSet, "doc_id", "text")
      .withColumn("frac", col("eval_hits").cast("double") / col("n_shingles").cast("double"))
      .select($"doc_id", $"frac").as[(Long, Double)].collect().toMap
    assert(got(1L) > 0.2, s"leaked doc not flagged: ${got(1L)}")
    assert(got(2L) == 0.0, s"vocabulary overlap false-positive: ${got(2L)}")
    assert(got(3L) == 0.0)
  }

  test("containment finds a quoted snippet that symmetric Jaccard misses") {
    import spark.implicits._
    val snippet = "the unique quoted passage appears verbatim here"
    val bigHost = snippet + " " +
      (1 to 40).map(i => s"surrounding filler sentence number $i with extra words").mkString(" ")
    val fixture = Seq(
      (1L, snippet),               // small doc
      (2L, bigHost),               // contains the snippet verbatim
      (3L, "totally unrelated content about other things entirely")
    ).toDF("doc_id", "text")
    // symmetric Jaccard at 0.5 cannot see the pair (small ∩ big ≪ union)
    val jac = Dedup.jaccardPairs(fixture, "doc_id", "text", 0.5, maxDocFreqFraction = 1.0)
      .collect()
    assert(!jac.exists(r => Set(r.getLong(0), r.getLong(1)) == Set(1L, 2L)), jac.mkString)
    // containment sees it at ~1.0, with the small doc as the contained side
    val cont = Dedup.containmentPairs(fixture, "doc_id", "text", 0.9,
        maxDocFreqFraction = 1.0)
      .select($"contained_id", $"container_id", $"containment")
      .as[(Long, Long, Double)].collect()
    assert(cont.exists { case (c, h, v) => c == 1L && h == 2L && v >= 0.99 },
      cont.mkString(","))
  }

  test("cross-corpus LSH pairs batch docs against corpus only, matching the self-join") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different corpus content about spark engines"),
      (3L, "another unrelated corpus document entirely")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"), // dup of corpus 1
      (102L, "fresh never-seen-before batch material")
    ).toDF("doc_id", "text")
    val across = Dedup.lshNearDupPairsAcross(batch, corpus, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(across.map(p => (p._1, p._2)) == Seq((101L, 1L)), across.mkString(","))
    assert(across.head._3 == 1.0)
    // direction contract: id_a is always the batch side
    assert(across.forall(_._1 >= 100L))
    // and the pair set agrees with the self-join over the union, restricted
    // to cross pairs (the incremental run finds what the batch rerun would)
    val self = Dedup.lshNearDupPairs(batch.union(corpus), "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect()
      .collect { case (a, b, j) if (a >= 100L) != (b >= 100L) =>
        (math.max(a, b), math.min(a, b), j) }.toSeq
    assert(across == self, s"across=$across self=$self")
  }

  test("CDC chunking is shift-robust: a prepended edit keeps the pair; chunks are content-anchored") {
    import spark.implicits._
    val body = ("the quick brown fox jumps over the lazy dog while seventeen engineers " +
      "review a surprisingly long design document about distributed deduplication ") * 4
    val corpus = Seq(
      (1L, body),
      (2L, "COMPLETELY NOVEL PREPENDED HEADER SECTION >> " + body), // head insertion
      (3L, "unrelated content that shares no chunks with anything else here at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.cdcNearDupPairs(corpus, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), pairs.mkString(","))
    assert(pairs.head._3 >= 0.5, s"insertion should keep most chunks: ${pairs.head._3}")
    // chunk boundaries are a pure function of content
    val sets = corpus.select($"doc_id", Dedup.cdcChunkHashes($"text").as("h"))
      .union(corpus.repartition(7).select($"doc_id", Dedup.cdcChunkHashes($"text").as("h")))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).groupBy(_._1)
    assert(sets.values.forall(v => v.map(_._2).distinct.size == 1))
  }

  test("native CDC chunking is bit-identical to the HOF specification") {
    import spark.implicits._
    val fixture = (docs.select(col("text")) union Seq("", " ", "short", "x" * 15, "y" * 16,
      "boundary probing content " * 40).toDF("text")).collect().map(_.getString(0))
    val df = fixture.toSeq.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select(
        Dedup.cdcChunkHashes($"text").as("native"),
        Dedup.cdcChunkHashesHof($"text").as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"native ${r.getSeq[Long](0)} != hof ${r.getSeq[Long](1)}")
    }
  }

  test("probing the at-rest index equals the recompute-everything cross join") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different corpus content about spark engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog and cat"),
      (102L, "fresh never-seen-before batch material")
    ).toDF("doc_id", "text")
    val base = Dedup.shingleSets(corpus, "doc_id", "text")
    val viaIndex = Dedup.lshNearDupPairsAgainstIndex(batch, "doc_id", "text",
        Dedup.bandPostings(base), base, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val recompute = Dedup.lshNearDupPairsAcross(batch, corpus, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaIndex == recompute && viaIndex.nonEmpty, s"index=$viaIndex recompute=$recompute")
  }

  test("bloomContaminationScan is bit-identical to the exact scan (no false negatives)") {
    import spark.implicits._
    val benchDoc = "which of the following statements about photosynthesis is correct answer"
    val evalSet = Seq((100L, benchDoc)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, benchDoc + " padded with some training text around the leaked question"),
      (2L, "statements about correct photosynthesis answer the following of which is"),
      (3L, "entirely unrelated training document content")
    ).toDF("doc_id", "text")
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").as[(Long, Int, Long)].collect().toSeq
    val exact = dump(Dedup.contaminationScan(corpus, evalSet, "doc_id", "text"))
    val bloom = dump(Dedup.bloomContaminationScan(corpus, evalSet, "doc_id", "text"))
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
    // and the probe is actually in the plan (the pruning is real, not a no-op)
    val plan = Dedup.bloomContaminationScan(corpus, evalSet, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
  }

  test("duplicateSpans localizes a planted mid-document verbatim run exactly") {
    import spark.implicits._
    val shared = (1 to 15).map(i => s"shared$i").mkString(" ") // 15-token run
    val a = "alpha beta gamma " + shared + " delta epsilon"    // run at pos 4
    val b = "one two three four five " + shared + " six"       // run at pos 6
    val c = "totally unrelated content with nothing in common here at all"
    val corpus = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, "doc_id", "text", k = 8, minSpanTokens = 12)
      .as[(Long, Long, Int, Int, Long)].collect().toSeq
    assert(spans == Seq((1L, 2L, 4, 6, 15L)), spans.mkString(","))
  }

  test("duplicateSpans drops runs below minSpanTokens and unrelated pairs") {
    import spark.implicits._
    val shortRun = (1 to 10).map(i => s"run$i").mkString(" ") // 10 < 12 tokens
    val corpus = Seq(
      (1L, "intro words here " + shortRun + " outro"),
      (2L, "different intro " + shortRun + " different outro")
    ).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(corpus, "doc_id", "text", k = 8, minSpanTokens = 12).isEmpty)
    // but the same corpus reports it when the floor allows
    val spans = Dedup.duplicateSpans(corpus, "doc_id", "text", k = 8, minSpanTokens = 10)
      .as[(Long, Long, Int, Int, Long)].collect().toSeq
    assert(spans == Seq((1L, 2L, 4, 3, 10L)), spans.mkString(","))
  }

  test("duplicateSpans df-cap: over-cap grams generate no matches") {
    import spark.implicits._
    // the same 12-token run in 3 docs → every gram has df 3; cap 2 kills all
    val run = (1 to 12).map(i => s"w$i").mkString(" ")
    val corpus = (1L to 3L).map(id => (id, s"doc$id " + run)).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(corpus, "doc_id", "text", k = 8, minSpanTokens = 12,
      maxGramFreq = 2L).isEmpty)
    // cap 3 admits them: C(3,2) pairs, each with the full 12-token span
    val spans = Dedup.duplicateSpans(corpus, "doc_id", "text", k = 8, minSpanTokens = 12,
        maxGramFreq = 3L).as[(Long, Long, Int, Int, Long)].collect().toSeq
    assert(spans.length == 3 && spans.forall(_._5 == 12L), spans.mkString(","))
  }

  test("prefix filter is lossless: equals naive all-pairs exact Jaccard") {
    // mixed corpus: exact dups, a near-dup, unrelated docs, and a hot
    // marker shared by everyone (the case the df cap is blind to)
    val corpus = (Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "totally different payload one two three four five"),
      (5L, "another unrelated block of words six seven eight")
    ) ++ (6 to 15).map(i => (i.toLong, s"filler document number $i " + ('a' + i).toChar.toString * 20)))
      .map { case (id, t) => (id, t + " COMMONTAG") }.toDF("doc_id", "text")

    val got = Dedup.prefixFilterPairs(corpus, "doc_id", "text", tauPct = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive reference: all C(n,2) pairs, exact Jaccard over the same sets
    val base = Dedup.shingleSets(corpus, "doc_id", "text")
    val naive = base.as("a").join(base.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        size(array_intersect(col("a.hset"), col("b.hset"))).cast("long").as("inter"),
        (size(col("a.hset")) + size(col("b.hset"))).cast("long").as("tot"))
      .filter(lit(100L) * col("inter") >= lit(60L) * (col("tot") - col("inter")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"prefix-filter pairs $got != naive $naive")
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)))
  }

  test("winnowPairs: subset of full-index pairs with identical exact scores; twins found; index ~22%") {
    val corpus = (Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps running far"),
      (2L, "the quick brown fox jumps over the lazy dog and keeps running far"),
      (3L, "a completely different document about distributed query engines"),
      (4L, "another unrelated text concerning columnar storage formats")
    ) ++ (5 to 24).map(i => (i.toLong, s"filler padding text number $i " + ('a' + i).toChar.toString * 30)))
      .toDF("doc_id", "text")
    val viaWinnow = Dedup.winnowPairs(corpus, "doc_id", "text", 0.5, maxDocFreqFraction = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaFull = Dedup.jaccardPairs(corpus, "doc_id", "text", 0.5, maxDocFreqFraction = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // discovery through the smaller index is a subset; every score identical
    assert(viaWinnow.keySet.subsetOf(viaFull.keySet))
    viaWinnow.foreach { case (p, j) => assert(j == viaFull(p), s"$p: $j != ${viaFull(p)}") }
    // the verbatim twins share runs >= w+k-1 chars, so the winnowing
    // guarantee makes them discoverable through window minima
    assert(viaWinnow.get((1L, 2L)).contains(1.0), viaWinnow.toString)
    // storage: winnow index is ~2/(w+1) of the shingle volume
    val fullSize = Dedup.shingleSets(corpus, "doc_id", "text")
      .agg(sum(size(col("hset")))).head().getLong(0)
    val winSize = corpus
      .select(TextAnalysis.winnowFingerprint(col("text")).as("w"))
      .agg(sum(size(col("w")))).head().getLong(0)
    assert(winSize.toDouble / fullSize < 0.35, s"winnow index $winSize of $fullSize")
  }

  test("prefix filter finds pairs whose shared shingles are ALL over the df cap") {
    // twins made ENTIRELY of corpus-wide boilerplate: every one of their
    // shingles has df = corpus size, so the 50%-df-capped index drops all
    // of them and jaccardPairs cannot discover the pair; the prefix filter
    // keeps rarest-per-doc shingles regardless of absolute df and finds it.
    val boiler = "standard legal disclaimer text repeated everywhere verbatim"
    val corpus = ((1 to 18).map(i => (i.toLong, boiler + " unique" + i + " " + ('a' + i).toChar.toString * 25)) ++
      Seq((100L, boiler), (101L, boiler))).toDF("doc_id", "text")

    val capped = Dedup.jaccardPairs(corpus, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prefix = Dedup.prefixFilterPairs(corpus, "doc_id", "text", tauPct = 90)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.contains((100L, 101L)),
      s"df-capped path unexpectedly found the boilerplate twins: $capped")
    assert(prefix.contains((100L, 101L)), s"prefix filter missed the twins: $prefix")
  }
}
