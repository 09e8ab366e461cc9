package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenizer drops empty tokens and counts correctly") {
    val df = Seq("  hello   world  ", "", "one").toDF("text")
    val counts = df.select(TextAnalysis.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(counts.toSeq == Seq(2, 0, 1))
  }

  test("array_remove tokenizer is value-identical to the HOF filter spelling") {
    // tokens() moved from the interpreted filter(split, _ =!= "") HOF to
    // codegen'd array_remove(split, "") — equivalence must hold on every
    // whitespace shape (leading/trailing/mixed/tabs/newlines/only-ws)
    val df = Seq(
      "", " ", "\t\n", "a", " a", "a ", "  a  b  ", "a\tb\nc", "a  b",
      "wörd ünïcode  mix", "trailing newline\n").toDF("text")
    val cmp = df.select(
      TextAnalysis.tokens(col("text")).as("fast"),
      filter(split(col("text"), "\\s+"), t => t =!= lit("")).as("hof"))
    cmp.collect().foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("language id picks the dominant stopword list; und when nothing matches") {
    val df = Seq(
      ("the cat sat on the mat and it is fine", "en"),
      ("el gato es de la casa y se fue", "es"),
      ("der hund ist ein tier und das ist gut", "de"),
      ("le chat est dans la maison et les oiseaux", "fr"),
      ("zzz qqq xxx", "und")
    ).toDF("text", "expected")
    val got = df.select(TextAnalysis.langId(col("text")).as("got"), col("expected")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("quality score is bounded in [0,1] and favors natural prose") {
    val df = Seq(
      "the cat is on the mat and it is a fine day for all of us to be here",
      ";;;;;;;!!!!???..."
    ).toDF("text")
    val scores = df.select(TextAnalysis.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("fingerprint is whitespace- and case-insensitive") {
    val df = Seq(("a  B\tc", "A B C"), ("x", "y")).toDF("t1", "t2")
    val eq = df.select(
      (TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(col("t2"))).as("same"))
      .collect().map(_.getBoolean(0))
    assert(eq.toSeq == Seq(true, false))
  }

  test("repetition metrics: distinct/top-token/top-bigram fractions") {
    val df = Seq(
      "a a a a",          // 1 distinct of 4; top token 4/4; top bigram "a a" 3 times → 6/4 capped? no: 2*3/4
      "a b c d",          // all distinct; top token 1/4; every bigram once → 2/4
      "go go go go stop", // top bigram "go go" 3x → 6/5
      "x"                 // single token: bigram frac 0
    ).toDF("text")
    val toks = TextAnalysis.tokens(col("text"))
    val got = df.select(
      round(TextAnalysis.distinctTokenFrac(toks), 4).as("d"),
      round(TextAnalysis.topTokenFrac(toks), 4).as("w"),
      round(TextAnalysis.topBigramFrac(toks), 4).as("b"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(got(0) == ((0.25, 1.0, 1.5)))
    assert(got(1) == ((1.0, 0.25, 0.5)))
    assert(got(2) == ((0.4, 0.8, 1.2)))
    assert(got(3) == ((1.0, 1.0, 0.0)))
  }

  test("email and phone redaction scrub synthetic PII and count hits") {
    val df = Seq(
      ("contact bob.smith+x@corp.example.org or call 555-867-5309 now", 1, 1),
      ("two mails a@b.io c.d@e.co.uk, phone (212) 555-0188 and +1 646.555.0199", 2, 2),
      ("no pii here", 0, 0)
    ).toDF("text", "emails", "phones")
    val scrub = TextAnalysis.redactPhones(TextAnalysis.redactEmails(col("text")))
    val checked = df.select(
      TextAnalysis.patternHits(col("text"), TextAnalysis.EmailPattern).as("e"),
      TextAnalysis.patternHits(col("text"), TextAnalysis.PhonePattern).as("p"),
      scrub.as("scrubbed"),
      // re-scan the SCRUBBED text: zero pattern hits may survive redaction
      TextAnalysis.patternHits(scrub, TextAnalysis.EmailPattern).as("e_left"),
      TextAnalysis.patternHits(scrub, TextAnalysis.PhonePattern).as("p_left"),
      col("emails"), col("phones")).collect()
    checked.foreach { r =>
      assert(r.getInt(0) == r.getInt(5), s"emails: $r")
      assert(r.getInt(1) == r.getInt(6), s"phones: $r")
      assert(r.getInt(3) == 0, s"email survived redaction: ${r.getString(2)}")
      assert(r.getInt(4) == 0, s"phone survived redaction: ${r.getString(2)}")
    }
    val scrubbed = checked(0).getString(2)
    assert(scrubbed == "contact <EMAIL> or call <PHONE> now")
    assert(checked(1).getString(2) ==
      "two mails <EMAIL> <EMAIL>, phone <PHONE> and <PHONE>")
  }

  test("winnowing: shared substring >= w+k-1 chars leaves a common hash; density ~2/(w+1)") {
    import spark.implicits._
    val k = 5; val w = 8
    val shared = "the quick brown fox jumps over it" // 33 >= w+k-1 = 12
    val df = Seq(
      (1L, s"AAAA $shared BBBB padding text one two three"),
      (2L, s"zzz different prefix $shared and a different suffix"),
      (3L, "completely unrelated content with nothing in common at all")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
        TextAnalysis.winnowFingerprint(col("text"), k, w).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // the winnowing guarantee: docs 1 and 2 share the substring, so their
    // fingerprints must intersect
    assert(fps(1L).intersect(fps(2L)).nonEmpty, "guaranteed common hash missing")
    // sorted-distinct output, deterministic across runs
    val again = df.select(TextAnalysis.winnowFingerprint(col("text"), k, w))
      .collect().map(_.getSeq[Long](0))
    assert(again.forall(s => s == s.sorted && s.distinct == s))
    // density: fingerprint is a strict subset of the full shingle set —
    // expected ~2/(w+1) ≈ 22%; assert well under half on real prose
    val full = df.select(array_distinct(Dedup.shingleHashes(col("text"), k)).as("h"))
      .collect().map(_.getSeq[Long](0).toSet)
    val fpArr = df.select(TextAnalysis.winnowFingerprint(col("text"), k, w).as("fp"))
      .collect().map(_.getSeq[Long](0).toSet)
    fpArr.zip(full).foreach { case (fp, all) =>
      assert(fp.subsetOf(all))
      assert(fp.size <= all.size / 2, s"${fp.size} of ${all.size} kept — winnowed too little")
    }
  }

  test("unigram cross-entropy: repetitive in-distribution text scores lower than rare-token text") {
    import spark.implicits._
    // corpus dominated by 'common'; doc 2 is all rare singletons
    val docs = Seq(
      (1L, "common common common common common common"),
      (2L, "xylophone quetzal obsidian fjord"),
      (3L, "common common rare1 rare2")
    ).toDF("doc_id", "text")
    val q = graft.queries.TextQueries.t11UnigramXent
    val tmp = java.nio.file.Files.createTempDirectory("graft-xent").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = q.run(spark, tmp).as[(Long, Double)].collect().toMap
    // independent reimplementation
    val toks = Map(
      1L -> Seq.fill(6)("common"),
      2L -> Seq("xylophone", "quetzal", "obsidian", "fjord"),
      3L -> Seq("common", "common", "rare1", "rare2"))
    val all = toks.values.flatten.toSeq
    val n = all.size.toDouble
    def ref(ts: Seq[String]) = {
      val byTerm = ts.groupBy(identity).view.mapValues(_.size).toMap
      val s = byTerm.map { case (t, tf) =>
        BigDecimal(tf * math.log(all.count(_ == t) / n))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (-s / ts.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    toks.foreach { case (id, ts) =>
      assert(math.abs(out(id) - ref(ts)) < 2e-6, s"doc $id: ${out(id)} vs ${ref(ts)}")
    }
    assert(out(1L) < out(3L) && out(3L) < out(2L),
      s"expected common < mixed < rare, got $out")
  }

  test("bm25 matches an independent reimplementation and ranks sanely") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join join join optimizer"),   // tf(join)=3, short
      (2L, "spark join optimizer internals and some more padding words here"), // tf=1, longer
      (3L, "nothing relevant whatsoever in this one")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("join"))
      .as[(Long, Double)].collect().toMap
    // independent scalar reimplementation
    val toks = Map(1L -> 5.0, 2L -> 10.0, 3L -> 6.0)
    val tf = Map(1L -> 3.0, 2L -> 1.0, 3L -> 0.0)
    val (n, df, avgdl, k1, b) = (3.0, 2.0, (5 + 10 + 6) / 3.0, 1.2, 0.75)
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def ref(id: Long) =
      idf * (tf(id) * (k1 + 1.0)) / (tf(id) + k1 * (1.0 - b + b * toks(id) / avgdl))
    Seq(1L, 2L, 3L).foreach { id =>
      assert(math.abs(got(id) - ref(id)) < 1e-12, s"doc $id: ${got(id)} vs ${ref(id)}")
    }
    assert(got(1L) > got(2L) && got(2L) > got(3L) && got(3L) == 0.0)
  }

  test("within-doc block dedup removes planted repeats, keeps first occurrence, rebuilds order") {
    val blockA = (1 to 4).map(i => s"a$i").mkString(" ")   // 4-token blocks
    val blockB = (1 to 4).map(i => s"b$i").mkString(" ")
    val blockC = (1 to 4).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$blockA $blockB $blockA $blockC $blockB $blockA"), // A,B dup'd
      (2L, s"$blockC $blockA"),                                 // no repeats
      (3L, "")                                                  // empty
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dedupBlocksWithinDoc(docs, "doc_id", "text", blockTokens = 4)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(got(0) == ((1L, s"$blockA $blockB $blockC", 6L, 3L)), got(0).toString)
    assert(got(1) == ((2L, s"$blockC $blockA", 2L, 0L)), got(1).toString)
    assert(got(2) == ((3L, "", 1L, 0L)), got(2).toString)
  }

  test("bigram xent separates shuffled word order where unigram xent cannot") {
    // same bag of words per doc — unigram profiles identical; only the
    // SEQUENCE differs. The bigram model sees doc 4's transitions once
    // each vs the phrase docs' dominant transitions.
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"),
      (4L, "mat the on sat cat the")
    ).toDF("doc_id", "text")
    // run the registered queries themselves against a fixture directory
    val tmp = java.nio.file.Files.createTempDirectory("graft_xent_").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val uni = graft.SparkEntry.queries("t11_unigram_xent")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bi = graft.SparkEntry.queries("t13_bigram_xent")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(1L) == uni(4L), s"unigram should tie: ${uni(1L)} vs ${uni(4L)}")
    assert(bi(4L) > bi(1L), s"bigram must flag the shuffle: ${bi(4L)} vs ${bi(1L)}")
  }

  test("hashed linear score: native expression == interpreted HOF composition") {
    val df = Seq(
      "", "a", "a a a", "the quick brown fox", "wörd ünïcode mix",
      "x y z x y z x y z", "singletoken",
      "punctuation, numbers 123 and symbols $%^").toDF("text")
    val cmp = df.select(
      TextAnalysis.hashedLinearScoreMilli(TextAnalysis.tokens(col("text"))).as("native"),
      TextAnalysis.hashedLinearScoreMilliHof(TextAnalysis.tokens(col("text"))).as("hof"))
    cmp.collect().foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("hashed linear score: bounded, additive, duplicate-sensitive, empty=0") {
    val one = Seq("spark").toDF("text")
      .select(TextAnalysis.hashedLinearScoreMilli(TextAnalysis.tokens(col("text"))))
      .collect().head.getLong(0)
    assert(one >= -1000L && one <= 1000L)
    val twice = Seq("spark spark").toDF("text")
      .select(TextAnalysis.hashedLinearScoreMilli(TextAnalysis.tokens(col("text"))))
      .collect().head.getLong(0)
    assert(twice == 2 * one)                       // tf-weighted bag of features
    val shuffled = Seq("a b c", "c a b").toDF("text")
      .select(TextAnalysis.hashedLinearScoreMilli(TextAnalysis.tokens(col("text"))))
      .collect().map(_.getLong(0))
    assert(shuffled(0) == shuffled(1))             // order-independent
    val empty = Seq("   ").toDF("text")
      .select(TextAnalysis.hashedLinearScoreMilli(TextAnalysis.tokens(col("text"))))
      .collect().head.getLong(0)
    assert(empty == 0L)
  }

  test("chunk windows: counts, coverage, overlap, short-doc and empty-doc shapes") {
    val text100 = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, text100),                 // 100 tokens: starts 0,24,48,72 → 4 chunks
      (2L, "a b c"),                 // n <= size → exactly 1 whole chunk
      (3L, "")                       // empty doc → 1 empty chunk
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkWindows(docs, "doc_id", "text", size = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Int, String)].collect()
    val d1 = got.filter(_._1 == 1L)
    assert(d1.length == 4)
    assert(d1.map(_._3).toSeq == Seq(32, 32, 32, 28))   // last window short
    // coverage: every token appears in at least one chunk; consecutive
    // full chunks overlap by size - stride = 8 tokens
    val allToks = d1.flatMap(_._4.split(" ")).toSet
    assert((1 to 100).forall(i => allToks.contains(s"t$i")))
    val c0 = d1(0)._4.split(" ")
    val c1 = d1(1)._4.split(" ")
    assert(c0.takeRight(8).toSeq == c1.take(8).toSeq)
    // chunk i starts at token i*stride + 1
    assert(c1.head == "t25" && d1(3)._4.split(" ").head == "t73")
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3, "a b c")))
    assert(got.filter(_._1 == 3L).toSeq == Seq((3L, 0L, 0, "")))
  }

  test("phrase hits: boundaries, overlaps, case folding, counts, positions") {
    val docs = Seq(
      (1L, "Bad Phrase at the start and bad phrase again"), // 2 hits, case-folded
      (2L, "ends with bad phrase"),                          // hit at the end
      (3L, "badly phrased near miss and bad phrases too"),  // token-boundary: no hit
      (4L, "a a a"),                                         // overlapping "a a": 2 hits
      (5L, "")                                               // empty doc
    ).toDF("doc_id", "text")
    val got = TextAnalysis.phraseHits(docs, "doc_id", "text", Seq("bad phrase", "a a", "absent"))
      .orderBy("doc_id", "phrase")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "bad phrase", 2L, 1L),
      (2L, "bad phrase", 1L, 3L),
      (4L, "a a", 2L, 1L)))
  }

  test("sourceJsDivergence: zero for identical, ln2-bounded, matches hand JS, disjoint absent") {
    val docs = Seq(
      ("a", "x x y"), ("b", "x x y"),       // identical distribution -> JS 0
      ("c", "x y"),                          // vs a: p=(2/3,1/3), q=(1/2,1/2)
      ("d", "z z w")                         // disjoint vocab with a/b/c
    ).toDF("source", "text")
    val got = TextAnalysis.sourceJsDivergence(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(("a", "b"))._2 == 0.0, got.toString)
    // hand JS for a vs c in nats
    def kl(p: Seq[Double], q: Seq[Double]) =
      p.zip(q).map { case (pi, qi) => if (pi == 0) 0.0 else pi * math.log(pi / qi) }.sum
    val p = Seq(2.0 / 3, 1.0 / 3); val q = Seq(0.5, 0.5)
    val m = p.zip(q).map { case (x, y) => (x + y) / 2 }
    val want = 0.5 * kl(p, m) + 0.5 * kl(q, m)
    assert(math.abs(got(("a", "c"))._2 - want) < 1e-5,
      s"a-c: ${got(("a", "c"))._2} vs hand $want")
    // every score within [0, ln 2]; disjoint pairs (d vs others) absent
    assert(got.values.forall(v => v._2 >= 0.0 && v._2 <= math.log(2.0) + 1e-9))
    assert(!got.keySet.exists { case (x, y) => x == "d" || y == "d" })
  }

  test("phrase hits plan: blocklist broadcasts; the corpus never sort-merges") {
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val p = TextAnalysis.phraseHits(docs, "doc_id", "text", Seq("x y"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("mattr: short docs fall back to TTR; repetition drives it down") {
    val docs = Seq(
      (1L, "a b c d e"),                       // 5 distinct / 5 => 1.0
      (2L, "a a a a a"),                       // 1 distinct / 5 => 0.2
      (3L, ""),                                 // empty => null
      (4L, ((1 to 60).map(i => s"w$i")).mkString(" ")),   // all-distinct long doc
      (5L, Array.fill(60)("x").mkString(" "))  // fully repeated long doc
    ).toDF("doc_id", "text")
    val m = docs.select(col("doc_id"),
        TextAnalysis.mattr(TextAnalysis.tokens(col("text")), 50).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(m(1L) == Some(1.0))
    assert(m(2L) == Some(0.2))
    assert(m(3L) == None)
    assert(m(4L) == Some(1.0))       // every 50-window of distinct words is 50/50
    assert(m(5L) == Some(1.0 / 50))  // every 50-window has 1 distinct token
  }

  test("mattr is length-invariant where global TTR is not") {
    // same local diversity, 10x the length: global TTR collapses, MATTR holds
    val unit = (1 to 25).map(i => s"w$i").mkString(" ")
    val short = unit + " " + unit
    val long = Array.fill(20)(unit).mkString(" ")
    val df = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        TextAnalysis.mattr(TextAnalysis.tokens(col("text")), 50).as("m"),
        (size(array_distinct(TextAnalysis.tokens(col("text")))).cast("double")
          / size(TextAnalysis.tokens(col("text"))).cast("double")).as("ttr"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val (mShort, ttrShort) = rows(1L)
    val (mLong, ttrLong) = rows(2L)
    assert(math.abs(mShort - mLong) < 0.02, s"MATTR drifted: $mShort vs $mLong")
    assert(ttrShort / ttrLong > 5.0, s"TTR should collapse with length: $ttrShort vs $ttrLong")
  }

  test("t19 RAKE: hand-computed phrase scores on the canonical example shape") {
    // "deep neural nets and deep learning in models":
    // stopwords {and, in} delimit phrases [deep neural nets][deep learning][models]
    // freq(deep)=2, degree(deep)=3+2=5; neural/nets freq 1 degree 3; learning 1/2
    // score("deep neural nets") = 5/2 + 3 + 3 = 8.5
    // score("deep learning")    = 5/2 + 2     = 4.5
    // score("models")           = 1.0
    val dir = java.nio.file.Files.createTempDirectory("graft-rake").toString
    Seq((1L, "deep neural nets and deep learning in models"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueries.t19RakeKeywords.run(spark, dir)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[String]("phrase"),
        r.getAs[Double]("rake_score")))
    assert(out.toSeq == Seq(
      (1L, "deep neural nets", 8.5),
      (2L, "deep learning", 4.5),
      (3L, "models", 1.0)), out.toSeq.toString)
  }

  test("heldOutBackoffXent at trainRate 1.0 reduces exactly to t13 bigram cross-entropy") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Graft.table(spark, dir, "documents")
    val full = TextAnalysis.heldOutBackoffXent(docs, "doc_id", "text", trainRate = 1.0)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val t13 = graft.queries.TextQueries.t13BigramXent.run(spark, dir)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(full.keySet == t13.keySet)
    // model == scored corpus -> every bigram hits the model branch, the
    // formula collapses to t13's; identical rounding makes it EXACT
    full.foreach { case (id, v) =>
      assert(v == t13(id), s"doc $id: backoff(1.0)=$v vs t13=${t13(id)}")
    }
  }

  test("t22 Gopher rules: planted documents fail exactly the targeted rule") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the cat sat of the mat and it is that good for everyone here today now"), // clean
      (2L, "a b c"),                                                   // too few words
      (3L, "the ### #### ##### of ###### it ####### is ######## that ######### for a to in and is it"), // symbols
      (4L, "the 111 222 333 444 555 666 777 888 999 000 111 222 333 444"), // low alpha frac
      (5L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn mmm lll")  // no stopwords
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("planted_docs_t22")
    // reuse the query body by aiming it at a temp dir is heavier than
    // recomputing: evaluate the same rule columns directly
    val out = graft.queries.TextQueries.t22GopherRules
    // write planted docs as a parquet 'documents' table in a temp dir
    val dir = java.nio.file.Files.createTempDirectory("t22spec").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = out.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep"), s"clean doc must pass: ${rows(1L)}")
    assert(!rows(2L).getAs[Boolean]("r_words") && !rows(2L).getAs[Boolean]("keep"))
    assert(!rows(3L).getAs[Boolean]("r_symbols") && !rows(3L).getAs[Boolean]("keep"))
    assert(!rows(4L).getAs[Boolean]("r_alpha") && !rows(4L).getAs[Boolean]("keep"))
    assert(!rows(5L).getAs[Boolean]("r_stopwords") && !rows(5L).getAs[Boolean]("keep"))
  }

  test("spanCorrupt: hash-rule masking, sentinel ordinals, corrupted/target round-trip") {
    import spark.implicits._
    val text = (1 to 23).map(i => s"w$i").mkString(" ") // 23 tokens → 5 blocks
    val df = Seq((7L, text), (8L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.spanCorrupt(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r7 = out(7L)
    assert(r7.getAs[Int]("n_tokens") == 23 && r7.getAs[Int]("n_blocks") == 5)
    // independently replay the hash rule
    def maskedBlock(id: Long, b: Int): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$b".getBytes("UTF-8")).take(4)
        .foldLeft(0L)((a, x) => (a << 8) | (x & 0xff))
      h % 100 < 15
    }
    val flags = (0 until 5).map(maskedBlock(7L, _))
    assert(r7.getAs[Int]("n_sentinels") == flags.count(identity))
    val expMasked = flags.zipWithIndex.collect {
      case (true, b) => math.min(5, 23 - b * 5) }.sum
    assert(r7.getAs[Int]("n_masked_tokens") == expMasked)
    // reconstruct corrupted/target from the same rule and compare strings
    val toks = text.split(" ")
    var k = 0
    val pieces = (0 until 5).map { b =>
      val blockTok = toks.slice(b * 5, math.min(b * 5 + 5, 23)).mkString(" ")
      if (flags(b)) { val s = s"<extra_id_$k>"; k += 1; s } else blockTok
    }
    var k2 = 0
    val tgt = (0 until 5).flatMap { b =>
      if (flags(b)) {
        val s = s"<extra_id_$k2> ${toks.slice(b * 5, math.min(b * 5 + 5, 23)).mkString(" ")}"
        k2 += 1; Some(s)
      } else None
    }
    assert(r7.getAs[String]("corrupted") == pieces.mkString(" "))
    assert(r7.getAs[String]("target") == tgt.mkString(" "))
    // empty doc: zero everything, empty strings
    val r8 = out(8L)
    assert(r8.getAs[Int]("n_tokens") == 0 && r8.getAs[Int]("n_blocks") == 0
      && r8.getAs[Int]("n_masked_tokens") == 0 && r8.getAs[String]("corrupted") == "")
    // noise extremes: 0 → identity (token-joined), 100 → all sentinels
    val id0 = TextAnalysis.spanCorrupt(df.filter($"doc_id" === 7L),
      "doc_id", "text", noisePct = 0).head()
    assert(id0.getAs[String]("corrupted") == text && id0.getAs[String]("target") == "")
    val all100 = TextAnalysis.spanCorrupt(df.filter($"doc_id" === 7L),
      "doc_id", "text", noisePct = 100).head()
    assert(all100.getAs[Int]("n_sentinels") == 5
      && all100.getAs[Int]("n_masked_tokens") == 23)
  }
}
