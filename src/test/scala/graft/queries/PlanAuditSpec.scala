package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality audit: the physical plans the optimizer should settle on —
  * filter pushdown into the parquet scan, column pruning, broadcast (never
  * shuffle) joins for dims, bounded exchange counts on the single-shuffle
  * operators. These assertions are the "would this survive a 100× scale-up"
  * gate, run as CI.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Simple mode: one line per operator (`*(n)` = codegen stage) — used for
    * exchange counting and codegen-span checks. */
  private def simplePlan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("simple"))

  private def q(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, dir)

  test("q01: ship-date filter reaches the parquet scan; columns pruned") {
    val p = plan(q("q01_pricing_summary"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // 10-column table, 6-column read: pruning must drop unused columns
    assert(p.contains("l_returnflag") && !p.contains("l_orderkey"), p)
  }

  test("q02: compound sargable predicates all push down") {
    val p = plan(q("q02_filter_project"))
    Seq("GreaterThanOrEqual(l_shipdate", "LessThanOrEqual(l_discount", "LessThan(l_quantity")
      .foreach(f => assert(p.contains(f), s"missing pushed filter $f\n$p"))
  }

  test("q03/q04: dimension joins broadcast — no shuffle of the fact side") {
    Seq("q03_left_join_enrich", "q04_star_join_revenue").foreach { name =>
      val p = plan(q(name))
      assert(p.contains("BroadcastHashJoin"), s"$name: no broadcast join\n$p")
      assert(!p.contains("SortMergeJoin"), s"$name: unexpected sort-merge join")
    }
  }

  test("q05: 1-row cross join is a broadcast nested loop, not a cartesian shuffle") {
    val p = plan(q("q05_cross_join_scalar"))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q08 window dedup: exactly one hash-partition shuffle before the window") {
    val p = simplePlan(q("q08_window_dedup_latest"))
    assert(p.contains("hashpartitioning") && p.contains("Window"), p)
    // one exchange for the window; the final ORDER BY adds a range exchange only
    assert("Exchange".r.findAllIn(p).length <= 2, p)
  }

  test("q30 as-of join: union-LOCF plan has no pair-generating join at all") {
    val p = plan(q("q30_asof_join"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }

  test("q10 top-k: global sort+limit compiles to TakeOrderedAndProject") {
    val p = plan(q("q10_topk_customers"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("whole-stage codegen spans the aggregation hot path") {
    // AQE inserts codegen stages at execution: run the query, then check the
    // final plan — scan→filter→project→partial-agg must sit in one
    // WholeStageCodegen span
    val df = q("q01_pricing_summary")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    // `*(n)` prefixes mark whole-stage-codegen stages: both aggregate halves
    // and the final sort must carry one
    assert("\\*\\(\\d+\\) HashAggregate".r.findAllIn(p).length == 2, p)
    assert("\\*\\(\\d+\\) Sort".r.findFirstIn(p).isDefined, p)
  }

  test("s01 similarity: query side broadcast, corpus scanned without shuffle") {
    val p = plan(q("s01_cosine_topk"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("s01/s02: top-k is the bounded TopKPairs partial aggregate, not a scored-pair window") {
    Seq("s01_cosine_topk", "s02_lsh_ann_topk").foreach { name =>
      val p = simplePlan(q(name))
      assert(p.contains("topk_pairs"), s"$name: no TopKPairs aggregate\n$p")
      // the window idiom would shuffle EVERY scored pair to its query's
      // partition — the whole point of the aggregate is that it never appears
      assert(!p.contains("Window"), s"$name: unexpected window top-k\n$p")
    }
  }

  test("t05 tf-idf: per-doc top-3 via bounded TopKStrings aggregate, not a window") {
    val p = simplePlan(q("t05_tfidf_top_terms"))
    assert(p.contains("topk_strings"), p)
    assert(!p.contains("Window"), p)
  }

  test("t05 tf-idf: tf is shuffle-free (native map) and the idf join broadcasts") {
    val p = simplePlan(q("t05_tfidf_top_terms"))
    // per-row token_counts + broadcast idf: remaining exchanges are the
    // vocabulary df agg, the bounded top-k agg, the broadcast, and the
    // final ORDER BY range exchange — NOT a (doc,term) tf shuffle
    assert(p.contains("token_counts"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d02/d04 candidate generation: equi-joins only — no pair-generating join") {
    // d02's plan legitimately contains BroadcastNestedLoopJoin nodes: the
    // 1-row corpus-count scalar attach (broadcast Cross BuildRight of an
    // aggregate) — bounded by construction. What must NEVER appear is a
    // shuffled cartesian of data-sized sides.
    Seq("d02_ngram_jaccard_pairs", "d04_minhash_lsh_pairs").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct"), s"$name\n$p")
    }
    val d04 = plan(q("d04_minhash_lsh_pairs"))
    assert(!d04.contains("BroadcastNestedLoopJoin"), d04) // d04 has no scalar attach at all
  }

  test("m02 frames: typed pipeline stays shuffle-free until the per-asset aggregate") {
    val p = simplePlan(q("m02_frame_stats"))
    // flatMap fan-out (SerializeFromObject/MapPartitions) feeds a single
    // partial+final aggregate pair; only agg + sort exchanges remain
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected ≤2 exchanges (agg + sort), got $exchanges\n$p")
  }

  test("d01 exact dedup: single hash aggregate pair (partial + final), one shuffle") {
    val p = simplePlan(q("d01_exact_dedup"))
    assert(p.contains("HashAggregate"), p)
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected ≤2 exchanges (agg + sort), got $exchanges\n$p")
  }

  test("t07/t08/c01: per-row curation filters stay shuffle-free up to the final sort") {
    // repetition metrics, redaction, and hash sampling are pure per-row
    // maps/filters — the ONLY exchange allowed is the ORDER BY range
    // exchange (no aggregation, no join, no window)
    Seq("t07_repetition_filter", "t08_pattern_redaction", "c01_hash_sample").foreach { name =>
      val p = simplePlan(q(name))
      assert(!p.contains("Window") && !p.contains("Join"), s"$name\n$p")
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges <= 1, s"$name: expected ≤1 exchange (sort only), got $exchanges\n$p")
    }
  }

  test("c03 weighted mix: weights dim broadcasts; one aggregate shuffle") {
    val p = plan(q("c03_weighted_mix"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("c02/c04: stratified sampling and packing shuffle once on the stratum/shard") {
    Seq("c02_stratified_sample", "c04_pack_sequences").foreach { name =>
      val p = simplePlan(q(name))
      assert(p.contains("Window") && p.contains("hashpartitioning"), s"$name\n$p")
      assert(!p.contains("Join"), s"$name: unexpected join\n$p")
    }
  }

  test("d04: the shingle barrier pins an explicit partition count (AQE must not byte-coalesce it)") {
    // the barrier feeds the compute-bound band-join + intersect-verify
    // pipeline; a bare repartition(col) gets byte-coalesced by AQE down to
    // a handful of tasks (measured: 4 of 32 cores, 2.8x slower d04).
    // REPARTITION_BY_NUM marks the user-pinned width AQE must honor.
    val p = simplePlan(q("d04_minhash_lsh_pairs"))
    assert(p.contains("REPARTITION_BY_NUM"), p)
  }

  test("s05 IVF: seeds broadcast; candidate generation is a cell equi-join; top-k bounded") {
    val p = plan(q("s05_ivf_topk"))
    // corpus × seeds scoring is a broadcast nested loop of the ~sqrt(n)
    // seed side — never a shuffled cartesian of the corpus
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // probe → members is a hash equi-join on cell_id
    assert(p.contains("cell_id"), p)
    // final top-k partial-aggregates (TopKPairs), no scored-pair window
    assert(p.contains("topk_pairs"), p)
    assert(!p.contains("row_number"), p)
  }

  test("d08 semantic dedup: pair generation is an equi-join on cell_id, not all-pairs") {
    val p = plan(q("d08_semantic_dedup"))
    // the only theta-join allowed is id_a < id_b INSIDE the cell equi-join
    // (join keys contain cell_id); no corpus-wide cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("cell_id"), p)
  }

  test("c11 adaptive threshold: the stats row joins back broadcast, corpus unshuffled") {
    val p = plan(q("c11_adaptive_threshold"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("c12 bloom decontamination: the sketch probe gates the membership join") {
    val p = simplePlan(q("c12_bloom_decontamination"))
    assert(p.contains("might_contain"), p)
    // the eval membership join stays broadcast — the bloom prune shrinks its
    // PROBE side; nothing about the sketch may introduce a shuffled join
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t10 bm25: stats broadcast back; no token-occurrence shuffle; top-k bounded") {
    val p = simplePlan(q("t10_bm25"))
    // per-row tf via the native map — the plan must not explode tokens into
    // a (doc, term) shuffle; the only exchanges belong to the 1-row stats
    // aggregate and the final TakeOrdered
    assert(p.contains("token_counts"), p)
    assert(!p.contains("Generate"), s"token explode leaked into the bm25 plan\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("d09 duplicate spans: gram self-join is an equi-join; islands window partitions by pair") {
    val p = plan(q("d09_duplicate_spans"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("q64 triangles: wedge and closure are equi-joins — no pair-generating join") {
    val p = plan(q("q64_triangle_counts"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q67 TWA: ONE exchange shared by the lead window and the aggregate") {
    val p = simplePlan(q("q67_time_weighted_avg"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"$exchanges key exchanges\n$p")
    assert(p.contains("Window"), p)
  }

  test("c23 epoch mix: recipe broadcasts; no shuffle in the operator") {
    val p = simplePlan(q("c23_epoch_mix"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d15 winnow discovery: equi-joins only, native intersect verify") {
    val p = plan(q("d15_winnow_pairs"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("sorted_intersect_size"), p.take(3000))
  }

  test("q69 PSI: ONE exchange touches the data; the dense-bin resolve is groups-sized") {
    val p = simplePlan(q("q69_psi_drift"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the (group, bin, slice) count is the only aggregate over raw rows —
    // it must partial-aggregate (map-side combine) before its exchange
    assert(p.contains("HashAggregate"), p)
  }

  test("q70 exact median: value-histogram aggregate precedes the window; no row buffering") {
    val p = simplePlan(q("q70_exact_median"))
    // the (key, cents) count aggregate must sit BETWEEN the scan and the
    // window (plans print top-down, scan last): the LAST HashAggregate —
    // the one nearest the scan — comes after the Window in print order,
    // proving state is value-bounded, not a per-group collect
    val aggIdx = p.lastIndexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && aggIdx > winIdx,
      s"expected scan->aggregate->window layering\n$p")
    assert(p.contains("partial_count"), p) // map-side combined histogram
    assert(!p.contains("percentile"), p)
  }

  test("t16 blocklist: phrase list broadcasts; corpus scan never shuffles before the join") {
    val p = simplePlan(q("t16_blocklist_phrases"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t17 JS divergence: intersection equi-join only — no cartesian pair expansion") {
    val p = plan(q("t17_source_js_divergence"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("c24 negative pairs: bucket-keyed windows and equi-join resolve; no global sort rank") {
    val p = plan(q("c24_negative_pairs"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // ranking windows must be partitioned (hashpartitioning), never a
    // single-partition global order
    assert(!p.contains("SinglePartition"), p)
  }

  test("q68 pareto frontier: no quadratic self-join — equi-joins + windows only") {
    val p = plan(q("q68_pareto_frontier"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("d14 prefix filter: candidate generation and verify are equi-joins; intersect is native") {
    val p = plan(q("d14_prefix_jaccard_pairs"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("sorted_intersect_size"), p.take(3000))
  }

  test("d11 CDC: chunking is the native codegen expression; joins are equi-joins only") {
    val p = plan(q("d11_cdc_neardup"))
    assert(p.contains("cdc_chunk_hashes"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q41 bucketed SMB join: sort-merge over bucketed scans with NO join-side exchange") {
    val df = q("q41_smb_bucket_join")
    val p = simplePlan(df)
    assert(p.contains("SortMergeJoin"), p)
    // the only exchanges are the post-join aggregation and the final sort —
    // the join itself consumes the two bucketed scans in place (at 100 TB
    // this is the fact-to-fact shuffle amortized into the write)
    assert("Exchange".r.findAllIn(p).length <= 2, p)
    val f = plan(df)
    assert(f.contains("Bucketed: true"), f.take(4000))
  }

  test("t12 quality classifier: fused native scoring, per-row until the final sort") {
    val df = q("t12_quality_classifier")
    val p = simplePlan(df)
    assert(p.contains("hashed_linear_score"), p)
    assert("Exchange".r.findAllIn(p).length == 1, p) // only the ORDER BY
  }

  test("c15 chunk windows: generate + slice per row, no shuffle before the sort") {
    val p = simplePlan(q("c15_chunk_windows"))
    assert(p.contains("Generate"), p)
    assert("Exchange".r.findAllIn(p).length == 1, p) // only the ORDER BY
  }

  test("s06 PQ: query tables and shortlist broadcast; top-k bounded, no window") {
    val p = simplePlan(q("s06_pq_topk"))
    assert(p.contains("topk_pairs"), p)
    assert(!p.contains("Window"), p)
    // the ADC estimate scan and the exact re-rank both consume BROADCAST
    // sides (query maps, shortlist) — the corpus/code side never shuffles
    // into a pair join
    assert("BroadcastExchange".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("c16 temperature mix: stats broadcast back; one window shuffle on the stratum") {
    val p = simplePlan(q("c16_temperature_mix"))
    // the √count target table is strata-sized and must broadcast, never
    // shuffle the corpus against it
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q42 profile: ONE aggregation pass (partial+final), no join, no window") {
    val p = simplePlan(q("q42_profile"))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    // exact distinct plans an Expand (documented approx_count_distinct
    // swap-in removes it at 100 TB); the aggregate itself partial-aggregates
    assert(p.contains("Expand"), p)
  }

  test("t13 bigram xent: tf is the native per-row map; model joins broadcast") {
    val p = simplePlan(q("t13_bigram_xent"))
    assert(p.contains("token_counts"), p) // bigram tf via the native map
    // model + prefix joins must broadcast — the corpus tf side never
    // shuffles against the vocab
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("c06 funnel stats: repeated stage subtrees share exchanges (ReuseExchange)") {
    // funnelStats unions one aggregate per funnel stage, and each stage's
    // plan embeds its predecessors — without exchange reuse the dedup
    // shuffle and the LSH pipeline would re-execute once per stage row
    val df = q("c06_curation_funnel")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(p).length >= 3, p.take(3000))
  }

  test("q39 heavy hitters: MG aggregate partial-aggregates (map-side combine)") {
    val df = q("q39_heavy_hitters")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // two ObjectHashAggregate halves around one exchange: the k-entry map,
    // not the token stream, crosses the shuffle
    assert(p.contains("misra_gries"), p)
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q51 snapshot CDC: one full-outer join, image split is a generator (no second join)") {
    val p = simplePlan(q("q51_snapshot_cdf"))
    assert("SortMergeJoin.*FullOuter".r.findAllIn(p).length == 1, p)
    assert(p.contains("Generate explode"), p) // pre/post images fan out map-side
    assert(!p.contains("CartesianProduct") &&
      "Join".r.findAllIn(p).length == 1, p)
  }

  test("q52 histogram: single aggregate pair over a 1-column scan") {
    val p = plan(q("q52_histogram"))
    assert(p.contains("ReadSchema: struct<o_totalprice:double>"), p) // pruned to the histogrammed column
    val s = simplePlan(q("q52_histogram"))
    assert("HashAggregate".r.findAllIn(s).length == 2, s) // partial + final, nothing else
    assert(!s.contains("Join"), s)
  }

  test("q53 funnel: ONE user-key shuffle; the step-type filter reaches the scan") {
    val p = plan(q("q53_funnel"))
    assert(p.contains("In(event_type"), p) // IN(view,click,purchase) pushed down
    val s = simplePlan(q("q53_funnel"))
    // partial+final collect around one hash exchange; final ORDER BY adds range only
    assert("Exchange hashpartitioning".r.findAllIn(s).length == 1, s)
    assert(!s.contains("Join"), s)
  }

  test("t14 zipf: top-100 cut is TakeOrdered (bounded), never a full-vocab window") {
    val s = simplePlan(q("t14_zipf_slope"))
    assert(s.contains("TakeOrderedAndProject(limit=100"), s)
    // the only window runs AFTER the 100-row cut; the 1-row combine is a
    // broadcast nested loop, not a shuffle join
    assert(s.contains("BroadcastNestedLoopJoin"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("c19 source overlap: gram-keyed equi-joins only; size dims broadcast") {
    val s = simplePlan(q("c19_source_overlap"))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
    // per-pair sizes join back broadcast (|sources|-row dims)
    assert("BroadcastHashJoin".r.findAllIn(s).length >= 2, s)
  }

  private def benchQ(name: String): DataFrame =
    graft.SparkEntry.registry.find(_.name == name).get.benchRun.get(spark, dir)

  test("s06 at-rest probe: query distance maps broadcast into the code scan; no corpus shuffle") {
    // the ADC estimate must be 8 broadcast-map lookups per code row — the
    // code table (the 100 TB side) joins only through BroadcastHashJoins;
    // any hashpartitioning of it would shuffle the corpus per query batch
    val s = simplePlan(benchQ("s06_pq_topk"))
    assert("BroadcastHashJoin".r.findAllIn(s).length >= 2, s) // qMaps est + shortlist re-rank
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"), s)
  }

  test("s02 at-rest probe: posting-index probe joins broadcast the query side") {
    val s = simplePlan(benchQ("s02_lsh_ann_topk"))
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("s05 at-rest probe: candidate generation is equi-join; only cell scoring crosses (broadcast, ~√n)") {
    val s = simplePlan(benchQ("s05_ivf_topk"))
    // queries × cells centroid scoring is a DELIBERATE broadcast cross
    // (√n-row build side); everything corpus-sized must stay equi-joined
    assert(!s.contains("CartesianProduct"), s)
    assert("BroadcastHashJoin".r.findAllIn(s).length >= 2, s) // probe-cell + member-embedding joins
  }

  test("s09 two-level IVF: only the coarse codebook crosses; fine level is equi-joined on coarse_id") {
    val p = plan(q("s09_two_level_ivf_topk"))
    // the ⁴√n coarse codebook may broadcast-cross (queries × coarse and the
    // assignment scoring); NOTHING may shuffle a cartesian — the fine
    // codebook and all member scoring must ride equi-joins on
    // coarse_id / fine_id so no corpus-sized side ever crosses
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("coarse_id"), p)
    assert(p.contains("fine_id"), p)
    // both assignment levels + probes use the bounded TopKPairs aggregate,
    // never a scored-pair window
    assert(p.contains("topk_pairs"), p)
    assert(!p.contains("row_number"), p)
  }

  test("V2 REST source: a chunk scan is a plain BatchScan with no exchange before the row output") {
    val key = graft.sources.RestClientRegistry.register(() =>
      new graft.pipeline.DataApiIngest.DataApiClient {
        def getJson(path: String, params: Map[String, String]) =
          graft.pipeline.Json.JObj.of("items" -> graft.pipeline.Json.JArr(Seq.empty))
      })
    try {
      val df = spark.read.format("graft.sources.RestVideosSource")
        .option("clientKey", key).option("videoIds", (1 to 120).map("v" + _).mkString(","))
        .load()
      val s = simplePlan(df)
      assert(s.contains("BatchScan"), s)
      assert(!s.contains("Exchange"), s) // items land partition-local
    } finally graft.sources.RestClientRegistry.unregister(key)
  }

  test("t18 MATTR: single scan, no shuffle beyond the output sort, codegen'd HOFs") {
    val sp = simplePlan(q("t18_mattr"))
    // per-row expression work only: the sole exchange is the final ORDER BY range
    assert("Exchange".r.findAllIn(sp).length <= 1, sp)
    assert(!sp.contains("SortMergeJoin") && !sp.contains("BroadcastHashJoin"), sp)
  }

  test("c25 DSIR: vocab and totals broadcast back; the token stream shuffles once") {
    val sp = simplePlan(q("c25_importance_resample"))
    assert(sp.contains("BroadcastHashJoin"), sp)
    assert(!sp.contains("SortMergeJoin"), sp)
    // TakeOrdered for the Gumbel top-k — never a global sort of all docs
    assert(sp.contains("TakeOrderedAndProject"), sp)
  }

  test("q78 BFS: frontier rounds are hash joins — no node-state broadcast, no cartesian") {
    // the shuffle_hash hints must hold: AQE broadcasting the frontier /
    // visited state from the driver each round is impossible at graph
    // scale (state ~ node count), and any pair-generating join is wrong.
    // Audited on ONE round's plan (the composed query checkpoints each
    // round, collapsing the returned plan to a union of leaves).
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.operators.Graphs
    val pairs = graft.Graft.table(spark, dir, "lineitem")
      .select(concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
        concat(lit("p"), col("l_partkey").cast("string")).as("dst")).distinct()
    val e = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = pairs.select(col("src").as("node")).distinct()
    val visited = seeds.withColumn("depth", lit(0L))
    val sp = simplePlan(Graphs.bfsRound(e, seeds, visited, 1))
    assert(sp.contains("ShuffledHashJoin"), sp)
    assert(!sp.contains("CartesianProduct"), sp)
    assert(!sp.contains("BroadcastNestedLoopJoin"), sp)
  }

  test("s11 IVFPQ at-rest probe: broadcasts only — the code table never sort-merges") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Clustering
    import graft.queries.ClusterQueries.{NProbe, NumSub, SubDim, PqRerank}
    val e = graft.Graft.table(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val qs = e.filter(col("id") % 50 === 0)
    val cells = Clustering.materializedCells(e, "id", "embedding")
    val assign = Clustering.assignCells(e, "id", "embedding", cells)
    // deployment layout: codes WRITTEN carrying their coarse cell — the
    // probe plan must then contain no corpus-sized sort-merge join at all
    val codesCell = Clustering.pqCodes(e, "id", "embedding", cells, NumSub, SubDim)
      .join(assign.select(col("vec_id"), col("cell_id")), "vec_id")
      .localCheckpoint()
    val sp = simplePlan(Clustering.ivfPqTopKFromIndex(qs, e, cells, assign, codesCell,
      5, NProbe, NumSub, SubDim, rerank = PqRerank))
    assert(sp.contains("BroadcastHashJoin"), sp)
    assert(!sp.contains("SortMergeJoin"), sp)
    assert(!sp.contains("CartesianProduct"), sp)
  }

  test("s15 residual IVFADC at-rest probe: corpus code scan broadcasts only, never sort-merges") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Clustering
    import graft.queries.ClusterQueries.{NProbe, NumSub, SubDim, PqRerank}
    val e = graft.Graft.table(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val qs = e.filter(col("id") % 50 === 0)
    val cells = Clustering.materializedCells(e, "id", "embedding")
    val rcb = Clustering.residualCodebook(cells).localCheckpoint()
    // deployment layout: the cell-carrying residual code table at rest —
    // the probe joins it ONLY against broadcast per-probe tables
    val codes = Clustering.residualPqCodes(e, "id", "embedding", cells, rcb,
      NumSub, SubDim).localCheckpoint()
    val sp = simplePlan(Clustering.ivfAdcResidualFromIndex(qs, e, cells, rcb, codes,
      5, NProbe, NumSub, SubDim, rerank = PqRerank))
    assert(sp.contains("BroadcastHashJoin"), sp)
    assert(!sp.contains("SortMergeJoin"), sp)
    assert(!sp.contains("CartesianProduct"), sp)
  }

  test("t20 held-out LM: all three model joins broadcast; the doc bigram stream never sort-merges") {
    val p = simplePlan(q("t20_backoff_xent"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"model join degraded to sort-merge\n$p")
  }

  test("c27 corpus report: one scan, source-keyed aggregation, no join") {
    val p = simplePlan(q("c27_corpus_report"))
    assert(!p.contains("Join"), s"report should be join-free\n$p")
    // distinct-agg rewrite (expand) still keys every exchange on source
    assert(p.contains("hashpartitioning(source"), p)
  }

  test("s13 filtered search: the metadata predicate reaches the parquet scan") {
    val p = plan(q("s13_filtered_topk"))
    assert(p.contains("PushedFilters: [IsNotNull(label)"), s"label filter not pushed\n$p")
  }

  test("s20 SQ8: query side broadcast, shortlist and rerank via bounded TopKPairs, no window") {
    val p = simplePlan(q("s20_sq8_adc_topk"))
    assert(p.contains("topk_pairs"), s"no TopKPairs aggregate\n$p")
    assert(!p.contains("Window"), s"unexpected window top-k\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q79 Adamic-Adar: wedge and anti joins are equi-joins — no pair-generating join") {
    val p = simplePlan(q("q79_adamic_adar"))
    assert(!p.contains("CartesianProduct"), s"cartesian in the wedge path\n$p")
    // the weight-table join broadcasts; the wedge join keys on the center
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
