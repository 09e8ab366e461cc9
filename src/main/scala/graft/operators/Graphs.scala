package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames.
  *
  * PageRank here is the fixed-iteration power method in INTEGER micro-units
  * (rank 1.0 ≡ 1,000,000): contributions are floor divisions and the
  * damping factor is the exact integer map x ↦ ⌊85·x/100⌋, so every engine
  * (and every partitioning / addition order) produces bit-identical ranks —
  * which is what lets a SQL oracle verify a 5-iteration run value-for-value.
  * A production deployment would flip the arithmetic to doubles and iterate
  * to convergence; the PLAN is unchanged.
  *
  * 100 TB posture: each iteration is one shuffle — edges join ranks on src
  * (both sides hash-partitioned on the node id; on a cluster the edge table
  * would be pre-partitioned/bucketed by src ONCE and the partitioning
  * reused every iteration) followed by a map-combined sum per dst. Rank
  * state is 2 longs per node; edges never leave their partitions after the
  * first co-partitioning. Out-degrees are computed once up front.
  * Companion ops [[Curation.connectedComponents]] (large/small-star) cover
  * the component side of the graph family.
  */
object Graphs {

  /** Edges per co-partitioned state partition for the iterative ops —
    * the SCALE-ADAPTIVE partitioning rule (optimization guide §2: size
    * partitions from the data, never from the local core count). A
    * 32-reducer iteration over a 1M-edge graph measured 2-3.7 s of
    * shuffle-WRITE time per round on 7 MB of payload (32×32 tiny-block
    * pathology); 8 partitions wrote the same rounds in 25-137 ms. The cap
    * at 2× default parallelism keeps big graphs fully parallel — there the
    * divisor never binds. */
  private[graft] val EdgesPerStatePartition = 131072L

  /** Derive the iteration partition count from the edge count (caller
    * passes an exact count or a cheap upper bound). */
  private[graft] def statePartitions(spark: SparkSession, edgeCount: Long): Int =
    sys.env.get("SPARK_GRAFT_GRAPH_PARTITIONS").flatMap(_.toIntOption).getOrElse {
      val p = math.ceil(edgeCount.toDouble / EdgesPerStatePartition).toLong
      math.max(1L, math.min(p, spark.sparkContext.defaultParallelism.toLong * 2)).toInt
    }

  /** Run `body` with `spark.sql.shuffle.partitions` pinned to `p` — the
    * iterative ops materialize THEIR WHOLE RUN inside (eager final
    * checkpoint), so every internal exchange (state shuffles, aggs, the
    * co-partitioned cache) lands at the scale-derived count instead of
    * the session default. Restored on exit; the caller's downstream plan
    * (final sort etc.) is unaffected. */
  private def withStatePartitions[T](spark: SparkSession, p: Option[Int])(body: => T): T =
    p match {
      case None => body
      case Some(n) =>
        val keys = Seq(
          // every exchange in the op at the scale-derived count
          "spark.sql.shuffle.partitions" -> n.toString,
          // AQE re-plans (and launches a driver-side materialization round
          // for) EVERY query stage; inside these ops the plan is fully
          // pinned already — join strategies hinted, partition counts
          // scale-derived, per-key fan-out bounded by design — so adaptive
          // re-planning buys nothing and its per-stage driver pause
          // dominates a 10-round iteration (measured: ~45% of q78's wall
          // was inter-job driver gaps). Restored on exit; the session
          // default (AQE on) still governs every non-iterative query.
          "spark.sql.adaptive.enabled" ->
            (sys.env.get("SPARK_GRAFT_GRAPH_AQE").contains("on")).toString)
        val prev = keys.map { case (k, _) => k -> spark.conf.get(k) }
        keys.foreach { case (k, v) => spark.conf.set(k, v) }
        try body finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
    }

  /** One rank unit in micro-units. */
  val RankUnit: Long = 1000000L

  /** Damping ⌊85·x/100⌋ and teleport 0.15 in micro-units. */
  val TeleportMicro: Long = 150000L

  /** Fixed-iteration integer PageRank over directed `edges` (src, dst)
    * (distinct pairs; parallel edges are collapsed). Dangling nodes (no
    * out-edges) contribute nothing — their mass exits the system, the
    * standard "no dangling redistribution" simplification; with symmetric
    * edge sets every node has out-degree ≥ 1 and no mass is lost.
    * Returns (node, rank_micro). */
  def pageRankMicro(spark: SparkSession, edges: DataFrame, iterations: Int,
      checkpointEvery: Int = 5, denseInflow: Boolean = false,
      edgeCountHint: Option[Long] = None): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val edgesDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
    pageRankMicroFromIndex(spark, nodes, edgesDeg, iterations, checkpointEvery,
      denseInflow, edgeCountHint)
  }

  /** [[pageRankMicro]] over PREBUILT at-rest graph artifacts: `nodes`
    * (node) and `edgesDeg` (src, dst, outdeg) — the deduped,
    * degree-annotated layout a deployment maintains once at write time
    * (the BenchIndex discipline), so the per-run cost is the iterations,
    * not the edge-dedup + degree shuffles. On a cluster the at-rest table
    * would be BUCKETED by src, making the per-iteration co-partitioning
    * free; here the frame is re-partitioned once and cached. */
  def pageRankMicroFromIndex(spark: SparkSession, nodesIn: DataFrame,
      edgesDegIn: DataFrame, iterations: Int,
      checkpointEvery: Int = 5,
      /** Caller-guaranteed: EVERY node has at least one in-edge (true for
        * any symmetric edge set). The per-iteration dangling fill —
        * `nodes LEFT JOIN contribs` + coalesce(inflow, 0) — is then an
        * identity (the contrib aggregate's key set IS the node set), so
        * skipping it removes one join AND one node-frame shuffle from
        * every iteration: 2 shuffles/iter → 1. Rank values are
        * bit-identical under the guarantee; a graph with genuinely
        * in-degree-0 nodes must keep the default. */
      denseInflow: Boolean = false,
      /** Edge count (exact or cheap upper bound, e.g. parquet metadata):
        * sizes every internal exchange via [[statePartitions]] instead of
        * the session default — see [[EdgesPerStatePartition]]. None keeps
        * the session's `spark.sql.shuffle.partitions`. */
      edgeCountHint: Option[Long] = None): DataFrame =
    withStatePartitions(spark, edgeCountHint.map(statePartitions(spark, _))) {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1, 20], got $iterations")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val nodes = nodesIn.select(col("node")).cache()
    // one cached (src, dst, outdeg) frame, pre-partitioned on the join key:
    // each iteration then shuffles ONLY the (node, rank) frame — the edge
    // list (the big side at graph scale) never moves again after this
    val edgesDeg = edgesDegIn.select(col("src"), col("dst"), col("outdeg"))
      .repartition(col("src"))
      .cache()
    var ranks = nodes.select(col("node"), lit(RankUnit).as("rank_micro"))
    for (iter <- 1 to iterations) {
      // shuffle_hash hints: without them AQE broadcasts the node-sized rank
      // state from the driver EVERY iteration — latency-bound at bench
      // scale and impossible at cluster scale (rank state ~ node count).
      // Hash-partitioned joins reuse edgesDeg's cached src partitioning
      // and contribs' agg partitioning, so each iteration moves only the
      // (node, rank) frame — the documented posture.
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"),
          expr("rank_micro div outdeg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("inflow"))
      val next =
        if (denseInflow) contribs.select(col("node"),
          (lit(TeleportMicro) + expr("85 * inflow div 100")).as("rank_micro"))
        else nodes
          .join(contribs.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"),
            (lit(TeleportMicro) +
              expr("85 * coalesce(inflow, 0L) div 100")).as("rank_micro"))
      // truncate the lineage every `checkpointEvery` rounds: each
      // checkpoint round costs a fixed materialization-job launch, while a
      // deeper nested plan between checkpoints costs only plan/codegen
      // size — and the nest is BOUNDED at checkpointEvery join+agg levels,
      // so neither analysis time nor failure-recovery depth grows with
      // total iterations. A/B at sf0.1, 5 iterations, warm (BASELINE.md
      // round 6): cadence 1 → 6.0 s, 2 → 3.2 s, 5 → 2.8 s, all
      // bit-identical ranks — the per-round job-launch fixed cost
      // dominates, hence the cadence-5 default. localCheckpoint is LAZY
      // (materializes inside the next job, no driver collect); the final
      // iteration always checkpoints so callers never receive an
      // unbounded-lineage frame.
      // the FINAL checkpoint is eager: once the result is materialized the
      // cached setup frames can be released (repeated calls must not pin
      // block-manager storage for the session's lifetime)
      ranks =
        if (iter == iterations) next.localCheckpoint(true)
        else if (iter % checkpointEvery == 0) next.localCheckpoint(false)
        else next
    }
    nodes.unpersist()
    edgesDeg.unpersist()
    ranks
    }

  /** PERSONALIZED PageRank (Haveliwala 2002 topic-sensitive variant, same
    * integer micro-unit arithmetic as [[pageRankMicro]]): teleport mass
    * lands ONLY on the `seeds` node set, so rank measures proximity to the
    * seeds rather than global centrality — the crawl-frontier /
    * seed-expansion ranking a training-data acquisition pipeline runs
    * ("given these trusted sources, which candidates are closest?").
    * Non-seed nodes start at 0 and receive rank only through inflow.
    *
    * Plan is identical to [[pageRankMicro]] — the cached pre-partitioned
    * (src, dst, outdeg) frame never moves after setup; each iteration
    * shuffles only the (node, rank) frame; the seed flag rides the cached
    * node frame (one broadcast-or-hash join at setup, reused every
    * round). Same checkpoint cadence and lineage bound. */
  def personalizedPageRankMicro(spark: SparkSession, edges: DataFrame,
      seeds: DataFrame, iterations: Int, checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1, 20], got $iterations")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(seeds.select(col("node"), lit(true).as("__seed")).distinct(),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(false)).as("is_seed"))
      .cache()
    val edgesDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src"))
      .cache()
    val teleport = when(col("is_seed"), lit(TeleportMicro)).otherwise(lit(0L))
    var ranks = nodes.select(col("node"),
      when(col("is_seed"), lit(RankUnit)).otherwise(lit(0L)).as("rank_micro"))
    for (iter <- 1 to iterations) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"),
          expr("rank_micro div outdeg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("inflow"))
      val next = nodes
        .join(contribs.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"),
          (teleport + expr("85 * coalesce(inflow, 0L) div 100")).as("rank_micro"))
      ranks =
        if (iter == iterations) next.localCheckpoint(true) // eager: release caches below
        else if (iter % checkpointEvery == 0) next.localCheckpoint(false)
        else next
    }
    nodes.unpersist()
    edgesDeg.unpersist()
    ranks
  }

  /** Multi-source BFS depths (unweighted shortest paths, k-hop seed
    * expansion) over directed `edges`: (node, depth) = MIN hop count from
    * any seed, for every node reached within `maxDepth` hops (seeds at 0).
    * The training-data acquisition shape: "expand k hops out from these
    * trusted seed sources" — the exact-frontier companion to
    * [[personalizedPageRankMicro]]'s proximity rank.
    *
    * Plan: the deduped edge frame is pre-partitioned on src and cached
    * ONCE (the big side never moves again); each round shuffles only the
    * FRONTIER — nodes first reached at depth d — through one shuffle_hash
    * join + distinct + left_anti against the visited set (node-bounded,
    * never edge-bounded). Rounds are FIXED at maxDepth: a frontier that
    * empties early makes the remaining rounds empty joins rather than
    * paying a driver-side emptiness action per round (which would
    * serialize the job stream). Integer depths — deterministic on any
    * partitioning.
    *
    * Every round CHECKPOINTS its frontier (lazy localCheckpoint) — unlike
    * [[pageRankMicro]]'s cadence-5, because here round d's anti-join
    * re-reads EVERY prior frontier through the visited union: left
    * un-materialized, round-i work re-executes once per later round
    * (multiplicative re-computation: the warm sf0.1 bench read 14.9 s
    * without per-round checkpoints, 1.4 s with, 4 rounds), while the
    * materialization itself is frontier-sized — node-bounded, never
    * edge-bounded. */
  def bfsDepths(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
      maxDepth: Int, undirected: Boolean = false,
      edgeCountHint: Option[Long] = None): DataFrame =
    bfsDepthsFromIndex(spark, edges.select(col("src"), col("dst")).distinct(),
      seeds, maxDepth, undirected, edgeCountHint)

  /** [[bfsDepths]] over a PREBUILT deduped edge list — the at-rest layout
    * (BenchIndex discipline): per-run cost skips the edge-dedup shuffle;
    * a bucketed-by-src deployment table would also skip the
    * re-partitioning this method still pays once. */
  def bfsDepthsFromIndex(spark: SparkSession, dedupedEdges: DataFrame,
      seeds: DataFrame, maxDepth: Int,
      /** Caller-guaranteed: the edge set is SYMMETRIC (both directions
        * present). A candidate reached from the depth-(d-1) frontier then
        * has depth ≥ d-2 (one hop can lower depth by at most 1), so the
        * per-round anti-join needs only the LAST TWO layers as its
        * exclusion set instead of the whole visited union — the build
        * side stays frontier-bounded for the entire run rather than
        * growing toward |V|. Depths are identical under the guarantee;
        * directed graphs must keep the default (a far-older node can be
        * re-reached through a long forward path). */
      undirected: Boolean = false,
      /** Edge count (exact or cheap upper bound): sizes every internal
        * exchange via [[statePartitions]]; None keeps the session
        * default. */
      edgeCountHint: Option[Long] = None): DataFrame =
    withStatePartitions(spark, edgeCountHint.map(statePartitions(spark, _))) {
    require(maxDepth >= 1 && maxDepth <= 20, s"maxDepth must be in [1, 20], got $maxDepth")
    val e = dedupedEdges.select(col("src"), col("dst"))
      .repartition(col("src")).cache()
    // layers(d) = nodes first reached at depth d, each lazily checkpointed
    // ONCE — every layer is an ancestor of the final round through the
    // frontier chain, so the final EAGER checkpoint materializes them all;
    // total persisted state is O(V) instead of the O(V·maxDepth) the
    // per-round visited-union re-materialization used to hold.
    var layers = Vector(seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("depth"))
      .localCheckpoint(false))
    var frontier = layers.head.select(col("node"))
    for (d <- 1 to maxDepth) {
      val exclude = (if (undirected) layers.takeRight(2) else layers)
        .map(_.select(col("node"))).reduce(_ union _)
      // final round checkpoints EAGERLY so the cached edge frame can be
      // released before returning — repeated calls (q78 per run, the scale
      // A/B's 1×/10× copies) must not accumulate pinned storage in the
      // block manager for the session's lifetime
      val next = bfsRound(e, frontier, exclude, d).localCheckpoint(d == maxDepth)
      layers = layers :+ next
      frontier = next.select(col("node"))
    }
    e.unpersist()
    layers.reduce(_ union _)
  }

  /** One BFS round: nodes first reached at depth `d` — factored out so
    * the plan audit can pin the round's physical shape (the per-round
    * checkpoints hide it from the composed plan). */
  private[graft] def bfsRound(e: DataFrame, frontier: DataFrame,
      visited: DataFrame, d: Int): DataFrame =
    e.join(frontier.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
      .select(col("dst").as("node")).distinct()
      .join(visited.select(col("node")).hint("shuffle_hash"), Seq("node"), "left_anti")
      .select(col("node"), lit(d.toLong).as("depth"))

  /** Double-arithmetic power-method reference (same plan, float math) — the
    * executable specification the integer variant is sanity-checked against
    * in GraphsSpec (rank ordering agreement). */
  def pageRankDouble(spark: SparkSession, edges: DataFrame, iterations: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val edgesDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .cache()
    var ranks = nodes.select(col("node"), lit(1.0).as("rank"))
    for (iter <- 1 to iterations) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("inflow"))
      ranks = nodes
        .join(contribs.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"), (lit(0.15) + lit(0.85) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint(iter == iterations) // final is eager: release caches below
    }
    nodes.unpersist()
    edgesDeg.unpersist()
    ranks
  }

  /** Root + depth resolution over a parent-pointer forest — the recursive-CTE
    * capability (`WITH RECURSIVE` hierarchy walks: org charts, category
    * trees, thread ancestry) Spark SQL lacks, via POINTER DOUBLING: each
    * round every node's known ancestor jumps to that ancestor's known
    * ancestor, so the resolved distance doubles per round and a forest of
    * depth d needs ⌈log₂ d⌉ rounds — NOT d rounds like the naive
    * one-level-per-iteration walk (at a 100 TB scale a depth-1000 chain
    * resolves in 10 shuffles instead of 1000).
    *
    * `parents`: (node, parent) with parent NULL for roots; every parent
    * value must itself appear as a node. Each round is ONE self equi-join
    * on the ancestor key (both sides hash-partitioned on it). `rounds`
    * must satisfy 2^rounds ≥ max depth; extra rounds are cheap no-ops
    * (the fixpoint is stable: a root's ancestor is itself at distance 0).
    *
    * Lineage cadence differs from [[pageRankMicro]] deliberately: the
    * state frame feeds BOTH sides of the round's self-join, on different
    * keys (node vs anc), so neither exchange reuse nor plan sharing dedups
    * it — without truncation the un-truncated subtree DOUBLES per round
    * (2^k leaf recomputes after k rounds). The default therefore
    * checkpoints every round; with only ⌈log₂ depth⌉ total rounds the
    * per-round materialization cost is bounded and small.
    *
    * Returns (node, root, depth) — exact integers, so an external
    * recursive oracle verifies values bit-for-bit.
    *
    * Precondition: every non-null parent value appears as a node —
    * violations would silently DROP the orphaned subtree at the first
    * self-join. `validateParents = true` spends one up-front anti-join
    * count to fail fast on malformed input instead (off by default: the
    * check is eager, and trusted pipelines shouldn't pay it per call). */
  def hierarchyRollup(parents: DataFrame, rounds: Int, checkpointEvery: Int = 1,
      validateParents: Boolean = false,
      /** Node count (exact or cheap upper bound): sizes each round's
        * self-join exchanges via [[statePartitions]] instead of the
        * session default — the per-round state is node-sized, and the
        * lazy checkpoints plan (toRdd) at construction, inside the conf
        * window. None keeps the session settings. */
      nodeCountHint: Option[Long] = None): DataFrame =
    withStatePartitions(parents.sparkSession,
      nodeCountHint.map(statePartitions(parents.sparkSession, _))) {
    require(rounds >= 1 && rounds <= 30, s"rounds must be in [1, 30], got $rounds")
    if (validateParents) {
      val orphans = parents.filter(col("parent").isNotNull)
        .join(parents.select(col("node").as("parent")), Seq("parent"), "left_anti")
        .count()
      require(orphans == 0L,
        s"$orphans row(s) reference a parent that never appears as a node — " +
          "their subtrees would silently drop; fix the input or add the missing roots")
    }
    var st = parents.select(
      col("node"),
      coalesce(col("parent"), col("node")).as("anc"),
      when(col("parent").isNull, lit(0L)).otherwise(lit(1L)).as("depth"))
    for (iter <- 1 to rounds) {
      val jump = st.select(
        col("node").as("j_node"), col("anc").as("j_anc"), col("depth").as("j_depth"))
      val next = st
        .join(jump.hint("shuffle_hash"), col("anc") === col("j_node"))
        .select(col("node"), col("j_anc").as("anc"),
          (col("depth") + col("j_depth")).as("depth"))
      st =
        if (iter % checkpointEvery == 0 || iter == rounds) next.localCheckpoint(false)
        else next
    }
    st.select(col("node"), col("anc").as("root"), col("depth"))
  }

  /** Per-node triangle counts via DEGREE-ORDERED ORIENTATION (Schank's
    * forward algorithm; the MapReduce formulation is Suri & Vassilvitskii
    * WWW'11): orient each undirected edge from its (degree, id)-smaller
    * endpoint to the larger, join oriented paths s→t₁, s→t₂ (t₁ < t₂ in
    * the SAME orientation order), and close each wedge against the
    * oriented edge t₁→t₂. Every triangle is produced exactly once — at
    * its orientation-minimal vertex — then exploded to its three corners
    * for the per-node aggregate.
    *
    * Why orientation is the scale move: a naive wedge join fans out
    * Σ deg(v)² — one celebrity node in a power-law graph is a quadratic
    * hot key. Orienting toward HIGHER degree caps every out-degree at
    * O(√m) (a node with out-degree d has d higher-degree successors, so
    * d·deg ≤ 2m with deg ≥ d), so the wedge join's fan-out is
    * Σ outdeg(v)² ≤ O(m^1.5) — the best possible bound for triangle
    * enumeration, and per-key bounded so the shuffle has no hot keys.
    * All joins are equi-joins (wedge on s; closure on the (t₁,t₂) pair).
    *
    * Input: undirected `edges` with (u, v) columns (direction and
    * duplicates ignored; self-loops dropped). Returns (node, n_triangles)
    * for every node in ≥ 1 triangle.
    *
    * Execution notes (round-6 measurement, sf0.1 co-purchase graph):
    * the oriented edge set `o` feeds THREE join sides (wedge p1/p2 +
    * closure), and uncached its whole upstream pipeline (self-join →
    * distinct → degree joins) re-executed per side — caching it removes
    * two full recomputes. The closure join's probe side is the wedge
    * fan-out (Σ outdeg² — the Θ(m^1.5) term); when the edge list itself
    * is SMALL, broadcasting `o` turns the closure into a map-side hash
    * probe and the WEDGE SET never shuffles at all. The gate is low
    * (`closureBroadcastMaxEdges` = 1M edges ≈ 24 MB) because the
    * broadcast is rebuilt per ACTION — a driver collect of the whole edge
    * set every run — and the round-15 A/B at 3.1M edges measured the
    * broadcast plan 2× SLOWER and wildly unstable (min-of-3 spread 5.0 →
    * 7.0 s, allocation/GC-bound on the per-run collect) vs the
    * shuffle-hash closure's tight 2.5–2.9 s. Past the gate the wedge
    * stream shuffles — the honest cost at scale, its keys fan-out-bounded
    * by the orientation. The count() gating the choice is a 1-long driver
    * pull off the already-cached `o`.
    *
    * Lifecycle knobs (plan-only callers and long sessions): the gate
    * count materializes the cache at DEFINITION time — pass
    * `orientedEdgeCountHint` (any upper bound ≤ `closureBroadcastMaxEdges`
    * picks broadcast, anything above it picks shuffle) to keep the call
    * fully lazy, e.g. when only `.explain` is wanted. The cache entry
    * lives until Spark's LRU evicts it; callers issuing many triangle
    * queries per session can pass `cacheOriented = false` (correct, at
    * the cost of the oriented set recomputing per join side) instead of
    * accumulating entries. */
  def triangleCounts(edges: DataFrame,
      closureBroadcastMaxEdges: Long = 1000000L,
      orientedEdgeCountHint: Option[Long] = None,
      cacheOriented: Boolean = true): DataFrame =
    triangleCountsFromOriented(orientEdges(edges), closureBroadcastMaxEdges,
      orientedEdgeCountHint, cacheOriented)

  /** Degree-ordered orientation of an undirected edge list — the at-rest
    * triangle-query layout (duplicates/direction collapsed, self-loops
    * dropped, each edge oriented toward its (degree, id)-larger endpoint
    * with the target degree riding along). Built once at write time by a
    * deployment (BenchIndex discipline); [[triangleCountsFromOriented]]
    * probes it. Output: (s, t, dt). */
  /** Adamic–Adar link-prediction scores (Adamic & Adar 2003): for every
    * non-adjacent pair (u, v) sharing at least one neighbor,
    * AA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z) — common neighbors weighted
    * down by their promiscuity, the classic strong baseline for "which
    * edge appears next".
    *
    * Determinism: the per-center weight is the INTEGER fixed point
    * round(1e9/ln d) computed once per distinct degree (the m14
    * integer-table trick) — the score is an exact BIGINT sum, never a
    * float fold, so the ranking is engine-exact and an SQL oracle can
    * interpolate the identical weight table. Output carries `aa_e9`
    * (score × 1e9) plus the common-neighbor count.
    *
    * Scale: the wedge join fans out Σ_z C(deg z, 2) pairs — quadratic in
    * HUB degree, so centers above `maxDegree` are EXCLUDED (their
    * contribution 1/ln(deg) is the smallest anyway; dropping super-hubs
    * is standard practice in production link prediction, and the cap is
    * part of the operator's definition so the oracle applies it too).
    * Everything shuffles on center/pair keys; no all-pairs join. */
  def adamicAdar(edges: DataFrame, maxDegree: Int = 64): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val spark = edges.sparkSession
    import spark.implicits._
    // normalize to one (min, max) row per undirected edge so a caller
    // passing both orientations cannot double every degree
    val e = edges.select(least(col("u"), col("v")).as("u"),
      greatest(col("u"), col("v")).as("v")).filter(col("u") =!= col("v")).distinct()
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("z")).agg(count(lit(1)).as("deg"))
    val weights = (2 to maxDegree)
      .map(d => (d.toLong, math.round(1e9 / math.log(d.toDouble))))
      .toDF("deg", "w")
    // joining the bounded weight table doubles as the [2, maxDegree]
    // degree filter (deg-1 centers have no wedge; hubs are excluded)
    val centers = deg.join(broadcast(weights), Seq("deg"))
      .select(col("z"), col("w"))
    val adj = sym.join(centers, sym("u") === centers("z"))
      .select(col("z"), col("v").as("n"), col("w"))
    val left = adj.select(col("z"), col("n").as("na"), col("w"))
    val right = adj.select(col("z").as("zb"), col("n").as("nb"))
    val wedges = left.join(right, col("z") === col("zb") && col("na") < col("nb"))
      .select(col("na").as("u"), col("nb").as("v"), col("w"))
    wedges.join(e, Seq("u", "v"), "left_anti") // predict NEW links only
      .groupBy(col("u"), col("v"))
      .agg(sum(col("w")).as("aa_e9"),
        count(lit(1)).cast("bigint").as("common_neighbors"))
  }

  def orientEdges(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    // orient toward the (degree, id)-larger endpoint; u < v already, so a
    // degree tie keeps u as the source. `dt` (target degree) rides along
    // so the wedge join can order targets by the same orientation key
    // without re-joining degrees.
    e.join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("s"),
        when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("t"),
        when(col("du") <= col("dv"), col("dv")).otherwise(col("du")).as("dt"))
  }

  /** [[triangleCounts]] over a PREBUILT oriented edge set (`orientEdges`
    * output, possibly read back from at-rest parquet). */
  def triangleCountsFromOriented(oriented: DataFrame,
      closureBroadcastMaxEdges: Long = 1000000L,
      orientedEdgeCountHint: Option[Long] = None,
      cacheOriented: Boolean = true): DataFrame = {
    val oPlan = oriented.select(col("s"), col("t"), col("dt"))
    val o = if (cacheOriented) oPlan.cache() else oPlan
    // 1 long to the driver (materializes the cache) unless hinted lazy
    val m = orientedEdgeCountHint.getOrElse(o.count())
    // ONE scale-sized exchange on s feeds BOTH wedge sides: the subtrees
    // are identical, so the second side is a ReusedExchange — previously
    // each side shuffled the edge set separately, and at the session's
    // core-count reducers the tiny-block writes cost 1.7-2.1 s per side
    // on 12-15 MB of payload (guide §2.2). statePartitions sizes the
    // exchange from m, not the core count.
    val oP = o.repartition(statePartitions(oriented.sparkSession, m), col("s"))
    // wedge: two out-edges of s with t₁ < t₂ in orientation (deg, id)
    // order, so each unordered wedge is emitted once; closure: the
    // oriented edge t₁→t₂ must exist with exactly that direction.
    // shuffle_hash on the p2 side: both sides are already co-partitioned
    // (no new exchange) and sort-merge would SORT the edge set twice just
    // to stream wedges out.
    val closure =
      if (m <= closureBroadcastMaxEdges) broadcast(o.as("e3"))
      // past the gate, pin a SHUFFLED HASH join with the edge set as the
      // build side: the wedge stream is Θ(m^1.5) rows and must shuffle
      // either way, but sort-merge would SORT it too — measured 196 s →
      // 79 s at 12M edges (GraphScaleAb). Build side is edges/partitions
      // (~24 B/edge), executor-safe at any m with sane partition counts.
      else o.as("e3").hint("shuffle_hash")
    val wedges = oP.as("p1").join(oP.as("p2").hint("shuffle_hash"),
        col("p1.s") === col("p2.s") &&
          (col("p1.dt") < col("p2.dt") ||
            (col("p1.dt") === col("p2.dt") && col("p1.t") < col("p2.t"))))
      .select(col("p1.s").as("a"), col("p1.t").as("b"), col("p2.t").as("c"))
    // BLOOM PRE-FILTER before the wedge exchange (guide §3.2): most wedges
    // never close — only (b,c) pairs that are themselves oriented edges
    // survive the closure join — so probing a sketch of the edge keys IN
    // THE WEDGE-GENERATING STAGE drops the dead wedges before the Θ(m^1.5)
    // stream is shuffled (sf0.1 co-purchase: 500 MB → ~120 MB at fpp 2%).
    // False positives only re-join; no false negatives, so the triangle
    // set is unchanged. Skipped on the broadcast path (already map-side).
    val survivors =
      if (m <= closureBroadcastMaxEdges) wedges
      else {
        val sketch = o.agg(graft.sql.Bloom.bloomFilterAgg(
          xxhash64(col("s"), col("t")), math.max(m, 1L), 0.02).as("bf"))
        wedges.filter(graft.sql.Bloom.mightContain(sketch.scalar(),
          xxhash64(col("b"), col("c"))))
      }
    // the closure exchanges carry the bloom-filtered wedge stream (~edge
    // scale after the filter) — size them like the edge exchanges instead
    // of inheriting the session reducer count
    val pW = statePartitions(oriented.sparkSession, m)
    val wedgesP =
      if (m <= closureBroadcastMaxEdges) survivors
      else survivors.repartition(pW, col("b"), col("c"))
    val tri = wedgesP
      .join(closure, col("e3.s") === col("b") && col("e3.t") === col("c"))
      .select(col("a"), col("b"), col("c"))
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
