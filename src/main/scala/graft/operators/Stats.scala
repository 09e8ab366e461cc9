package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical aggregates (variance / stddev / covariance / correlation)
  * computed from exact sufficient statistics.
  *
  * 100 TB posture: the whole family reduces to ONE map-combined hash
  * aggregation producing the sufficient statistics (n, Σx, Σy, Σx², Σy²,
  * Σxy) — a single shuffle whose payload is a handful of decimals per
  * group, identical to how `stddev`/`corr` are computed internally but with
  * DECIMAL sums so the result is independent of partitioning and addition
  * order (float `stddev` is not: its merge order varies run to run).
  * The final moments are derived per group-row in double arithmetic with a
  * fixed expression shape, so any engine computing the same shape from the
  * same exact sums reproduces bit-identical values.
  *
  * This is also the scale-correct alternative to two-pass mean-then-moment
  * formulations: no second scan, no broadcast of means.
  */
object Stats {

  /** Input domain: money-like doubles with ≤2 decimals (TPC-H prices and
    * quantities). DECIMAL(18,2) holds each value exactly; products then fit
    * DECIMAL(38,4) sums. */
  private val in = DecimalType(18, 2)

  /** The six exact sufficient statistics of (x, y) per group. */
  def sufficientStats(df: DataFrame, groupCols: Seq[Column], x: Column, y: Column): DataFrame = {
    val xd = x.cast(in)
    val yd = y.cast(in)
    df.groupBy(groupCols: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(xd).as("sx"),
        sum(yd).as("sy"),
        sum(xd * xd).as("sxx"),
        sum(yd * yd).as("syy"),
        sum(xd * yd).as("sxy"))
  }

  /** Derived moments, all in double with one fixed shape:
    *   mean      = sx / n
    *   var_samp  = (sxx − sx·sx/n) / (n−1)
    *   covar_samp= (sxy − sx·sy/n) / (n−1)
    *   corr      = (sxy − sx·sy/n) / sqrt((sxx − sx·sx/n)·(syy − sy·sy/n))
    * rounded to 6 decimals. Groups with n = 1 get NULL spread moments
    * (sample denominators), matching SQL `*_samp` semantics. */
  def momentStats(df: DataFrame, groupCols: Seq[Column], x: Column, y: Column): DataFrame = {
    val s = sufficientStats(df, groupCols, x, y)
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    val mxx = sxx - sx * sx / n
    val myy = syy - sy * sy / n
    val mxy = sxy - sx * sy / n
    val one = when(col("n") > 1, lit(1.0))
    s.select(
      groupCols.map(c => c) ++ Seq(
        col("n"),
        round(sx / n, 6).as("mean_x"),
        round(sy / n, 6).as("mean_y"),
        round(one * mxx / (n - 1.0), 6).as("var_x"),
        round(one * sqrt(mxx / (n - 1.0)), 6).as("stddev_x"),
        round(one * mxy / (n - 1.0), 6).as("covar_xy"),
        round(one * mxy / sqrt(mxx * myy), 6).as("corr_xy")): _*)
  }

  /** Fixed-width histogram (width_bucket shape) over a money-like column.
    * Binning runs in INTEGER cents — `cast(v as DECIMAL(18,2)) × 100` is
    * exact for ≤2-decimal values, so bin assignment is engine-portable
    * arithmetic (no float-boundary ambiguity at bin edges, where a double
    * epsilon would flip a row's bucket between engines). Values ≥ the top
    * edge clamp into the last bin (width_bucket's overflow bucket merged
    * in); `lo` must not exceed the minimum. One hash-agg shuffle of ≤nbins
    * groups; at 100 TB the map-side partial aggregation reduces each task
    * to nbins counters before anything moves.
    *
    * Returns (bin, bin_lo, bin_hi, cnt) for non-empty bins. */
  def histogram(df: DataFrame, valueCol: Column, lo: BigDecimal, width: BigDecimal,
      nbins: Int): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(nbins > 0, s"nbins must be positive, got $nbins")
    val cents = (valueCol.cast(in) * 100).cast("bigint")
    val loCents = (lo * 100).toBigIntExact
      .getOrElse(throw new IllegalArgumentException(s"lo must have <=2 decimals: $lo")).toLong
    val wCents = (width * 100).toBigIntExact
      .getOrElse(throw new IllegalArgumentException(s"width must have <=2 decimals: $width")).toLong
    // floor(double division) is exact here: cents values are integers far
    // below 2^53, so both engines' IEEE division+floor agree bit-for-bit
    // (Spark's `/` on longs is double division; DuckDB `//` floors too).
    val bin = least(floor((cents - loCents) / wCents).cast("bigint"), lit(nbins - 1L))
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("bin"),
        ((lit(loCents) + col("bin") * wCents).cast("double") / 100.0).as("bin_lo"),
        ((lit(loCents) + (col("bin") + 1) * wCents).cast("double") / 100.0).as("bin_hi"),
        col("cnt"))
  }

  /** Pareto frontier (2D skyline, maximize BOTH dimensions): the rows no
    * other row dominates, where q dominates p iff q.x ≥ p.x ∧ q.y ≥ p.y
    * with at least one strict. Duplicate (x, y) points dominate neither
    * and all stay on the frontier.
    *
    * The textbook SQL is a quadratic NOT-EXISTS self-join — O(n²)
    * comparisons and a nested-loop plan. This is the scale shape instead:
    *
    *  1. bucket-local prune: rows hash into `pruneBuckets` groups on the
    *     id; within each bucket one (bucket, x)-keyed max-y aggregate and
    *     one bucket-keyed suffix-max window find the bucket's own exact
    *     frontier. A bucket frontier is a SUPERSET-member filter: anything
    *     dominated inside its bucket is dominated globally, so pruning is
    *     lossless (and the result is bucket-assignment invariant).
    *  2. global resolve: the same two-window computation over the
    *     surviving candidates in one partition. Candidates ≈ sum of
    *     bucket-frontier sizes — frontiers of random buckets are tiny
    *     (O(log n) expected for independent dims), so the single-partition
    *     stage is output-bounded, the same justification as a driver-side
    *     top-k tail. Worst case (all points on the frontier) is inherent
    *     to the operator, not the plan.
    *
    * Strict-dominance bookkeeping without fragile row-frames: group rows
    * by x first, so "rows before mine in x-descending order" is exactly
    * "strictly greater x" — `bestAbove = max(ymax) over preceding x
    * groups`. A row survives iff it holds its x-group's max y (no same-x
    * point strictly above) and bestAbove < y (no greater-x point at-or-
    * above). Everything is equi-joins, hash aggregates and windows —
    * no cartesian product anywhere.
    *
    * Returns the frontier rows with their original columns. */
  def paretoFrontier(df: DataFrame, idCol: String, xCol: String, yCol: String,
      pruneBuckets: Int = 64): DataFrame = {
    require(pruneBuckets >= 1, s"pruneBuckets must be >= 1, got $pruneBuckets")
    def frontierWithin(d: DataFrame, bucket: Column): DataFrame = {
      val b = d.withColumn("__graft_bucket", bucket)
      val perX = b.groupBy(col("__graft_bucket"), col(xCol))
        .agg(max(col(yCol)).as("__graft_ymax"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__graft_bucket"))
        .orderBy(col(xCol).desc)
        .rowsBetween(Long.MinValue, -1)
      val xs = perX.withColumn("__graft_best_above", max(col("__graft_ymax")).over(w))
      b.join(xs, Seq("__graft_bucket", xCol))
        .filter(col(yCol) === col("__graft_ymax") &&
          (col("__graft_best_above").isNull || col("__graft_best_above") < col(yCol)))
        .drop("__graft_bucket", "__graft_ymax", "__graft_best_above")
    }
    val pruned = frontierWithin(df, pmod(xxhash64(col(idCol)), lit(pruneBuckets.toLong)))
    frontierWithin(pruned, lit(0L))
  }

  /** Population Stability Index per group — the standard drift score
    * between a reference slice and a comparison slice of the same column:
    * `PSI = Σ_bins (p_cmp − p_ref) · ln(p_cmp / p_ref)` over fixed-width
    * value bins ([[histogram]]'s integer-cents binning). PSI < 0.1 is
    * conventionally "stable", > 0.25 "drifted" — the monitoring gate a
    * production scoring pipeline runs per feature per day.
    *
    * Determinism across engines and partitionings:
    *  - bins and counts are exact integers;
    *  - proportions are Laplace-smoothed `(n_bin + 1) / (n_total + nbins)`
    *    — empty bins contribute a finite term instead of ±∞, and the
    *    ratio of exact longs divides identically in IEEE double anywhere;
    *  - each bin's term is rounded to 9 decimals and summed as
    *    DECIMAL(28,9) (order-independent), then rounded to 6 — the same
    *    discipline as the engine's other float reductions.
    *
    * Plan: ONE map-combined (group, bin, slice)-count aggregate over the
    * data, a broadcast-joined dense bin frame (groups × nbins rows) so
    * empty bins surface, and a constant-width final aggregate. Nothing
    * scales with row count but the first pass.
    *
    * Returns (groupCol, n_ref, n_cmp, psi). */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: Column, isRef: Column,
      lo: BigDecimal, width: BigDecimal, nbins: Int): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(nbins > 0, s"nbins must be positive, got $nbins")
    val cents = (valueCol.cast(in) * 100).cast("bigint")
    val loCents = (lo * 100).toBigIntExact
      .getOrElse(throw new IllegalArgumentException(s"lo must have <=2 decimals: $lo")).toLong
    val wCents = (width * 100).toBigIntExact
      .getOrElse(throw new IllegalArgumentException(s"width must have <=2 decimals: $width")).toLong
    val bin = least(floor((cents - loCents) / wCents).cast("bigint"), lit(nbins - 1L))
    val counts = df
      .groupBy(col(groupCol), bin.as("bin"))
      .agg(sum(when(isRef, 1L).otherwise(0L)).as("nr"),
        sum(when(isRef, 0L).otherwise(1L)).as("nc"))
    val dense = df.select(col(groupCol)).distinct()
      .select(col(groupCol), explode(sequence(lit(0L), lit(nbins - 1L))).as("bin"))
    val binned = dense.join(counts, Seq(groupCol, "bin"), "left")
      .select(col(groupCol), col("bin"),
        coalesce(col("nr"), lit(0L)).as("nr"), coalesce(col("nc"), lit(0L)).as("nc"))
    val totals = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val withP = binned
      .withColumn("tr", sum(col("nr")).over(totals))
      .withColumn("tc", sum(col("nc")).over(totals))
      .withColumn("pr", (col("nr") + 1).cast("double") / (col("tr") + nbins).cast("double"))
      .withColumn("pc", (col("nc") + 1).cast("double") / (col("tc") + nbins).cast("double"))
    withP
      .select(col(groupCol), col("tr"), col("tc"),
        round((col("pc") - col("pr")) * log(col("pc") / col("pr")), 9)
          .cast(DecimalType(28, 9)).as("term"))
      .groupBy(col(groupCol))
      .agg(max(col("tr")).as("n_ref"), max(col("tc")).as("n_cmp"),
        round(sum(col("term")).cast("double"), 6).as("psi"))
  }

  /** EXACT per-group median (interpolated, quantile_cont semantics) of a
    * money-like column — without per-group buffering. Spark's exact
    * `percentile` collects every value of a group into one aggregation
    * buffer (OOM at 100 TB group sizes); this computes the same number
    * from the VALUE HISTOGRAM instead: group by (key, cents) with a
    * map-combined count, one cumulative-count window per key ordered by
    * cents, and the median is the mean of the values at ranks ⌊(n+1)/2⌋
    * and ⌈(n+1)/2⌉. State scales with DISTINCT VALUES per group (bounded
    * by the value domain — ~49k for prices under $500), never with row
    * count. All arithmetic on exact integer cents; the only division is
    * the final /2 and /100 — exact in double for in-domain money.
    *
    * Returns (groupCols..., n, median). */
  def exactMedianByValue(df: DataFrame, groupCols: Seq[Column], valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (valueCol.cast(in) * 100).cast("bigint")
    val counts = df.groupBy((groupCols :+ cents.as("__graft_cents")): _*)
      .agg(count(lit(1)).as("__graft_cnt"))
    val w = Window.partitionBy(groupCols: _*).orderBy(col("__graft_cents"))
    val ranked = counts
      .withColumn("__graft_cum", sum(col("__graft_cnt")).over(w))
      .withColumn("__graft_n", sum(col("__graft_cnt"))
        .over(Window.partitionBy(groupCols: _*)))
    // the two middle ranks (equal for odd n); a value row covers rank r
    // iff cum - cnt < r <= cum
    val lo = expr("(__graft_n + 1) div 2") // floor((n+1)/2)
    val hi = expr("__graft_n div 2 + 1")   // ceil((n+1)/2)
    ranked
      .filter((col("__graft_cum") - col("__graft_cnt") < lo && lo <= col("__graft_cum")) ||
        (col("__graft_cum") - col("__graft_cnt") < hi && hi <= col("__graft_cum")))
      .groupBy(groupCols: _*)
      .agg(max(col("__graft_n")).as("n"),
        (avg(col("__graft_cents")) / 100.0).as("median"))
  }

  /** Chi-square test of homogeneity between two slices of a CATEGORICAL
    * column — [[psiDrift]]'s sibling for category-mix drift (event types,
    * languages, sources): `χ² = Σ_cells (O − E)² / E` over the 2 × K
    * contingency table, with `E = rowTotal · colTotal / grandTotal`.
    * Large χ² relative to K−1 degrees of freedom = the mix moved.
    *
    * All observed counts are exact integers from ONE map-combined pass;
    * expected counts and cell terms are fixed double expressions of those
    * integers, rounded to 9 and DECIMAL-summed — partitioning-exact, the
    * standard discipline. Categories seen in only one slice contribute
    * their full observed mass (E stays > 0 whenever both slices are
    * non-empty). Output is one row: (k_categories, n_ref, n_cmp, chi2,
    * dof). */
  def chiSquareDrift(df: DataFrame, catCol: Column, isRef: Column): DataFrame = {
    val counts = df
      .groupBy(catCol.as("__graft_cat"))
      .agg(sum(when(isRef, 1L).otherwise(0L)).as("nr"),
        sum(when(isRef, 0L).otherwise(1L)).as("nc"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    val withT = counts
      .withColumn("tr", sum(col("nr")).over(w))
      .withColumn("tc", sum(col("nc")).over(w))
      .withColumn("tot", (col("tr") + col("tc")).cast("double"))
    val er = (col("nr") + col("nc")).cast("double") * col("tr").cast("double") / col("tot")
    val ec = (col("nr") + col("nc")).cast("double") * col("tc").cast("double") / col("tot")
    withT
      .select(col("tr"), col("tc"),
        round((col("nr") - er) * (col("nr") - er) / er
          + (col("nc") - ec) * (col("nc") - ec) / ec, 9)
          .cast(DecimalType(28, 9)).as("term"))
      .groupBy()
      .agg(count(lit(1)).as("k_categories"), max(col("tr")).as("n_ref"),
        max(col("tc")).as("n_cmp"),
        round(sum(col("term")).cast("double"), 6).as("chi2"),
        (count(lit(1)) - 1).as("dof"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group — the distribution-
    * shape drift test next to [[psiDrift]] (binned) and [[chiSquareDrift]]
    * (categorical): `D = max_v |F_ref(v) − F_cmp(v)|` over the two
    * empirical CDFs of a money-like column. Unlike PSI it needs no bin
    * choice and detects any shape change, at the cost of an ordered scan
    * of the VALUE HISTOGRAM.
    *
    * Plan (the [[exactMedianByValue]] shape): ONE map-combined
    * (group, cents, slice)-count aggregate — the only pass that scales
    * with rows — then cumulative-count windows over the per-group value
    * histogram, whose size is bounded by the value domain (≈49k cents
    * buckets for sub-$500 money), never by row count. Spark's own KS test
    * (mllib) sorts the full dataset; this never materializes row-level
    * order.
    *
    * Determinism: every CDF value is a ratio of exact longs (identical in
    * IEEE double on any engine/partitioning), |Δ| of two such doubles is
    * exact, and MAX is order-independent — so the result is reproducible
    * bit-for-bit without DECIMAL summation. Groups where either slice is
    * empty yield NULL (no distribution to compare).
    *
    * Returns (groupCol, n_ref, n_cmp, ks_d). */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: Column, isRef: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (valueCol.cast(in) * 100).cast("bigint")
    val counts = df
      .groupBy(col(groupCol), cents.as("__graft_cents"))
      .agg(sum(when(isRef, 1L).otherwise(0L)).as("nr"),
        sum(when(isRef, 0L).otherwise(1L)).as("nc"))
    val ord = Window.partitionBy(col(groupCol)).orderBy(col("__graft_cents"))
    val all = Window.partitionBy(col(groupCol))
    counts
      .withColumn("cr", sum(col("nr")).over(ord))
      .withColumn("cc", sum(col("nc")).over(ord))
      .withColumn("tr", sum(col("nr")).over(all))
      .withColumn("tc", sum(col("nc")).over(all))
      .groupBy(col(groupCol))
      .agg(max(col("tr")).as("n_ref"), max(col("tc")).as("n_cmp"),
        round(max(when(col("tr") > 0 && col("tc") > 0,
          abs(col("cr").cast("double") / col("tr").cast("double")
            - col("cc").cast("double") / col("tc").cast("double")))), 6).as("ks_d"))
  }

  /** Mutual information (and its normalized form) between two CATEGORICAL
    * columns — the dependence measure a feature audit runs over pairs like
    * (language, source) to find redundant or leaking features:
    * `MI = Σ_xy p(x,y) · ln(p(x,y) / (p(x)·p(y)))`, and
    * `NMI = MI / sqrt(H(x)·H(y))` ∈ [0, 1].
    *
    * Plan: ONE map-combined (x, y)-count pass over the data; marginals
    * come from windows over the JOINT frame (k_x·k_y rows — category
    * cardinality, not row count), and the two marginal entropies from
    * k_x- and k_y-row aggregates of the same frame. Nothing after the
    * first pass scales with rows.
    *
    * Determinism: every p is a ratio of exact longs; each cell term is
    * rounded to 9 decimals and DECIMAL-summed (order-independent), the
    * engine's standard float-reduction discipline. Cells with nxy = 0
    * never appear (0·ln 0 = 0 is their correct contribution). */
  def mutualInfo(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joint = df.groupBy(xCol.as("__graft_x"), yCol.as("__graft_y"))
      .agg(count(lit(1)).as("nxy"))
    val wx = Window.partitionBy(col("__graft_x"))
    val wy = Window.partitionBy(col("__graft_y"))
    val wAll = Window.partitionBy(lit(0))
    val cells = joint
      .withColumn("nx", sum(col("nxy")).over(wx))
      .withColumn("ny", sum(col("nxy")).over(wy))
      .withColumn("n", sum(col("nxy")).over(wAll))
    val nD = col("n").cast("double")
    val miTerm = round(col("nxy").cast("double") / nD
      * log(col("nxy").cast("double") * nD
        / (col("nx").cast("double") * col("ny").cast("double"))), 9)
      .cast(DecimalType(28, 9))
    // marginal entropies from the joint frame's distinct (key, marginal)
    // rows — k_x- and k_y-sized frames, no second pass over the data.
    val hx = cells.select(col("__graft_x"), col("nx"), col("n")).distinct()
      .select(round(-(col("nx").cast("double") / col("n").cast("double"))
        * log(col("nx").cast("double") / col("n").cast("double")), 9)
        .cast(DecimalType(28, 9)).as("t"))
      .agg(sum(col("t")).cast("double").as("h")).select(col("h"))
    val hy = cells.select(col("__graft_y"), col("ny"), col("n")).distinct()
      .select(round(-(col("ny").cast("double") / col("n").cast("double"))
        * log(col("ny").cast("double") / col("n").cast("double")), 9)
        .cast(DecimalType(28, 9)).as("t"))
      .agg(sum(col("t")).cast("double").as("h")).select(col("h"))
    val mi = cells
      .groupBy()
      .agg(max(col("n")).as("n"),
        countDistinct(col("__graft_x")).as("k_x"),
        countDistinct(col("__graft_y")).as("k_y"),
        sum(miTerm).cast("double").as("__graft_mi"))
    mi.crossJoin(hx.select(col("h").as("__graft_hx")))
      .crossJoin(hy.select(col("h").as("__graft_hy")))
      .select(col("n"), col("k_x"), col("k_y"),
        round(col("__graft_mi"), 6).as("mi_nats"),
        round(col("__graft_mi")
          / sqrt(col("__graft_hx") * col("__graft_hy")), 6).as("nmi"))
  }

  /** Per-group ordinary least squares y = a·x + b — slope, intercept and
    * R² from the SAME six exact sufficient statistics as [[momentStats]]:
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / n
    *   r2 = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
    * ONE map-combined pass, a handful of decimals per group over the
    * shuffle — the single-pass regression a feature/quality audit runs
    * per stratum at 100 TB (SQL's regr_* float-sum in nondeterministic
    * order; these DECIMAL sums are partitioning-exact). Degenerate groups
    * (n < 2 or zero x-variance) get NULL fit columns; r2 is additionally
    * NULL when y has zero variance (0/0). */
  def olsByGroup(df: DataFrame, groupCols: Seq[Column], x: Column, y: Column): DataFrame = {
    val s = sufficientStats(df, groupCols, x, y)
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    val dx = n * sxx - sx * sx
    val dy = n * syy - sy * sy
    val cv = n * sxy - sx * sy
    val ok = when(col("n") > 1 && dx =!= 0.0, lit(1.0))
    s.select(
      groupCols.map(c => c) ++ Seq(
        col("n"),
        round(ok * cv / dx, 6).as("slope"),
        round(ok * (sy - cv / dx * sx) / n, 6).as("intercept"),
        round(when(col("n") > 1 && dx =!= 0.0 && dy =!= 0.0, lit(1.0))
          * cv * cv / (dx * dy), 6).as("r2")): _*)
  }
}
