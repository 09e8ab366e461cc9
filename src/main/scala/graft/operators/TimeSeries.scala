package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: per-key daily resampling with gap filling
  * (a dense date spine) and forward fill (last observation carried
  * forward) — the standard shape for turning event-time facts into a
  * regular series for features / monitoring.
  *
  * 100 TB posture: the spine explode is generated per key from that key's
  * own [min, max] day bounds (no global cross join with a calendar dim), so
  * output rows are Σ_key span_days — linear in the real series length. Both
  * the spine join and the forward-fill window key on the series key, so the
  * whole operator is one hash shuffle on the key followed by an in-partition
  * sort; skew is bounded by a single key's span, not the corpus. At cluster
  * scale the same plan holds with the key partitioning reused across the
  * join and the window (one Exchange, audited in PlanAuditSpec).
  */
object TimeSeries {

  /** Densify `daily` (keyCol, dayCol, valueCol — at most one row per
    * (key, day)) to every day in each key's [min, max] range and forward-
    * fill `valueCol` across the introduced gaps. Output columns:
    * (key, day, value_filled, is_gap). The first day per key is never a
    * gap by construction (the spine starts at an observed day). */
  def gapFillForwardFill(daily: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val bounds = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("d0"), max(col(dayCol)).as("d1"))
    val spine = bounds.select(col(keyCol),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as(dayCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol),
        last(col(valueCol), ignoreNulls = true).over(w).as("value_filled"),
        col(valueCol).isNull.as("is_gap"))
  }

  /** Rolling mean over the trailing `days`-day EVENT-TIME window (range
    * frame, not row frame — gaps shrink the window’s row count but not its
    * time span). Adds `rolling_avg` next to the filled series. */
  def rollingMeanDays(filled: DataFrame, keyCol: String, dayCol: String,
      valueCol: String, days: Int): DataFrame = {
    require(days > 0, s"days must be positive, got $days")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(dayCol).cast("timestamp").cast("long"))
      .rangeBetween(-(days.toLong - 1) * 86400L, 0L)
    filled.withColumn("rolling_avg", avg(col(valueCol)).over(w))
  }

  /** Rolling z-score anomaly flags: each point scored against the mean/std
    * of its own trailing `days`-day event-time window. The window moments
    * come from EXACT DECIMAL sums (count, Σx, Σx² — the Stats.scala
    * discipline), so they are addition-order independent; only the final
    * z is double, rounded to 6. Points with a degenerate window (n ≤ 1 or
    * zero spread) get NULL z and are never flagged.
    *
    * Shape: same single key-hash shuffle as the fill/rolling-mean windows —
    * the three window aggregates share one frame. */
  def rollingAnomaly(filled: DataFrame, keyCol: String, dayCol: String,
      valueCol: String, days: Int, zThreshold: Double): DataFrame = {
    require(days > 1, s"days must be > 1, got $days")
    require(zThreshold > 0, s"zThreshold must be positive, got $zThreshold")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(dayCol).cast("timestamp").cast("long"))
      .rangeBetween(-(days.toLong - 1) * 86400L, 0L)
    val vd = col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val withSums = filled
      .withColumn("w_n", count(lit(1)).over(w))
      .withColumn("w_sx", sum(vd).over(w).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
      .withColumn("w_sxx", sum(vd * vd).over(w).cast(org.apache.spark.sql.types.DecimalType(28, 4)))
    val n = col("w_n").cast("double")
    val sx = col("w_sx").cast("double")
    val sxx = col("w_sxx").cast("double")
    val mean = sx / n
    // spread test on the EXACT decimal discriminant n·Σx² − (Σx)²: a
    // constant window is exactly zero on every engine, where the double
    // spelling rounds to ±ulp noise and the >0 gate (and the resulting
    // z ≈ ±0.0) flips between engines
    val disc = col("w_n").cast(org.apache.spark.sql.types.DecimalType(10, 0)) * col("w_sxx") -
      col("w_sx") * col("w_sx")
    val variance = (sxx - sx * sx / n) / (n - 1.0)
    val z = when(col("w_n") > 1 && disc > 0,
      round((col(valueCol).cast("double") - mean) / sqrt(variance), 6))
    withSums
      .withColumn("roll_mean", round(mean, 6))
      .withColumn("z", z)
      .withColumn("is_anomaly", coalesce(abs(col("z")) > zThreshold, lit(false)))
      .drop("w_n", "w_sx", "w_sxx")
  }

  /** Time-weighted average over an IRREGULAR series — the standard
    * sensor/metric aggregation Spark has no built-in for: each observation
    * holds from its timestamp until the next one (zero-order hold, the
    * gapFill LOCF rule in continuous time), so
    * TWA = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first) — where a plain AVG
    * overweights bursts (10 readings in a hot minute count 10×).
    *
    * Exactness: values are held as DECIMAL(18,6) and weighted by integer
    * microsecond durations — both Σ v·Δt and Σ Δt are exact, order- and
    * partition-independent; the single final double division is computed
    * from identical operands on every engine. Keys whose span is zero
    * (all observations simultaneous) are dropped — no 0/0 row.
    *
    * Plan: ONE key-hash shuffle shared by the lead() window and the
    * aggregate (same key); per-key work linear in that key's series.
    * Returns (key, n_segments, span_us, twa). */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(tsCol), col(tieCol),
        round(col(valueCol), 6).cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("__v6"))
      .withColumn("__dur_us", lead(unix_micros(col(tsCol)), 1).over(w) - unix_micros(col(tsCol)))
      .filter(col("__dur_us").isNotNull)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("__dur_us")).as("span_us"),
        sum(col("__v6") * col("__dur_us")).as("__num"))
      .filter(col("span_us") > 0)
      .select(col(keyCol), col("n_segments"), col("span_us"),
        round(col("__num").cast("double") / col("span_us"), 6).as("twa"))
  }
}
