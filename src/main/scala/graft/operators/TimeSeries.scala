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
}
