package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event log: for a step sequence like
  * view → click → purchase, each user's step-k time is the EARLIEST
  * occurrence of step k that happens strictly AFTER their step-(k−1) time —
  * the product-analytics conversion funnel (events out of order don't
  * count, which is what separates this from a per-type min).
  *
  * Shape: one filtered min-aggregation per step, chained by an equi-join on
  * the user key. Every aggregation and join keys on the SAME column, so
  * Catalyst reuses one hash partitioning across the whole chain (no
  * re-shuffle between steps; AQE coalesces the tiny intermediate).
  * Per-step frames shrink monotonically (only users who reached step k−1
  * are scanned for step k — the filter pushes into the scan). steps.length
  * is small and fixed (funnels are 3–6 steps), so the chain length is not
  * a scale concern; the event table is scanned once per step with the
  * step's type filter pushed down.
  */
object Funnel {

  /** Per-user step times for `steps` (earliest-after-previous semantics)
    * plus `steps_reached`. Users who never fire `steps.head` are absent.
    * Returns (userCol, t1..tN, steps_reached). */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    val chained = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"t$i"
        val cur = s"t${i + 1}"
        val next = events.filter(col(typeCol) === step)
          .join(acc.select(col(userCol), col(prev)), Seq(userCol))
          .filter(col(tsCol) > col(prev))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
        acc.join(next, Seq(userCol), "left")
    }
    val reached = steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    chained.withColumn("steps_reached", reached)
  }

  /** Funnel summary: users reaching each step and conversion from the
    * previous step (per-mille integer, exact). */
  def funnelSummary(spark: SparkSession, perUser: DataFrame, nSteps: Int): DataFrame = {
    val counts = perUser.agg(
      count(lit(1)).as("u0"),
      (1 to nSteps).map(i =>
        sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L)).as(s"u$i")): _*)
    val tall = counts.select(
      expr(s"stack($nSteps, " +
        (1 to nSteps).map(i => s"$i, u$i, u${i - 1}").mkString(", ") + ")")
        .as(Seq("step", "users", "prev_users")))
    tall.select(
      col("step"), col("users"),
      when(col("prev_users") > 0, expr("users * 1000 div prev_users"))
        .otherwise(lit(null).cast("bigint")).as("conv_permille"))
  }
}
