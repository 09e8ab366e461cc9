package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event log: for a step sequence like
  * view → click → purchase, each user's step-k time is the EARLIEST
  * occurrence of step k that happens strictly AFTER their step-(k−1) time —
  * the product-analytics conversion funnel (events out of order don't
  * count, which is what separates this from a per-type min).
  *
  * Shape: ONE pass — the event log shuffles once on the user key (the only
  * shuffle), each user's (ts, type) pairs are collected and time-sorted,
  * and a left fold walks them setting step k's time at the first type-k
  * event strictly after step k−1's time. The fold is order-equivalent to
  * the relational spelling (a chain of filtered min-aggregations joined on
  * the user — the oracle SQL) because with a time-sorted walk the first
  * qualifying event IS the min, and the strict `>` makes ties at equal
  * timestamps land identically whatever their sort order.
  *
  * Why not the join-chain relationally: k steps = k scans + k aggregation
  * shuffles + k−1 joins, and the step-k subtree appears inside step-(k+1)
  * AND the final join with different pushed null-filters, so ReuseExchange
  * cannot dedupe them — measured, the plan recomputes early steps. The
  * fold reads the log once. Per-user state is that user's own events;
  * a 10⁶-event power user is one wide row, the same bound sessionization
  * (q32) already accepts on this grain.
  */
object Funnel {

  /** Per-user step times for `steps` (earliest-after-previous semantics)
    * plus `steps_reached`. Users who never fire `steps.head` are absent.
    * Returns (userCol, t1..tN, steps_reached). */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct == steps, s"steps must be distinct, got $steps")
    val evs = sort_array(collect_list(struct(col(tsCol).as("ts"), col(typeCol).as("typ"))))
    val init = struct(steps.indices.map(i =>
      lit(null).cast("timestamp").as(s"t${i + 1}")): _*)
    // an event matches exactly one step (types distinct) and can never set
    // two fields at once (step k+1 needs ts strictly AFTER step k), so every
    // field reads the PRE-event accumulator
    def update(acc: Column, e: Column): Column = struct(
      steps.zipWithIndex.map { case (step, i) =>
        val prevOk =
          if (i == 0) lit(true)
          else acc.getField(s"t$i").isNotNull && e.getField("ts") > acc.getField(s"t$i")
        coalesce(acc.getField(s"t${i + 1}"),
          when(e.getField("typ") === step && prevOk, e.getField("ts")))
          .as(s"t${i + 1}")
      }: _*)
    val folded = aggregate(evs, init, update)
    val reached = steps.indices.map(i =>
      when(col(s"t${i + 1}").isNotNull, 1).otherwise(0)).reduce(_ + _)
    events
      .filter(col(typeCol).isInCollection(steps))
      .groupBy(col(userCol))
      .agg(folded.as("f"))
      .select(col(userCol) +: steps.indices.map(i =>
        col(s"f.t${i + 1}").as(s"t${i + 1}")): _*)
      .filter(col("t1").isNotNull)
      .withColumn("steps_reached", reached)
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
