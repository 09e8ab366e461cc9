package graft.tools

import org.apache.spark.sql.functions._

/** Multi-day CDF soak (run by hand:
  * `runMain graft.tools.CdfSoakAb [sfDir] [days]`), the round-15 verdict's
  * item 4: the storage bench records SINGLE-tick feed costs
  * (`silver_feed_tick_sec` / `gold_feed_tick_sec`), but the claim that
  * matters at scale is "per-tick work ∝ churn, FLAT in history length" —
  * a consumer whose tick cost grows with table history (manifest walks,
  * un-checkpointed log reads, unpruned snapshots) is invisible in a
  * one-tick probe and fatal on a year-old lake.
  *
  * Shape: one bronze source seeded from a 1/16 lineitem slice; a standing
  * latest-wins silver MV ([[graft.pipeline.Silver.latestWinsFeedTick]])
  * and a grain-routed gold mart ([[graft.pipeline.Gold.starFeedTick]])
  * bootstrapped untimed; then N synthetic days, each landing a
  * CONSTANT-SIZE churn batch (a ~1/64 re-observation keyed on the day) and
  * a DV retraction of part of it, then one timed silver tick + one timed
  * gold tick. Every third day runs maintenance (small-file compaction +
  * an aggressive vacuum) so the soak exercises checkpoint pruning and
  * cursor-held retention release, not an append-only museum.
  *
  * The flatness pin compares the mean tick cost of the EARLY days against
  * the LATE days: linear-in-history behavior over 12 days would read ~3×;
  * the gate is 2× (generous for box noise, far below O(history)). */
object CdfSoakAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val days = args.lift(1).flatMap(_.toIntOption).getOrElse(12)
    require(days >= 8, s"need >= 8 days for an early/late split, got $days")
    val spark = graft.Graft.session(appName = "cdf-soak-ab")
    val root = java.nio.file.Files.createTempDirectory("graft-cdfsoak").toString
    val lake = new graft.pipeline.Lakehouse(spark, root)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val src = graft.Graft.table(spark, dir, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(16)) === 3)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .withColumn("obs_seq", lit(1))
      .cache()
    val srcRows = src.count()
    println(s"[soak] source slice: $srcRows rows, $days days")

    lake.appendBronze("src", src) // v1
    val silverCur = s"$root/_soak_cursors/silver"
    val goldCur = s"$root/_soak_cursors/gold"
    def silverTick() = graft.pipeline.Silver.latestWinsFeedTick(lake,
      "silver", "mv", "src", Seq("l_orderkey", "l_partkey"),
      Seq(col("obs_seq").desc), identity, silverCur)
    val factDep = graft.pipeline.Gold.FeedDep(
      "src", Seq("l_orderkey", "l_partkey"), identity)
    def goldTick() = graft.pipeline.Gold.starFeedTick(lake, "mart",
      Seq("l_orderkey", "l_partkey"), factDep, Seq.empty, "mv",
      (_, f) => f.select(col("l_orderkey"), col("l_partkey"),
        (col("l_quantity") * 2).as("q2"), col("obs_seq")), goldCur)
    silverTick(); goldTick() // bootstraps (untimed)

    val records = (1 to days).map { d =>
      // constant-size churn: re-observe one 1/64 stripe OF THE SLICE under
      // a fresh obs_seq, then retract a sliver of it (the retraction path
      // is the expensive one — key-restricted pinned rebuild). The stripe
      // modulus composes with the slice's own (keys ≡ 3 mod 16), so every
      // day's stripe is non-empty and day-distinct
      val churn = src.filter(
          pmod(col("l_orderkey"), lit(1024)) === (3 + 16 * (d % 64)))
        .withColumn("obs_seq", lit(d + 1))
      lake.appendBronze("src", churn)
      lake.deleteBronzeWhereDv("src",
        col("obs_seq") === (d + 1) && pmod(col("l_partkey"), lit(7)) === 0)
      val (_, sSec) = timed(silverTick())
      val (_, gSec) = timed(goldTick())
      if (d % 3 == 0) {
        // interleaved maintenance: compaction unreferences old files and the
        // cursor-frontier-honoring vacuum reclaims them — the soak must stay
        // flat WITH checkpoint pruning and retention release active
        try lake.compactSmall("bronze", "src", minSmallFiles = 2)
        catch { case e: IllegalStateException
          if e.getMessage.contains("consecutive CAS races") => }
        lake.vacuumBronze("src", keepVersions = 1, retainMillis = 0L)
      }
      val head = lake.committedBronzeVersion("src")
      println(f"[soak] day $d%2d silver_tick ${sSec}%6.2f s  gold_tick ${gSec}%6.2f s  head v$head")
      (d, sSec, gSec)
    }

    // correctness pin after the full soak: the fed MV ≡ from-scratch
    // latest-wins, the mart ≡ its projection of the MV
    val expectMv = graft.pipeline.Silver.latestWins(
      lake.table("bronze", "src"), Seq("l_orderkey", "l_partkey"),
      Seq(col("obs_seq").desc))
    require(lake.table("silver", "mv").except(expectMv).isEmpty
      && expectMv.except(lake.table("silver", "mv")).isEmpty,
      "soaked MV diverged from the from-scratch recompute")
    val expectMart = lake.table("silver", "mv").select(col("l_orderkey"),
      col("l_partkey"), (col("l_quantity") * 2).as("q2"), col("obs_seq"))
    require(lake.table("gold", "mart").except(expectMart).isEmpty
      && expectMart.except(lake.table("gold", "mart")).isEmpty,
      "soaked mart diverged from the from-scratch recompute")

    def mean(xs: Seq[Double]): Double = xs.sum / xs.size
    val early = records.slice(1, 5) // skip day 1 (first post-bootstrap JIT)
    val late = records.takeRight(4)
    val sRatio = mean(late.map(_._2)) / mean(early.map(_._2))
    val gRatio = mean(late.map(_._3)) / mean(early.map(_._3))
    println(f"[soak] silver early ${mean(early.map(_._2))}%.2f s late ${mean(late.map(_._2))}%.2f s ratio $sRatio%.2f")
    println(f"[soak] gold   early ${mean(early.map(_._3))}%.2f s late ${mean(late.map(_._3))}%.2f s ratio $gRatio%.2f")
    require(sRatio < 2.0 && gRatio < 2.0,
      f"per-tick cost grew with history: silver ${sRatio}%.2f x, gold ${gRatio}%.2f x " +
        "(flat-in-history contract violated)")
    println("[soak] PASS: per-tick cost flat in history length " +
      s"($days days, maintenance every 3rd day)")
    src.unpersist()
    spark.stop()
  }
}
