package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 wave 2: snapshot CDC diff, fixed-width histogram, ordered
  * funnel, word n-grams. */
class CdcFunnelSpec extends SparkSpec {
  import spark.implicits._

  // ---- Cdc.snapshotDiff ----------------------------------------------------

  test("snapshotDiff emits insert/delete/update images and nothing for unchanged") {
    val oldSnap = Seq(
      (1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0), (4L, "D", 40.0))
      .toDF("k", "status", "price")
    val newSnap = Seq(
      (1L, "A", 10.0),          // unchanged → silent
      (2L, "B2", 20.0),         // status update
      (4L, "D", 41.0),          // price update
      (5L, "E", 50.0))          // insert; 3 deleted
      .toDF("k", "status", "price")
    val got = Cdc.snapshotDiff(oldSnap, newSnap, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(got == Set(
      (2L, "B", 20.0, "update_preimage"), (2L, "B2", 20.0, "update_postimage"),
      (3L, "C", 30.0, "delete"),
      (4L, "D", 40.0, "update_preimage"), (4L, "D", 41.0, "update_postimage"),
      (5L, "E", 50.0, "insert")))
  }

  test("snapshotDiff compares null-safely (null→value is an update, null→null silent)") {
    val oldSnap = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "status")
    val newSnap = Seq((1L, Option.empty[String]), (2L, Some("now")))
      .toDF("k", "status")
    val got = Cdc.snapshotDiff(oldSnap, newSnap, "k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(got == Set(
      (2L, None, "update_preimage"), (2L, Some("now"), "update_postimage")))
  }

  test("incrementAggregate equals a from-scratch refresh under random deltas") {
    val rnd = new scala.util.Random(42)
    val groups = Array("a", "b", "c", "d")
    val oldRows = (1 to 300).map(k =>
      (k.toLong, groups(rnd.nextInt(4)), BigDecimal(rnd.nextInt(100000)) / 100))
    // new snapshot: drop ~1/7, mutate value ~1/3, migrate group ~1/5, insert fresh keys
    val newRows = oldRows.filterNot(_._1 % 7 == 0).map { case (k, g, v) =>
      val v2 = if (k % 3 == 0) v + 17 else v
      val g2 = if (k % 5 == 0) groups((groups.indexOf(g) + 1) % 4) else g
      (k, g2, v2)
    } ++ (301 to 330).map(k => (k.toLong, groups(rnd.nextInt(4)), BigDecimal(k)))
    val oldSnap = oldRows.toDF("k", "grp", "v")
      .withColumn("v", col("v").cast("decimal(12,2)"))
    val newSnap = newRows.toDF("k", "grp", "v")
      .withColumn("v", col("v").cast("decimal(12,2)"))
    val aggOld = oldSnap.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val incremental = Cdc.incrementAggregate(
        aggOld, Cdc.snapshotDiff(oldSnap, newSnap, "k"), "grp", "v", "n", "s")
      .select(col("grp"), col("n"), col("s").cast("decimal(20,2)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val direct = newSnap.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("decimal(20,2)").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(incremental == direct)
  }

  // ---- Stats.histogram -----------------------------------------------------

  test("histogram bins in exact cents: edge values land in the upper bin, overflow clamps") {
    val df = Seq(0.00, 9.99, 10.00, 10.01, 19.99, 20.00, 99.0, 250.0)
      .toDF("v")
    val got = Stats.histogram(df, col("v"), lo = BigDecimal(0), width = BigDecimal(10), nbins = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == Set(
      (0L, 0.0, 10.0, 2L),    // 0.00, 9.99
      (1L, 10.0, 20.0, 3L),   // 10.00 (edge → upper), 10.01, 19.99
      (2L, 20.0, 30.0, 1L),   // 20.00
      (9L, 90.0, 100.0, 2L))) // 99.0 + overflow 250.0 clamped
  }

  // ---- Funnel --------------------------------------------------------------

  private def ev(id: Long, t: String, u: Long, typ: String) =
    (id, Timestamp.valueOf(t), u, typ)

  test("funnelSteps: out-of-order events do not convert; earliest-after-previous wins") {
    val events = Seq(
      // user 1 completes in order, with a second click AFTER purchase that
      // must not matter and an early purchase BEFORE click that must not count
      ev(1, "2024-01-01 10:00:00", 1, "view"),
      ev(2, "2024-01-01 10:00:30", 1, "purchase"), // before click → ignored
      ev(3, "2024-01-01 10:01:00", 1, "click"),
      ev(4, "2024-01-01 10:02:00", 1, "purchase"), // counts
      // user 2: click before view → funnel stops at view
      ev(5, "2024-01-01 09:00:00", 2, "click"),
      ev(6, "2024-01-01 09:30:00", 2, "view"),
      // user 3: never viewed → absent
      ev(7, "2024-01-01 09:00:00", 3, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Funnel.funnelSteps(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("steps_reached"))).toMap
    assert(got == Map(1L -> 3, 2L -> 1))
    val t3 = Funnel.funnelSteps(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .filter(col("user_id") === 1).select("t3").as[Timestamp].head()
    assert(t3 == Timestamp.valueOf("2024-01-01 10:02:00"))
  }

  test("funnelSummary reports per-step users and conversion per-mille") {
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view"), ev(2, "2024-01-01 10:01:00", 1, "click"),
      ev(3, "2024-01-01 10:00:00", 2, "view"), ev(4, "2024-01-01 10:01:00", 2, "click"),
      ev(5, "2024-01-01 10:02:00", 2, "purchase"),
      ev(6, "2024-01-01 10:00:00", 3, "view"),
      ev(7, "2024-01-01 10:00:00", 4, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val perUser = Funnel.funnelSteps(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
    val got = Funnel.funnelSummary(spark, perUser, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // 4 viewed, 2 clicked (500‰ of 4), 1 purchased (500‰ of 2)
    assert(got == Set((1, 4L, 1000L), (2, 2L, 500L), (3, 1L, 500L)))
  }

  // ---- TextAnalysis.wordNgrams --------------------------------------------

  test("wordNgrams: overlapping n-grams, empty below n tokens") {
    val df = Seq("a b c d", "a b", "").toDF("text")
    val got = df.select(
        TextAnalysis.wordNgrams(TextAnalysis.tokens(col("text")), 3).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq(), Seq()))
  }
}
