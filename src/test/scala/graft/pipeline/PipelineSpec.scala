package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

import Fixtures._

/** End-to-end medallion pipeline spec: three ingest runs through bronze →
  * silver refresh → gold → full check suite, exercising every degraded
  * payload shape FIXTURES.md calls out plus the SCD2/latest-wins/idempotency
  * invariants (SURVEY §5).
  */
class PipelineSpec extends SparkSpec {

  private lazy val lake = new Lakehouse(spark, Files.createTempDirectory("graft-lake").toString)

  private val chHeaders = Seq(dim("day"), met("views"), met("likes"), met("comments"),
    met("estimatedMinutesWatched"), met("subscribersGained"), met("subscribersLost"))
  private val vidHeaders = Seq(dim("video"), dim("day"), met("views"), met("likes"),
    met("comments"), met("estimatedMinutesWatched"), ("averageViewDuration", "METRIC", "FLOAT"))

  private def ingestAll(): Unit = {
    // ---- run 1: 2025-06-01 ----
    val ctx1 = Bronze.RunContext("run1", "req1", d("2025-06-01"), ts("2025-06-01 10:00:00"))
    Bronze.logRunStart(lake, ctx1, """{"mode":"auto"}""")
    Bronze.ingest(lake, ctx1, _ => Map(
      "channels_raw" -> Seq(channelPayload("UC_1", "Chan A", 100, 10)),
      "videos_raw" -> Seq(videosPayload(
        videoItem("V1", "UC_1", "Title A", 10),
        videoItem("V2", "UC_1", "Other", 40))),
      "analytics_channel_daily_raw" -> Seq(report(chHeaders, Seq(
        Seq("2025-05-30", "11", "2", "1", "7", "3", "1"),
        Seq("2025-05-31", "12", "2", "1", "8", "2", "0")))),
      "analytics_video_daily_raw" -> Seq(report(vidHeaders, Seq(
        Seq("V1", "2025-05-31", "5", "1", "0", "3", "41.5"),
        Seq("V2", "2025-05-31", "7", "1", "1", "4", "60.25")))),
      // shuffled header order + lowercase + empty dim + unknown source
      "analytics_video_traffic_source_daily_raw" -> Seq(report(
        Seq(met("views"), dim("insightTrafficSourceType"), dim("video"), dim("day"),
          met("estimatedMinutesWatched")),
        Seq(
          Seq("3", "yt_search", "V1", "2025-05-31", "2"),
          Seq("2", "", "V1", "2025-05-31", "1"),
          Seq("1", "IMMERSIVE_LIVE", "V2", "2025-05-31", "1")))),
      // missing estimatedMinutesWatched column (→ NULL → gold coalesces 0)
      "analytics_video_country_daily_raw" -> Seq(report(
        Seq(dim("video"), dim("day"), dim("country"), met("views")),
        Seq(
          Seq("V1", "2025-05-31", "us", "4"),
          Seq("V1", "2025-05-31", "ph", "1")))),
      // missing day column entirely (→ snapshot_date fallback)
      "analytics_video_device_daily_raw" -> Seq(report(
        Seq(dim("video"), dim("deviceType"), met("views"), met("estimatedMinutesWatched")),
        Seq(
          Seq("V1", "desktop", "3", "2"),
          Seq("V1", "MOBILE", "2", "1"))))))
    Bronze.finalizeRun(lake, "run1", "success", ts("2025-06-01 10:05:00"))

    // ---- run 2: 2025-06-02 — updates + error payload ----
    val ctx2 = Bronze.RunContext("run2", "req2", d("2025-06-02"), ts("2025-06-02 10:00:00"))
    Bronze.logRunStart(lake, ctx2, """{"mode":"auto"}""")
    Bronze.ingest(lake, ctx2, _ => Map(
      "channels_raw" -> Seq(channelPayload("UC_1", "Chan A2", 150, 12)),
      // V1 title A -> B (new SCD2 version); V2 unchanged (no new version)
      "videos_raw" -> Seq(videosPayload(
        videoItem("V1", "UC_1", "Title B", 15),
        videoItem("V2", "UC_1", "Other", 40))),
      // overlapping date 05-31 re-reported with different numbers (latest wins)
      "analytics_channel_daily_raw" -> Seq(report(chHeaders, Seq(
        Seq("2025-05-31", "13", "3", "1", "9", "2", "1"),
        Seq("2025-06-01", "20", "4", "2", "11", "5", "1")))),
      "analytics_video_traffic_source_daily_raw" -> Seq(errorPayload)))
    Bronze.finalizeRun(lake, "run2", "success", ts("2025-06-02 10:05:00"))

    // ---- run 3: 2025-06-03 — A→B→A reversion ----
    val ctx3 = Bronze.RunContext("run3", "req3", d("2025-06-03"), ts("2025-06-03 10:00:00"))
    Bronze.ingest(lake, ctx3, _ => Map(
      "videos_raw" -> Seq(videosPayload(
        videoItem("V1", "UC_1", "Title A", 20),
        videoItem("V2", "UC_1", "Other", 45)))))
    Bronze.finalizeRun(lake, "run3", "success", ts("2025-06-03 10:05:00"))
  }

  private lazy val refreshed: Unit = {
    ingestAll()
    Silver.refresh(lake)
    Gold.refresh(lake)
  }

  test("silver refresh materializes all 14 models in dependency order") {
    refreshed
    Silver.models.foreach(m => assert(lake.exists("silver", m.name), m.name))
  }

  test("silver_channels: latest wins on channel_id") {
    refreshed
    val rows = lake.table("silver", "silver_channels").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("channel_title") == "Chan A2")
    assert(r.getAs[Long]("channel_view_count") == 150L)
    assert(r.getAs[String]("run_id") == "run2")
  }

  test("silver_video_stats_snapshot: unique on (video_id, fetched_at_utc), typed counters") {
    refreshed
    val df = lake.table("silver", "silver_video_stats_snapshot")
    assert(df.count() == 6) // 2 videos x 3 runs
    assert(df.groupBy("video_id", "fetched_at_utc").count().filter(col("count") > 1).isEmpty)
    val v1r3 = df.filter(col("video_id") === "V1" && col("run_id") === "run3").head()
    assert(v1r3.getAs[Long]("view_count") == 20L)
  }

  test("SCD2: A→B→A yields 3 contiguous versions; unchanged video stays at 1") {
    refreshed
    val scd = lake.table("silver", "silver_video_metadata_scd2")
    val v1 = scd.filter(col("video_id") === "V1")
      .orderBy(col("valid_from_utc")).collect()
    assert(v1.map(_.getAs[String]("video_title")).toSeq == Seq("Title A", "Title B", "Title A"))
    // windows partition time: valid_to = next valid_from − 1µs
    val v1b = scd.filter(col("video_id") === "V1")
      .orderBy(col("valid_from_utc"))
      .select(unix_micros(col("valid_from_utc")), unix_micros(col("valid_to_utc")),
        col("is_current"))
      .collect()
    assert(v1b(0).getLong(1) == v1b(1).getLong(0) - 1)
    assert(v1b(1).getLong(1) == v1b(2).getLong(0) - 1)
    assert(v1b.map(_.getBoolean(2)).toSeq == Seq(false, false, true))
    // open-ended sentinel on the current version
    val cur = scd.filter(col("video_id") === "V1" && col("is_current"))
      .select(col("valid_to_utc").cast("string")).head().getString(0)
    assert(cur == "9999-12-31 23:59:59.999999")
    // V2's metadata never changed (run3 only bumped statistics, which are
    // excluded from the hash) → a single version despite two observations
    assert(scd.filter(col("video_id") === "V2").count() == 1)
  }

  test("SCD2 surrogate key is stable sha2(video_id || valid_from)") {
    refreshed
    val scd = lake.table("silver", "silver_video_metadata_scd2")
    val bad = scd.filter(
      col("video_meta_sk") =!=
        sha2(concat_ws("||", col("video_id"), col("valid_from_utc").cast("string")), 256))
    assert(bad.isEmpty)
  }

  test("silver_videos: latest snapshot with current SCD2 FK resolved") {
    refreshed
    val v = lake.table("silver", "silver_videos")
    assert(v.count() == 2)
    val v1 = v.filter(col("video_id") === "V1").head()
    assert(v1.getAs[String]("latest_video_title") == "Title A") // run3 latest
    val currentSk = lake.table("silver", "silver_video_metadata_scd2")
      .filter(col("video_id") === "V1" && col("is_current"))
      .head().getAs[String]("video_meta_sk")
    assert(v1.getAs[String]("current_video_meta_sk") == currentSk)
  }

  test("fact_channel_daily_metrics: header binding + latest-wins on overlapping date") {
    refreshed
    val f = lake.table("silver", "fact_channel_daily_metrics")
    assert(f.count() == 3) // 05-30, 05-31, 06-01
    val d31 = f.filter(col("date") === lit("2025-05-31").cast("date")).head()
    assert(d31.getAs[Long]("views") == 13L) // run2 re-report wins
    assert(d31.getAs[String]("run_id") == "run2")
    assert(f.filter(col("date") === lit("2025-05-30").cast("date")).head()
      .getAs[Long]("subscribers_gained") == 3L)
  }

  test("traffic fact: shuffled headers bind by name; dims uppercased; empties dropped; error payload absorbed") {
    refreshed
    val f = lake.table("silver", "fact_video_traffic_source_metrics")
    val sources = f.select("source_id").collect().map(_.getString(0)).toSet
    assert(sources == Set("YT_SEARCH", "IMMERSIVE_LIVE")) // lowercase uppercased, '' dropped
    assert(f.count() == 2)
    val ytSearch = f.filter(col("source_id") === "YT_SEARCH").head()
    assert(ytSearch.getAs[Long]("views") == 3L) // bound by name despite shuffled order
  }

  test("country fact: missing estimatedMinutesWatched binds to NULL; gold coalesces to 0") {
    refreshed
    val f = lake.table("silver", "fact_video_country_metrics")
    assert(f.filter(col("estimated_minutes_watched").isNotNull).count() == 0)
    val g = lake.table("gold", "gold_video_country_daily_summary")
    assert(g.filter(col("estimated_minutes_watched") =!= 0L).count() == 0)
    assert(g.filter(col("country_code") === "US").head()
      .getAs[String]("country_name") == "United States of America")
  }

  test("device fact: missing day column falls back to snapshot_date") {
    refreshed
    val f = lake.table("silver", "fact_video_device_metrics")
    assert(f.count() == 2)
    assert(f.filter(col("date") === col("snapshot_date")).count() == 2)
    assert(f.select("device_type").collect().map(_.getString(0)).toSet
      == Set("DESKTOP", "MOBILE"))
  }

  test("dim_date: union of fact dates with calendar attributes") {
    refreshed
    val dd = lake.table("silver", "dim_date")
    val dates = dd.select(col("date").cast("string")).collect().map(_.getString(0)).toSet
    assert(dates == Set("2025-05-30", "2025-05-31", "2025-06-01")) // device fallback 06-01
    val sat = dd.filter(col("date") === lit("2025-05-31").cast("date")).head()
    assert(sat.getAs[Boolean]("is_weekend")) // 2025-05-31 is a Saturday
    assert(sat.getAs[Int]("day_of_week") == 7)
  }

  test("gold: net_subscribers arithmetic and star joins") {
    refreshed
    val g = lake.table("gold", "gold_channel_daily_summary")
    val d30 = g.filter(col("date") === lit("2025-05-30").cast("date")).head()
    assert(d30.getAs[Long]("net_subscribers") == 2L) // 3 gained - 1 lost
    val vd = lake.table("gold", "gold_video_daily_summary")
    assert(vd.filter(col("video_id") === "V1").head().getAs[String]("channel_id") == "UC_1")
  }

  test("full check suite: all error checks clean; warn fires on IMMERSIVE_LIVE") {
    refreshed
    val results = Checks.run(lake, d("2025-06-03"))
    val failures = results.filter { case (_, sev, n) => sev == "error" && n > 0 }
    assert(failures.isEmpty, s"failing checks: $failures")
    val warn = results.find(_._1 == "warn_new_traffic_source_ids").get
    assert(warn._3 == 1L) // exactly IMMERSIVE_LIVE
  }

  test("freshness check fails when asOf drifts past the lag budget") {
    refreshed
    val stale = Checks.freshness(d("2025-07-01"), maxLagDays = 7).run(lake)
    assert(stale.count() == 2) // both monitored models lag
  }

  test("idempotent re-ingest: same run_id lands delete+append, results unchanged") {
    refreshed
    val before = lake.table("silver", "silver_channels").collect().toSeq
    val beforeBronze = lake.table("bronze", "channels_raw").count()
    // re-land run2's channel payload (simulating a task retry)
    val ctx2 = Bronze.RunContext("run2", "req2", d("2025-06-02"), ts("2025-06-02 10:00:00"))
    Bronze.ingest(lake, ctx2, _ => Map(
      "channels_raw" -> Seq(channelPayload("UC_1", "Chan A2", 150, 12))))
    assert(lake.table("bronze", "channels_raw").count() == beforeBronze)
    Silver.refresh(lake, Some(Set("silver_channels")))
    val after = lake.table("silver", "silver_channels").collect().toSeq
    assert(after == before)
  }

  test("incremental refresh equals full recompute and file-skips the bronze scan") {
    refreshed
    // run 4 lands one genuinely new date and re-reports an existing one
    val ctx4 = Bronze.RunContext("run4", "req4", d("2025-06-04"), ts("2025-06-04 10:00:00"))
    Bronze.ingest(lake, ctx4, _ => Map(
      "analytics_video_daily_raw" -> Seq(report(vidHeaders, Seq(
        Seq("V1", "2025-06-03", "9", "2", "1", "5", "50.0"),
        Seq("V1", "2025-05-31", "6", "1", "0", "3", "42.0"))))))
    Silver.refreshIncremental(lake, "fact_video_daily_metrics", d("2025-06-03"))
    val incremental = lake.table("silver", "fact_video_daily_metrics")
      .orderBy("video_id", "date").collect().toSeq
    // latest-wins merged: re-reported 05-31 now carries run4's numbers
    val v1d31 = incremental.find(r => r.getAs[String]("video_id") == "V1"
      && r.getAs[java.sql.Date]("date").toString == "2025-05-31").get
    assert(v1d31.getAs[Long]("views") == 6L && v1d31.getAs[String]("run_id") == "run4")
    // merge result is identical to a full recompute over all bronze history
    Silver.refresh(lake, Some(Set("fact_video_daily_metrics")))
    val full = lake.table("silver", "fact_video_daily_metrics")
      .orderBy("video_id", "date").collect().toSeq
    assert(incremental == full)
    // the since-filter prunes at FILE level through the bronze log's
    // per-file snapshot_date stats — refresh cost scales with new data
    import graft.pipeline.ManifestStats.StatGte
    val allFiles = lake.prunedFilePaths("bronze", "analytics_video_daily_raw", Nil)
    val newFiles = lake.prunedFilePaths("bronze", "analytics_video_daily_raw",
      Seq(StatGte("snapshot_date", d("2025-06-04"))))
    assert(newFiles.nonEmpty && newFiles.size < allFiles.size,
      s"file skipping read ${newFiles.size}/${allFiles.size} files")
    // and the skipped scan returns exactly the filtered rows
    val viaSkip = Silver.bronzeSince(lake, "analytics_video_daily_raw", d("2025-06-04"))
      .collect().map(_.toString).sorted.toSeq
    val viaFull = lake.table("bronze", "analytics_video_daily_raw")
      .filter(col("snapshot_date") >= lit(d("2025-06-04")))
      .collect().map(_.toString).sorted.toSeq
    assert(viaSkip == viaFull)
  }

  test("SCD2 + silver_videos incremental merge equals full recompute (A→B→A, late arrivals, full-refresh interleave)") {
    val l = new Lakehouse(spark, Files.createTempDirectory("graft-scd2inc").toString)
    def land(run: String, snap: String, at: String, title: String, views: Long): Unit = {
      val ctx = Bronze.RunContext(run, s"req-$run", d(snap), ts(at))
      Bronze.ingest(l, ctx, _ => Map(
        "videos_raw" -> Seq(videosPayload(
          videoItem("V1", "UC_1", title, views),
          videoItem("V2", "UC_1", "Stable", views)))))
    }
    val tables = Seq("silver_video_metadata_scd2", "silver_videos")
    def capture(): Map[String, Seq[String]] = tables.map(t =>
      t -> l.table("silver", t).collect().map(_.toString).sorted.toSeq).toMap
    def mergeThenCompare(since: String): Unit = {
      Silver.refreshIncremental(l, "silver_video_metadata_scd2", d(since))
      Silver.refreshIncremental(l, "silver_videos", d(since))
      val inc = capture()
      Silver.refresh(l, Some(tables.toSet))
      assert(inc == capture(), s"incremental(since=$since) != full recompute")
      // leave the tables as the merge produced them (identical content —
      // re-materializing just proved it)
    }

    land("r1", "2025-06-01", "2025-06-01 10:00:00", "Title A", 10)
    land("r2", "2025-06-02", "2025-06-02 10:00:00", "Title B", 20)
    Silver.refresh(l, Some(tables.toSet))

    // A→B→A reversion merged incrementally (bootstraps the observation log)
    land("r3", "2025-06-03", "2025-06-03 10:00:00", "Title A", 30)
    mergeThenCompare("2025-06-03")
    assert(l.exists("silver", Silver.scd2ObsTable))
    val titles = l.table("silver", "silver_video_metadata_scd2")
      .filter(col("video_id") === "V1").orderBy("valid_from_utc")
      .collect().map(_.getAs[String]("video_title")).toSeq
    assert(titles == Seq("Title A", "Title B", "Title A"))
    assert(l.table("silver", "silver_video_metadata_scd2")
      .filter(col("video_id") === "V2").count() == 1)

    // late arrival: lands in snapshot 06-04 but OBSERVED between r1 and r2 —
    // re-segments the middle of V1's existing version chain. The preceding
    // full recompute also left the obs log behind silver; the log-frontier
    // widening must absorb both.
    land("r4", "2025-06-04", "2025-06-01 18:00:00", "Title C", 15)
    mergeThenCompare("2025-06-04")
    val after = l.table("silver", "silver_video_metadata_scd2")
      .filter(col("video_id") === "V1").orderBy("valid_from_utc")
      .collect().map(_.getAs[String]("video_title")).toSeq
    assert(after == Seq("Title A", "Title C", "Title B", "Title A"))
    // silver_videos: latest-wins is snapshot-first, so r4 (newest snapshot)
    // wins despite its older ingest ts, and the FK tracks the current version
    val v1 = l.table("silver", "silver_videos").filter(col("video_id") === "V1").head()
    assert(v1.getAs[String]("latest_video_title") == "Title C")
    val curSk = l.table("silver", "silver_video_metadata_scd2")
      .filter(col("video_id") === "V1" && col("is_current")).head()
      .getAs[String]("video_meta_sk")
    assert(v1.getAs[String]("current_video_meta_sk") == curSk)
  }

  test("channel fact incremental: merges while the channel is stable, recomputes on a channel change") {
    val l = new Lakehouse(spark, Files.createTempDirectory("graft-chfact").toString)
    val tables = Set("silver_channels", "fact_channel_daily_metrics")
    def land(run: String, snap: String, at: String, channel: String, day: String, views: Long): Unit = {
      val ctx = Bronze.RunContext(run, s"req-$run", d(snap), ts(at))
      Bronze.ingest(l, ctx, _ => Map(
        "channels_raw" -> Seq(channelPayload(channel, s"Chan $channel", 100, 10)),
        "analytics_channel_daily_raw" -> Seq(report(chHeaders, Seq(
          Seq(day, views.toString, "2", "1", "7", "3", "1"))))))
    }
    land("r1", "2025-06-01", "2025-06-01 10:00:00", "UC_1", "2025-05-31", 11)
    Silver.refresh(l, Some(tables))
    // stable channel: day-2 merge equals full recompute
    land("r2", "2025-06-02", "2025-06-02 10:00:00", "UC_1", "2025-06-01", 20)
    Silver.refreshIncremental(l, "silver_channels", d("2025-06-02"))
    Silver.refreshIncremental(l, "fact_channel_daily_metrics", d("2025-06-02"))
    val merged = l.table("silver", "fact_channel_daily_metrics")
      .orderBy("date").collect().map(_.toString).toSeq
    Silver.refresh(l, Some(tables))
    val full = l.table("silver", "fact_channel_daily_metrics")
      .orderBy("date").collect().map(_.toString).toSeq
    assert(merged == full)
    assert(merged.size == 2)
    // channel change: the guard must re-stamp HISTORY with the new current
    // id (merge would freeze UC_1 on the old rows)
    land("r3", "2025-06-03", "2025-06-03 10:00:00", "UC_2", "2025-06-02", 30)
    Silver.refreshIncremental(l, "silver_channels", d("2025-06-03"))
    Silver.refreshIncremental(l, "fact_channel_daily_metrics", d("2025-06-03"))
    val after = l.table("silver", "fact_channel_daily_metrics").collect()
    assert(after.length == 3)
    assert(after.forall(_.getAs[String]("channel_id") == "UC_2"),
      after.map(_.getAs[String]("channel_id")).mkString(","))
    Silver.refresh(l, Some(tables))
    val full3 = l.table("silver", "fact_channel_daily_metrics").collect()
    assert(after.map(_.toString).sorted.toSeq == full3.map(_.toString).sorted.toSeq)
  }

  test("parallel level-order refresh materializes the same silver as sequential") {
    refreshed
    // re-baseline sequentially first: earlier tests appended bronze data
    // (run4) without refreshing every downstream model
    Silver.refresh(lake)
    val before = Silver.models.map(m =>
      m.name -> lake.table("silver", m.name).collect().map(_.toString).sorted.toSeq).toMap
    val levels = Silver.refreshParallel(lake)
    assert(levels.flatten.toSet == Silver.models.map(_.name).toSet)
    assert(levels.size > 1 && levels.head.size > 1) // real parallelism in level 0
    Silver.models.foreach { m =>
      val now = lake.table("silver", m.name).collect().map(_.toString).sorted.toSeq
      assert(now == before(m.name), s"${m.name} differs after parallel refresh")
    }
  }

  test("run_context_log: finalize updates the run row in place") {
    refreshed
    val log = lake.table("bronze", "run_context_log")
    assert(log.count() == 2) // run1, run2 logged (run3 not logged in fixture)
    val r1 = log.filter(col("run_id") === "run1").head()
    assert(r1.getAs[String]("run_status") == "success")
    assert(r1.getAs[java.sql.Timestamp]("finalized_ts_utc") != null)
  }

  test("finalize is append-before-delete: an interrupted finalize is recoverable") {
    val l = new Lakehouse(spark, Files.createTempDirectory("graft-fin").toString)
    val ctx = Bronze.RunContext("runC", "reqC", d("2025-06-05"), ts("2025-06-05 10:00:00"))
    Bronze.logRunStart(l, ctx, "{}")
    // simulate a finalize interrupted between its append and its delete: the
    // superseding row landed, the stale null-status row was never removed
    val src = l.table("bronze", "run_context_log").filter(col("run_id") === "runC")
      .withColumn("run_status", lit("unknown"))
      .withColumn("finalized_ts_utc", lit(ts("2025-06-05 10:01:00")))
    val rows = src.collect()
    l.appendBronze("run_context_log",
      l.spark.createDataFrame(l.spark.sparkContext.parallelize(rows.toSeq, 1), src.schema))
    assert(l.table("bronze", "run_context_log").filter(col("run_id") === "runC").count() == 2)
    // readers already resolve to the finalized row (finalize-else-ingest order)
    val status = Checks.latestRunSuccess.run(l).collect().map(_.getString(0))
    assert(status.toSeq == Seq("unknown"))
    // a re-finalize converges back to exactly one row
    Bronze.finalizeRun(l, "runC", "unknown", ts("2025-06-05 10:02:00"))
    val after = l.table("bronze", "run_context_log").filter(col("run_id") === "runC").collect()
    assert(after.length == 1)
    assert(after.head.getAs[String]("run_status") == "unknown")
  }

  test("smoke checks offend on an empty lake: missing objects, no run log") {
    val empty = new Lakehouse(spark, Files.createTempDirectory("graft-empty").toString)
    assert(Checks.requiredObjects.run(empty).count() == 14) // all required missing
    val status = Checks.latestRunSuccess.run(empty).collect().map(_.getString(0))
    assert(status.toSeq == Seq("missing: run_context_log"))
  }

  test("post-deploy smoke: clean after a finalized pipeline; offends on a failed latest run") {
    refreshed
    val clean = Checks.runSmoke(lake, d("2025-06-03"))
    assert(clean.forall(_._3 == 0L), s"smoke failures: $clean")
    // a FAILED run finalized later than run1/run2 must trip the check; undo after
    val ctxF = Bronze.RunContext("runF", "reqF", d("2025-06-04"), ts("2025-06-04 10:00:00"))
    Bronze.logRunStart(lake, ctxF, """{"mode":"auto"}""")
    Bronze.finalizeRun(lake, "runF", "failed", ts("2025-06-04 10:05:00"))
    try {
      val bad = Checks.latestRunSuccess.run(lake).collect().map(_.getString(0))
      assert(bad.toSeq == Seq("failed"))
    } finally {
      // remove the failed run so later tests see a successful latest run
      lake.deleteByRunId("run_context_log", "runF")
      assert(Checks.latestRunSuccess.run(lake).isEmpty)
    }
  }

  test("dims incremental merge equals full recompute (new values and dates)") {
    refreshed
    // run 5 lands one new value per observed dim and one new calendar date
    val ctx5 = Bronze.RunContext("run5", "req5", d("2025-06-05"), ts("2025-06-05 10:00:00"))
    Bronze.ingest(lake, ctx5, _ => Map(
      "analytics_video_traffic_source_daily_raw" -> Seq(report(
        Seq(dim("video"), dim("day"), dim("insightTrafficSourceType"), met("views")),
        Seq(Seq("V1", "2025-06-04", "ext_url", "2")))),
      "analytics_video_device_daily_raw" -> Seq(report(
        Seq(dim("video"), dim("day"), dim("deviceType"), met("views")),
        Seq(Seq("V2", "2025-06-04", "tablet", "1")))),
      "analytics_video_country_daily_raw" -> Seq(report(
        Seq(dim("video"), dim("day"), dim("country"), met("views")),
        Seq(Seq("V1", "2025-06-04", "de", "3")))),
      "analytics_video_daily_raw" -> Seq(report(vidHeaders, Seq(
        Seq("V1", "2025-06-04", "4", "1", "0", "2", "30.0")))),
      "analytics_channel_daily_raw" -> Seq(report(chHeaders, Seq(
        Seq("2025-06-04", "25", "5", "2", "12", "4", "0"))))))
    Bronze.finalizeRun(lake, "run5", "success", ts("2025-06-05 10:05:00"))
    val since = d("2025-06-05")
    // facts first (Job order: dims read the merged facts' bronze frontier)
    Silver.latestWinsSpecs.keys.foreach(n => Silver.refreshIncremental(lake, n, since))
    Silver.refreshIncremental(lake, "fact_channel_daily_metrics", since)
    val dims = Seq("dim_traffic_source", "dim_device", "dim_country", "dim_date")
    dims.foreach(n => Silver.refreshIncremental(lake, n, since))
    val inc = dims.map(t =>
      t -> lake.table("silver", t).collect().map(_.toString).sorted.toSeq).toMap
    // merged-in values are present, enriched, and unique at the dim grain
    assert(lake.table("silver", "dim_traffic_source")
      .filter(col("source_id") === "EXT_URL").count() == 1)
    assert(lake.table("silver", "dim_device")
      .filter(col("device_type") === "TABLET").count() == 1)
    val de = lake.table("silver", "dim_country")
      .filter(col("country_code") === "DE").collect()
    assert(de.length == 1 && de.head.getAs[String]("country_name") == "Germany",
      s"expected enriched DE row, got ${de.toSeq}")
    assert(lake.table("silver", "dim_date")
      .filter(col("date") === lit(d("2025-06-04"))).count() == 1)
    // identical to a full recompute over all bronze history
    Silver.refresh(lake, Some(dims.toSet))
    val full = dims.map(t =>
      t -> lake.table("silver", t).collect().map(_.toString).sorted.toSeq).toMap
    assert(inc == full, "dims incremental != full recompute")
  }

  test("CDF-driven feed refresh equals full recompute for every latest-wins model " +
      "(bounded ticks, re-observations, winner retraction)") {
    val l = new Lakehouse(spark, Files.createTempDirectory("graft-cdfmv").toString)
    def land(run: String, snap: String, views: Long, chTitle: String): Unit = {
      val ctx = Bronze.RunContext(run, s"req-$run", d(snap), ts(s"$snap 10:00:00"))
      Bronze.logRunStart(l, ctx, """{"mode":"auto"}""")
      Bronze.ingest(l, ctx, _ => Map(
        "channels_raw" -> Seq(channelPayload("UC_1", chTitle, views * 10, 10)),
        "videos_raw" -> Seq(videosPayload(videoItem("V1", "UC_1", "T", views))),
        "analytics_video_daily_raw" -> Seq(report(vidHeaders, Seq(
          Seq("V1", snap, views.toString, "1", "0", "3", "41.5"),
          Seq("V1", "2025-05-31", (views + 1).toString, "1", "0", "3", "42.0")))),
        "analytics_video_traffic_source_daily_raw" -> Seq(report(
          Seq(dim("video"), dim("day"), dim("insightTrafficSourceType"), met("views")),
          Seq(Seq("V1", snap, "yt_search", views.toString)))),
        "analytics_video_country_daily_raw" -> Seq(report(
          Seq(dim("video"), dim("day"), dim("country"), met("views")),
          Seq(Seq("V1", snap, "us", views.toString)))),
        "analytics_video_device_daily_raw" -> Seq(report(
          Seq(dim("video"), dim("day"), dim("deviceType"), met("views")),
          Seq(Seq("V1", snap, "MOBILE", views.toString))))))
      Bronze.finalizeRun(l, run, "success", ts(s"$snap 10:05:00"))
    }
    val models = Silver.latestWinsSpecs.keys.toSeq.sorted
    val cursors = models.map(n =>
      n -> Files.createTempDirectory(s"graft-cdfmv-$n").toString).toMap
    // one-version ticks: convergence must be bounded and multi-tick
    def drain(n: String): Int = {
      var t = 0
      while (Silver.refreshFromChangeFeed(l, n, cursors(n), maxVersions = 1).isDefined) {
        t += 1; require(t <= 12, s"$n capped feed drain failed to converge")
      }
      t
    }
    def expected(n: String): Seq[String] = {
      val spec = Silver.latestWinsSpecs(n)
      Silver.latestWins(spec.typed(l.table("bronze", spec.bronzeTable)),
        spec.grain, spec.order).collect().map(_.toString).sorted.toSeq
    }
    def actual(n: String): Seq[String] =
      l.table("silver", n).collect().map(_.toString).sorted.toSeq

    land("runA", "2025-06-01", 10, "Chan A")
    land("runB", "2025-06-02", 20, "Chan B") // re-observations: latest wins
    models.foreach { n =>
      // a fresh cursor bootstraps from the SNAPSHOT in one tick (never a
      // version-0 feed drain — pruned early manifests would brick it)
      assert(drain(n) == 1, s"$n expected one snapshot-bootstrap tick")
      assert(actual(n) == expected(n), s"$n bootstrap feed != recompute")
    }
    // a caught-up consumer is a no-op tick
    models.foreach(n => assert(
      Silver.refreshFromChangeFeed(l, n, cursors(n)).isEmpty, s"$n not caught up"))

    // new observations fold incrementally
    land("runC", "2025-06-03", 30, "Chan C")
    models.foreach { n =>
      drain(n)
      assert(actual(n) == expected(n), s"$n post-runC feed != recompute")
    }
    // WINNER RETRACTION: delete the current channel winner's bronze rows —
    // the fold must re-derive the grain from the source and fall back to
    // runB's row, which snapshot-driven refresh cannot express
    l.deleteBronzeWhereDv("channels_raw", col("run_id") === "runC", Nil)
    assert(drain("silver_channels") == 1)
    assert(actual("silver_channels") == expected("silver_channels"),
      "retraction fold != recompute")
    val ch = l.table("silver", "silver_channels").collect()
    assert(ch.length == 1 && ch.head.getAs[String]("run_id") == "runB" &&
      ch.head.getAs[String]("channel_title") == "Chan B",
      s"winner did not fall back to runB: ${ch.toSeq}")
  }

  test("fresh-cursor bootstrap works on a MATURE lake whose early manifests are pruned") {
    import spark.implicits._
    val l = new Lakehouse(spark, Files.createTempDirectory("graft-cdfmature").toString)
    // > one checkpoint interval of commits WITHOUT a registered cursor:
    // commit-time retention prunes the early manifests — a version-0 feed
    // drain would fail fast forever ('version 1 is not retained')
    (1 to 14).foreach { i =>
      l.appendBronze("src",
        Seq((i.toLong, s"g${i % 3}", i.toLong, s"r$i"))
          .toDF("id", "grp", "val", "run_id").repartition(1))
    }
    assert(l.tableVersions("bronze", "src").min > 1, "expected pruned early manifests")
    val cursor = Files.createTempDirectory("graft-cdfmature-cur").toString
    def tick() = Silver.latestWinsFeedTick(l, "silver", "mv", "src",
      Seq("grp"), Seq(col("id").desc), identity, cursor)
    def expected: Seq[String] =
      Silver.latestWins(l.table("bronze", "src"), Seq("grp"), Seq(col("id").desc))
        .collect().map(_.toString).sorted.toSeq
    def actual: Seq[String] =
      l.table("silver", "mv").collect().map(_.toString).sorted.toSeq
    // snapshot bootstrap: one tick, cursor jumps to the head
    assert(tick().contains((0, 14)))
    assert(actual == expected, "mature-lake bootstrap diverged")
    assert(tick().isEmpty)
    // incremental from there
    l.appendBronze("src",
      Seq((99L, "g1", 99L, "r99")).toDF("id", "grp", "val", "run_id").repartition(1))
    assert(tick().isDefined)
    assert(actual == expected)
    // the delete-to-force-a-rebuild idiom: MV gone + caught-up cursor must
    // REBUILD from the snapshot, not silently never materialize again
    val mvDir = java.nio.file.Paths.get(l.root, "silver", "mv")
    val w = Files.walk(mvDir)
    try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => Files.deleteIfExists(p))
    finally w.close()
    assert(tick().isEmpty) // caught up — but the rebuild happened
    assert(actual == expected, "deleted MV was not rebuilt on the no-op tick")
  }

  test("feed fold pairs NULL grain values: retraction and re-observation of a NULL-key grain") {
    import spark.implicits._
    val l = new Lakehouse(spark, Files.createTempDirectory("graft-cdfnullg").toString)
    def obs(run: String, recs: Seq[(Long, Option[String], Long)]) =
      recs.map { case (id, g, v) => (id, g.orNull, v, run) }
        .toDF("id", "grp", "val", "run_id").repartition(1)
    val cursor = Files.createTempDirectory("graft-cdfnullg-cur").toString
    def tick() = Silver.latestWinsFeedTick(l, "silver", "mv", "src",
      Seq("grp"), Seq(col("id").desc), identity, cursor)
    def expected: Seq[String] =
      Silver.latestWins(l.table("bronze", "src"), Seq("grp"), Seq(col("id").desc))
        .collect().map(_.toString).sorted.toSeq
    def actual: Seq[String] =
      l.table("silver", "mv").collect().map(_.toString).sorted.toSeq
    // NULL-grain observations alongside a real grain
    l.appendBronze("src", obs("r1", Seq((1L, None, 10L), (2L, Some("a"), 3L))))
    assert(tick().isDefined)
    assert(actual == expected, "bootstrap with a NULL grain diverged")
    // a NEWER NULL-grain observation must REPLACE the standing NULL winner
    l.appendBronze("src", obs("r2", Seq((3L, None, 7L))))
    assert(tick().isDefined)
    assert(actual == expected, "NULL-grain re-observation stranded the old winner")
    assert(l.table("silver", "mv").filter(col("grp").isNull).count() == 1)
    // retracting the NULL winner falls back to the OLDER NULL observation
    l.deleteBronzeWhereDv("src", col("id") === 3L, Nil)
    assert(tick().isDefined)
    assert(actual == expected, "NULL-grain retraction diverged from recompute")
    val n = l.table("silver", "mv").filter(col("grp").isNull).collect()
    assert(n.length == 1 && n.head.getAs[Long]("id") == 1L,
      s"NULL-grain winner did not fall back: ${n.toSeq}")
  }

  test("latest-wins capped tick with a retraction across ADD COLUMNS does not " +
      "livelock (pinned rebuild NULL-fills head columns)") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val l = new Lakehouse(spark, Files.createTempDirectory("graft-cdfwiden").toString)
    val cursor = Files.createTempDirectory("graft-cdfwiden-cur").toString
    // pre-widening model code, and the upgraded projection shipped with the
    // bronze ADD COLUMNS: references `flag` in a FILTER (output schema fixed)
    val narrow: DataFrame => DataFrame = _.select("id", "grp", "val", "run_id")
    val upgraded: DataFrame => DataFrame = df =>
      df.filter(col("flag").isNull || col("flag") =!= "drop")
        .select("id", "grp", "val", "run_id")
    def tick(typed: DataFrame => DataFrame) = Silver.latestWinsFeedTick(
      l, "silver", "mv", "src", Seq("grp"), Seq(col("id").desc), typed, cursor,
      maxVersions = 1)
    l.appendBronze("src", Seq((1L, "a", 10L, "r1"), (2L, "b", 20L, "r2"))
      .toDF("id", "grp", "val", "run_id").repartition(1))                    // v1
    assert(tick(narrow).isDefined)                        // snapshot bootstrap
    l.appendBronze("src", Seq((3L, "a", 30L, "r3"))
      .toDF("id", "grp", "val", "run_id").repartition(1))                    // v2
    l.deleteBronzeWhereDv("src", col("id") === 3L, Nil)                      // v3: retraction
    l.appendBronze("src",
      Seq((4L, "c", 40L, "r4", "ok"), (5L, "b", 50L, "r5", "drop"))
        .toDF("id", "grp", "val", "run_id", "flag").repartition(1))          // v4: ADD COLUMNS
    // one-version drains under the upgraded projection: the (2,3] range
    // contains the delete and ends before the widening — the pinned rebuild
    // read must NULL-fill `flag` or every retry of that range throws
    var guard = 0
    while (tick(upgraded).isDefined) {
      guard += 1; require(guard <= 6, "cross-widening capped drain failed to converge")
    }
    val expected = Silver.latestWins(upgraded(l.table("bronze", "src")),
      Seq("grp"), Seq(col("id").desc)).collect().map(_.toString).sorted.toSeq
    val actual = l.table("silver", "mv").collect().map(_.toString).sorted.toSeq
    assert(actual == expected, "cross-widening capped drain != recompute")
    // the retraction re-derived grain a's winner from the pinned source …
    val a = l.table("silver", "mv").filter(col("grp") === "a").collect()
    assert(a.length == 1 && a.head.getAs[Long]("id") == 1L, s"grain a: ${a.toSeq}")
    // … and the upgraded filter binds REAL flag values, not just the NULL fill
    val b = l.table("silver", "mv").filter(col("grp") === "b").collect()
    assert(b.length == 1 && b.head.getAs[Long]("id") == 2L, s"grain b: ${b.toSeq}")
  }

  test("SCD2 capped tick with a retraction across ADD COLUMNS does not livelock") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    val l = new Lakehouse(spark, Files.createTempDirectory("graft-scd2widen").toString)
    val cursor = Files.createTempDirectory("graft-scd2widen-cur").toString
    val narrow: DataFrame => DataFrame = _.select("id", "seq", "v", "run_id")
    val upgraded: DataFrame => DataFrame = df =>
      df.filter(col("flag").isNull || col("flag") =!= "drop")
        .select("id", "seq", "v", "run_id")
    val segment: DataFrame => DataFrame = df => {
      val w = Window.partitionBy("id").orderBy("seq")
      df.select("id", "seq", "v")
        .withColumn("next_seq", lead("seq", 1).over(w))
        .withColumn("is_current", col("next_seq").isNull)
    }
    def tick(typed: DataFrame => DataFrame) = Silver.scd2FeedTick(
      l, "silver", "scd2", "obs_log", "src2", Seq("id"), Seq("id", "seq"),
      typed, segment, cursor, maxVersions = 1)
    l.appendBronze("src2", Seq((1L, 1L, "x", "r1"), (2L, 1L, "y", "r1"))
      .toDF("id", "seq", "v", "run_id").repartition(1))                      // v1
    assert(tick(narrow).isDefined)                        // snapshot bootstrap
    l.appendBronze("src2", Seq((1L, 2L, "x2", "r2"))
      .toDF("id", "seq", "v", "run_id").repartition(1))                      // v2
    l.deleteBronzeWhereDv("src2", col("seq") === 2L, Nil)                    // v3: retraction
    l.appendBronze("src2",
      Seq((3L, 1L, "z", "r4", "ok"), (2L, 2L, "y2", "r5", "drop"))
        .toDF("id", "seq", "v", "run_id", "flag").repartition(1))            // v4: ADD COLUMNS
    var guard = 0
    while (tick(upgraded).isDefined) {
      guard += 1; require(guard <= 6, "cross-widening capped scd2 drain failed to converge")
    }
    val expected = segment(upgraded(l.table("bronze", "src2"))
      .dropDuplicates(Seq("id", "seq"))).collect().map(_.toString).sorted.toSeq
    val actual = l.table("silver", "scd2").collect().map(_.toString).sorted.toSeq
    assert(actual == expected, "cross-widening capped scd2 drain != recompute")
    // id 1's retracted observation re-segmented away; id 2's "drop" filtered
    assert(l.table("silver", "scd2").filter(col("id") === 1L).count() == 1)
    assert(l.table("silver", "scd2").filter(col("id") === 2L).count() == 1)
    assert(l.table("silver", "scd2").filter(col("id") === 3L).count() == 1)
  }
}
