package graft.pipeline

import java.nio.file.Files
import java.time.LocalDate

import graft.SparkSpec
import org.apache.spark.sql.functions._

import Json._
import AnalyticsIngest._
import DataApiIngest._
import Fixtures.{d, ts}

/** End-to-end ingest with RAW (un-normalized) API responses: the fake
  * clients return exactly what the YouTube APIs would — paginated playlist
  * pages, chunked video lookups, analytics reports with shuffled headers /
  * missing metrics / failing parameter sets — and the Scala ports of the
  * reference's driver-side logic (pagination, chunking, fallback chains,
  * canonical re-mapping) normalize them before bronze. Silver/gold then
  * bind the canonical matrices. This closes the S1/S2 seam end-to-end: no
  * pre-normalized fixtures anywhere. */
class RawIngestPipelineSpec extends SparkSpec {

  private lazy val lake = new Lakehouse(spark, Files.createTempDirectory("graft-raw-lake").toString)

  // ── raw Data API fake: 2 playlist pages, videos served in chunks ────────
  // a CLASS (not object): pagination is stateful, so each ingest needs a
  // fresh instance; the videos path is pure and thread-safe (parallel tasks)
  private class RawDataClientImpl extends DataApiClient {
    private var playlistPage = 0
    def getJson(path: String, params: Map[String, String]): JObj = path match {
      case "channels" => JObj.of("items" -> JArr(Seq(JObj.of(
        "id" -> JStr("UC_1"),
        "snippet" -> JObj.of(
          "title" -> JStr("Raw Chan"), "description" -> JStr("d"),
          "customUrl" -> JStr("@raw"), "country" -> JStr("PH"),
          "publishedAt" -> JStr("2019-05-01T10:00:00Z")),
        "statistics" -> JObj.of(
          "viewCount" -> JStr("500"), "subscriberCount" -> JStr("50"),
          "hiddenSubscriberCount" -> JBool(false), "videoCount" -> JStr("2")),
        "contentDetails" -> JObj.of("relatedPlaylists" -> JObj.of("uploads" -> JStr("UU_1")))))))
      case "playlistItems" =>
        // page 1 carries a token; page 2 ends the pagination
        playlistPage += 1
        if (playlistPage == 1)
          JObj.of(
            "items" -> JArr(Seq(
              JObj.of("contentDetails" -> JObj.of("videoId" -> JStr("V2"))))),
            "nextPageToken" -> JStr("p2"))
        else
          JObj.of("items" -> JArr(Seq(
            JObj.of("contentDetails" -> JObj.of("videoId" -> JStr("V1"))))))
      case "videos" =>
        val items = params("id").split(",").toSeq.map { id =>
          JObj.of(
            "id" -> JStr(id),
            "snippet" -> JObj.of(
              "channelId" -> JStr("UC_1"), "title" -> JStr(s"Title $id"),
              "description" -> JStr("vd"), "publishedAt" -> JStr("2024-03-01T08:00:00Z"),
              "defaultLanguage" -> JStr("en"), "defaultAudioLanguage" -> JStr("en")),
            "statistics" -> JObj.of(
              "viewCount" -> JStr("10"), "likeCount" -> JStr("1"),
              "favoriteCount" -> JStr("0"), "commentCount" -> JStr("0")),
            "contentDetails" -> JObj.of(
              "duration" -> JStr("PT4M13S"), "dimension" -> JStr("2d"),
              "definition" -> JStr("hd"), "caption" -> JStr("false"),
              "licensedContent" -> JBool(true), "projection" -> JStr("rectangular")),
            "status" -> JObj.of(
              "uploadStatus" -> JStr("processed"), "privacyStatus" -> JStr("public"),
              "embeddable" -> JBool(true), "publicStatsViewable" -> JBool(true),
              "madeForKids" -> JBool(false), "selfDeclaredMadeForKids" -> JBool(false)),
            "topicDetails" -> JObj.of("topicCategories" -> JArr(Seq(
              JStr("https://en.wikipedia.org/wiki/Technology")))))
        }
        JObj.of("items" -> JArr(items))
    }
  }

  private lazy val RawDataClient = new RawDataClientImpl

  // ── raw Analytics API fake: per-report-family behaviors ─────────────────
  private object RawAnalyticsClient extends AnalyticsApiClient {
    private def report(headers: Seq[String], rows: Seq[Seq[JVal]]): JObj =
      JObj.of(
        "columnHeaders" -> JArr(headers.map(h => JObj.of(
          "name" -> JStr(h), "columnType" -> JStr("DIMENSION"), "dataType" -> JStr("STRING")))),
        "rows" -> JArr(rows.map(JArr(_))))
    private val err: JVal = JObj.of("http_status" -> JInt(400), "body" -> JStr("badRequest"))

    def queryReports(params: Map[String, String]): Either[JVal, JObj] = {
      val dims = params("dimensions")
      val metrics = params("metrics")
      if (dims == "day" && !params.contains("filters"))
        // channel daily: plain ok report
        Right(report(Seq("day", "views", "likes", "comments", "estimatedMinutesWatched",
          "subscribersGained", "subscribersLost"),
          Seq(Seq(JStr("2025-05-31"), JStr("12"), JStr("2"), JStr("1"), JStr("8"),
            JStr("3"), JStr("1")))))
      else if (dims == "day" && params.contains("filters"))
        // video daily per-video: the 5-metric primary fails, 2-metric works
        if (metrics.contains("likes")) Left(err)
        else {
          val vid = params("filters").stripPrefix("video==")
          Right(report(Seq("day", "views", "estimatedMinutesWatched"),
            Seq(Seq(JStr("2025-05-31"), JStr(if (vid == "V1") "5" else "7"), JStr("3")))))
        }
      else if (dims.contains("country"))
        // country bulk: ok at level 1 (views-only) with SHUFFLED headers
        if (metrics == "views" && dims == "day,video,country")
          Right(report(Seq("country", "views", "video", "day"),
            Seq(
              Seq(JStr("us"), JStr("4"), JStr("V1"), JStr("2025-05-31")),
              Seq(JStr("ph"), JStr("1"), JStr("V1"), JStr("2025-05-31")))))
        else Left(err)
      else if (dims.contains("insightTrafficSourceType"))
        // traffic: EVERY bulk level fails → per-video loop, day+dim level ok
        if (!params.contains("filters")) Left(err)
        else if (metrics == "views,estimatedMinutesWatched" && dims == "day,insightTrafficSourceType")
          Right(report(Seq("day", "insightTrafficSourceType", "views", "estimatedMinutesWatched"),
            Seq(Seq(JStr("2025-05-31"), JStr("yt_search"), JStr("3"), JStr("2")))))
        else Left(err)
      else if (dims.contains("deviceType"))
        // device bulk: full primary ok
        if (dims == "day,video,deviceType" && metrics == "views,estimatedMinutesWatched")
          Right(report(Seq("day", "video", "deviceType", "views", "estimatedMinutesWatched"),
            Seq(Seq(JStr("2025-05-31"), JStr("V1"), JStr("MOBILE"), JStr("2"), JStr("1")))))
        else Left(err)
      else Left(err)
    }
  }

  private lazy val refreshed: Unit = {
    val ctx = Bronze.RunContext("rawrun1", "rawreq1", d("2025-06-01"), ts("2025-06-01 10:00:00"))
    // stage 1: Data API (channels → paged playlist → chunked videos)
    Bronze.ingest(lake, ctx, new DataApiPayloadSource(RawDataClient))
    // stage 2: Analytics API fed by the landed video ids (the reference's
    // cluster→driver read-back), explicit window
    val (start, end, mode) = resolveWindow("2025-05-30", "2025-06-01", 7)
    val videoIds = latestVideoIds(lake)
    assert(videoIds == Seq("V1", "V2"))
    Bronze.ingest(lake, ctx,
      new AnalyticsPayloadSource(RawAnalyticsClient, start, end, mode, 7, videoIds))
    Silver.refresh(lake)
  }

  test("data api ingest through the V2 parallel source lands byte-identical bronze") {
    refreshed
    val lake2 = new Lakehouse(spark, java.nio.file.Files.createTempDirectory("graft-rawpar").toString)
    val ctx = Bronze.RunContext("rawrun1", "rawreq1", d("2025-06-01"), ts("2025-06-01 10:00:00"))
    val fresh = new RawDataClientImpl // pagination state starts clean
    Bronze.ingest(lake2, ctx,
      new DataApiPayloadSource(fresh, parallelVideos = Some((spark, () => fresh))))
    for (t <- Seq("channels_raw", "playlist_items_raw", "videos_raw")) {
      val a = lake.table("bronze", t).select("payload").collect().map(_.getString(0)).sorted.toSeq
      val b = lake2.table("bronze", t).select("payload").collect().map(_.getString(0)).sorted.toSeq
      assert(a == b, s"$t payloads diverge between sequential and parallel ingest")
    }
  }

  test("data api: paginated playlist + chunked videos land accumulated payloads") {
    refreshed
    import org.apache.spark.sql.types.{ArrayType, StringType, StructType}
    val playlist = lake.table("bronze", "playlist_items_raw").head().getAs[String]("payload")
    assert(playlist.contains("\"page_count\":2"))
    assert(playlist.contains("\"item_count\":2"))
    val videos = lake.table("bronze", "videos_raw")
      .select(from_json(col("payload"),
        new StructType()
          .add("item_count", "long")
          .add("items", ArrayType(new StructType().add("id", StringType)))).as("p"))
      .select(col("p.item_count"), col("p.items.id").as("ids")).head()
    assert(videos.getLong(0) == 2L)
    assert(videos.getSeq[String](1).sorted == Seq("V1", "V2"))
  }

  test("silver binds facts from the normalizer's canonical matrices") {
    refreshed
    // channel daily straight through
    val ch = lake.table("silver", "fact_channel_daily_metrics").head()
    assert(ch.getAs[Long]("views") == 12L && ch.getAs[Long]("subscribers_gained") == 3L)
    // video daily: per-video metric degradation → likes/comments NULL
    val vd = lake.table("silver", "fact_video_daily_metrics")
    assert(vd.count() == 2)
    val v1 = vd.filter(col("video_id") === "V1").head()
    assert(v1.getAs[Long]("views") == 5L)
    assert(v1.isNullAt(v1.fieldIndex("likes")) && v1.isNullAt(v1.fieldIndex("comments")))
    // country: bulk fallback level 1 with shuffled headers → re-mapped by
    // name; estimatedMinutesWatched degraded away → NULL
    val cf = lake.table("silver", "fact_video_country_metrics")
    assert(cf.count() == 2)
    val us = cf.filter(col("country_code") === "US").head()
    assert(us.getAs[Long]("views") == 4L)
    assert(us.isNullAt(us.fieldIndex("estimated_minutes_watched")))
    // traffic: per-video loop fallback emits one row per looped video;
    // dim uppercased by silver
    val tf = lake.table("silver", "fact_video_traffic_source_metrics")
    assert(tf.count() == 2) // V1 and V2 each answered in the loop
    assert(tf.select("source_id").collect().map(_.getString(0)).toSet == Set("YT_SEARCH"))
    // device: bulk primary ok end-to-end
    val df = lake.table("silver", "fact_video_device_metrics")
    assert(df.head().getAs[String]("device_type") == "MOBILE")
  }

  test("scd2 + silver_videos materialize from raw chunked video payloads") {
    refreshed
    val scd = lake.table("silver", "silver_video_metadata_scd2")
    assert(scd.count() == 2) // one current version per video
    assert(scd.filter(col("is_current")).count() == 2)
    val sv = lake.table("silver", "silver_videos")
    assert(sv.select("video_id").collect().map(_.getString(0)).sorted.toSeq == Seq("V1", "V2"))
    assert(sv.filter(col("video_id") === "V1").head()
      .getAs[String]("latest_video_title") == "Title V1")
  }
}
