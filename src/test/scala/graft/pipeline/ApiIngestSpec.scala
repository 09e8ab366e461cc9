package graft.pipeline

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import Json._
import AnalyticsIngest._
import DataApiIngest._

/** Pure unit tests (no Spark) for the driver-side API ingestion port:
  * the 4 reference pytest cases for window resolution (reference
  * `tests/test_ingest_analytics_window.py:43-64`), pagination/chunking
  * (reference `ingest_data_api_to_bronze.py:115-182`), and the fallback
  * chain + canonical header/rows normalization (reference
  * `ingest_analytics_api_to_bronze.py:151-331,495-606`). */
class ApiIngestSpec extends AnyFunSuite {

  private val today = LocalDate.parse("2025-06-15")

  // ── _resolve_window: the 4 reference pytest cases ────────────────────────

  test("resolve_window accepts auto start and end (rolling lookback)") {
    val (start, end, mode) = resolveWindow("auto", "auto", 7, today)
    assert(mode == "rolling_lookback")
    assert(end == today.minusDays(1))
    assert(start == end.minusDays(6))
  }

  test("resolve_window explicit start with auto end") {
    val (start, end, mode) = resolveWindow("2025-01-01", "auto", 7, today)
    assert(mode == "explicit_date_range")
    assert(start.toString == "2025-01-01")
    assert(end == today.minusDays(1))
  }

  test("resolve_window rejects invalid start date") {
    val e = intercept[IllegalArgumentException](resolveWindow("autoo", "", 7, today))
    assert(e.getMessage.contains("start-date must be in YYYY-MM-DD format"))
  }

  test("resolve_window rejects start after end") {
    val e = intercept[IllegalArgumentException](resolveWindow("2025-02-01", "2025-01-31", 7, today))
    assert(e.getMessage.contains("start-date must be on or before end-date"))
  }

  test("resolve_window rejects non-positive lookback") {
    val e = intercept[IllegalArgumentException](resolveWindow("", "", 0, today))
    assert(e.getMessage.contains("lookback-days must be greater than 0"))
  }

  // ── Data API pagination + chunking ───────────────────────────────────────

  /** Fake client recording every (path, params) call. */
  private class RecordingDataClient(pages: Map[String, Seq[JObj]], videos: JObj = JObj.of())
      extends DataApiClient {
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String])]
    private var playlistCall = 0
    def getJson(path: String, params: Map[String, String]): JObj = {
      calls += ((path, params))
      path match {
        case "playlistItems" =>
          val seq = pages(params("playlistId"))
          val out = seq(playlistCall); playlistCall += 1; out
        case "videos" => videos
        case other => throw new IllegalStateException(s"unexpected path $other")
      }
    }
  }

  private def item(id: String): JVal =
    JObj.of("contentDetails" -> JObj.of("videoId" -> JStr(id)))

  test("playlist pagination follows nextPageToken and accumulates all pages") {
    val pages = Seq(
      JObj.of("items" -> JArr(Seq(item("a"), item("b"))), "nextPageToken" -> JStr("t1")),
      JObj.of("items" -> JArr(Seq(item("c"))), "nextPageToken" -> JStr("t2")),
      JObj.of("items" -> JArr(Seq(item("d")))))  // no token → stop
    val client = new RecordingDataClient(Map("UU_x" -> pages))
    val out = fetchAllPlaylistItems(client, "UU_x")
    assert(out("item_count") == JInt(4))
    assert(out("page_count") == JInt(3))
    assert(out("playlist_id") == JStr("UU_x"))
    // first call has no pageToken; later calls carry the prior page's token
    assert(client.calls.map(_._2.get("pageToken")) == Seq(None, Some("t1"), Some("t2")))
    // every call pins part + maxResults
    assert(client.calls.forall { case (_, p) =>
      p("part") == "snippet,contentDetails,status" && p("maxResults") == "50" })
  }

  test("pagination fails loudly on a nextPageToken loop instead of hanging") {
    object LoopingClient extends DataApiClient {
      def getJson(path: String, params: Map[String, String]): JObj =
        JObj.of("items" -> JArr(Seq.empty), "nextPageToken" -> JStr("same-token-forever"))
    }
    val e = intercept[IllegalStateException](fetchAllPlaylistItems(LoopingClient, "UU_loop"))
    assert(e.getMessage.contains("token loop"))
  }

  test("video fetch chunks ids in batches of 50 preserving order") {
    val ids = (1 to 120).map(i => f"v$i%03d")
    val client = new RecordingDataClient(Map.empty,
      videos = JObj.of("items" -> JArr(Seq(item("x")))))
    val out = fetchVideosByIds(client, ids)
    val chunks = client.calls.map(_._2("id").split(",").toSeq)
    assert(chunks.map(_.size) == Seq(50, 50, 20))
    assert(chunks.flatten == ids)              // order preserved, no id lost
    assert(out("requested_video_count") == JInt(120))
    assert(out("item_count") == JInt(3))       // one accumulated item per chunk call
    assert(out("chunk_size") == JInt(50))
  }

  test("uploads playlist id + video id extraction handle missing fields") {
    val channels = JObj.of("items" -> JArr(Seq(JObj.of(
      "contentDetails" -> JObj.of("relatedPlaylists" -> JObj.of("uploads" -> JStr("UU_1")))))))
    assert(uploadsPlaylistIdFrom(channels) == "UU_1")
    assert(uploadsPlaylistIdFrom(JObj.of("items" -> JArr(Seq(JObj.of())))) == "")
    assert(uploadsPlaylistIdFrom(JObj.of()) == "")
    val playlist = JObj.of("items" -> JArr(Seq(
      item("v2"), item("v1"), item("v2"), JObj.of("contentDetails" -> JObj.of()))))
    assert(videoIdsFromPlaylist(playlist) == Seq("v1", "v2")) // distinct + sorted
  }

  // ── Analytics fallback chain + normalization ─────────────────────────────

  /** Fake analytics client: params sets matching `failWhen` error; others
    * return `response`. Records metric/dimension degradation order. */
  private class ChainClient(
      failWhen: Map[String, String] => Boolean,
      response: Map[String, String] => JObj) extends AnalyticsApiClient {
    val calls = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    def queryReports(params: Map[String, String]): Either[JVal, JObj] = {
      calls += params
      if (failWhen(params))
        Left(JObj.of("http_status" -> JInt(400), "body" -> JStr("badRequest")))
      else Right(response(params))
    }
  }

  private def reportOf(headers: Seq[String], rows: Seq[Seq[JVal]]): JObj =
    JObj.of(
      "columnHeaders" -> JArr(headers.map(h =>
        JObj.of("name" -> JStr(h), "columnType" -> JStr("DIMENSION"), "dataType" -> JStr("STRING")))),
      "rows" -> JArr(rows.map(JArr(_))))

  private val start = LocalDate.parse("2025-06-01")
  private val end = LocalDate.parse("2025-06-07")

  test("fallback chain: first ok level wins and is annotated") {
    // levels 0 and 1 fail (full metrics + day dims), level 2 succeeds
    val client = new ChainClient(
      failWhen = p => p("dimensions").startsWith("day"),
      response = _ => reportOf(Seq("video", "country", "views"),
        Seq(Seq(JStr("v1"), JStr("PH"), JStr("100")))))
    val out = queryVideoDimensionPerVideo(client, start, end, Seq("v1"), "country")
    assert(out("status") == JStr("ok"))
    assert(out("bulk_query_used") == JBool(true))
    // levels 0,1 are day,video,country; level 2 video,country succeeds
    assert(client.calls.map(_("dimensions")) ==
      Seq("day,video,country", "day,video,country", "video,country"))
    assert(client.calls.map(_("metrics")) ==
      Seq("views,estimatedMinutesWatched", "views", "views,estimatedMinutesWatched"))
  }

  test("bulk normalization re-maps shuffled headers to the canonical 5-column matrix") {
    // API returns columns in a different order and WITHOUT estimatedMinutesWatched
    val client = new ChainClient(
      failWhen = _ => false,
      response = _ => reportOf(Seq("country", "views", "video", "day"),
        Seq(
          Seq(JStr("PH"), JStr("100"), JStr("v1"), JStr("2025-06-01")),
          Seq(JStr("US"), JStr("50"), JStr("v2"), JStr("2025-06-02")))))
    val out = queryVideoDimensionPerVideo(client, start, end, Seq("v1", "v2"), "country")
    assert(out("status") == JStr("ok"))
    val names = out("columnHeaders").asInstanceOf[JArr].xs
      .map(_.asInstanceOf[JObj]("name").asInstanceOf[JStr].s)
    assert(names == Seq("video", "day", "country", "views", "estimatedMinutesWatched"))
    assert(out("rows") == JArr(Seq(
      JArr(Seq(JStr("v1"), JStr("2025-06-01"), JStr("PH"), JStr("100"), JNull)),
      JArr(Seq(JStr("v2"), JStr("2025-06-02"), JStr("US"), JStr("50"), JNull)))))
  }

  test("per-video loop fallback kicks in when every bulk level fails") {
    // bulk (no filters key) always fails; per-video (filters present) succeeds
    // only at its last level (dimensions without day)
    val client = new ChainClient(
      failWhen = p => !p.contains("filters") || p("dimensions").startsWith("day"),
      response = p => reportOf(Seq("country", "views"),
        Seq(Seq(JStr("PH"), JStr("7")))))
    val out = queryVideoDimensionPerVideo(client, start, end, Seq("v1", "v2"), "country")
    assert(out("status") == JStr("ok"))
    // canonical rows carry the looped video id; absent day/EMW → null
    assert(out("rows") == JArr(Seq(
      JArr(Seq(JStr("v1"), JNull, JStr("PH"), JStr("7"), JNull)),
      JArr(Seq(JStr("v2"), JNull, JStr("PH"), JStr("7"), JNull)))))
    val perVideo = client.calls.filter(_.contains("filters"))
    assert(perVideo.map(_("filters")).distinct == Seq("video==v1", "video==v2"))
    assert(perVideo.map(_("dimensions")).take(3) == Seq("day,country", "day,country", "country"))
  }

  test("per-video loop: one failing video → partial_error with its rows kept") {
    val client = new ChainClient(
      failWhen = p => !p.contains("filters") || p.get("filters").contains("video==bad"),
      response = _ => reportOf(Seq("day", "country", "views", "estimatedMinutesWatched"),
        Seq(Seq(JStr("2025-06-01"), JStr("PH"), JStr("3"), JStr("1")))))
    val out = queryVideoDimensionPerVideo(client, start, end, Seq("good", "bad"), "country")
    assert(out("status") == JStr("partial_error"))
    assert(out("rows").asInstanceOf[JArr].xs.size == 1)
    val errs = out("errors").asInstanceOf[JArr].xs
    assert(errs.size == 1)
    assert(errs.head.asInstanceOf[JObj]("video_id") == JStr("bad"))
  }

  test("empty video ids with failing bulk → ok empty payload with video_count 0") {
    val client = new ChainClient(failWhen = _ => true, response = _ => JObj.of())
    val out = queryVideoDimensionPerVideo(client, start, end, Seq.empty, "deviceType")
    assert(out("status") == JStr("ok"))
    assert(out("rows") == JArr(Seq.empty))
    assert(out("request").asInstanceOf[JObj]("video_count") == JInt(0))
  }

  test("video daily per-video degrades metrics and pads the 7-column matrix") {
    // primary 5-metric query fails; 2-metric fallback succeeds
    val client = new ChainClient(
      failWhen = p => p("metrics").contains("likes"),
      response = _ => reportOf(Seq("day", "views", "estimatedMinutesWatched"),
        Seq(Seq(JStr("2025-06-01"), JStr("10"), JStr("4")))))
    val out = queryVideoDailyPerVideo(client, start, end, Seq("v9"))
    assert(out("status") == JStr("ok"))
    assert(out("rows") == JArr(Seq(JArr(Seq(
      JStr("v9"), JStr("2025-06-01"), JStr("10"), JNull, JNull, JStr("4"), JNull)))))
    assert(client.calls.map(_("metrics")) == Seq(
      "views,likes,comments,estimatedMinutesWatched,averageViewDuration",
      "views,estimatedMinutesWatched"))
  }

  test("fallback-chain error payload records every level's params and errors") {
    val client = new ChainClient(failWhen = _ => true, response = _ => JObj.of())
    val out = queryWithFallbackChain(client,
      Seq(Map("metrics" -> "a"), Map("metrics" -> "b")))
    assert(out("status") == JStr("error"))
    assert(out("errors").asInstanceOf[JArr].xs.size == 2)
  }

  test("json renders with sorted keys and escaped strings") {
    val j = JObj.of("b" -> JInt(1), "a" -> JStr("x\"y\n"), "c" -> JArr(Seq(JNull, JBool(true))))
    assert(j.render == """{"a":"x\"y\n","b":1,"c":[null,true]}""")
  }
}
