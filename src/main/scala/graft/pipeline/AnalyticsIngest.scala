package graft.pipeline

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import Json._

/** Scala port of the reference's Analytics-API driver-side ingestion logic —
  * its single largest operator: date-window resolution, the 4-level
  * metric/dimension fallback chains, the per-video loop fallback, and the
  * re-mapping of whatever headers the API returned into the canonical
  * 5-column (video, day, <dimension>, views, estimatedMinutesWatched) and
  * 7-column (video daily) header/rows matrices that silver binds by name.
  *
  * All pure collection code (no Spark, no HTTP): the API lives behind
  * [[AnalyticsApiClient]], exactly as the reference keeps `requests` behind
  * `_query_reports` (reference
  * `job_tasks/bronze/ingest_analytics_api_to_bronze.py:151-331,495-606`,
  * window resolution `:59-81`). Payloads come out as [[Json.JObj]] trees
  * with the reference's exact key structure, serialized into the bronze
  * envelope by [[AnalyticsPayloadSource]].
  */
object AnalyticsIngest {

  /** `(start, end, mode)` — mode ∈ {explicit_date_range, rolling_lookback}. */
  type Window = (LocalDate, LocalDate, String)

  private val Iso = DateTimeFormatter.ISO_LOCAL_DATE

  private def parseIsoDate(value: String, argName: String): LocalDate =
    try LocalDate.parse(value, Iso)
    catch {
      case _: Exception => throw new IllegalArgumentException(
        s"$argName must be in YYYY-MM-DD format. Got '$value'.")
    }

  /** Port of `_resolve_window` (reference `:57-79`): explicit range (with
    * "auto"-family aliases meaning unset) vs rolling lookback ending
    * yesterday; validates start/end format, lookback positivity, and
    * start ≤ end. One reference quirk preserved EXACTLY: when start-date is
    * unset, end-date is IGNORED entirely (not validated, not honored) and
    * the rolling window applies — end-date only takes effect alongside an
    * explicit start-date (reference `:61-74`: the end branch is nested
    * under `if start_date_raw`). `today` is injectable for deterministic
    * tests (the reference hardwires `date.today()`). */
  def resolveWindow(
      startDate: String, endDate: String, lookbackDays: Int,
      today: LocalDate = LocalDate.now()): Window = {
    var startRaw = Option(startDate).getOrElse("").trim
    var endRaw = Option(endDate).getOrElse("").trim
    if (Set("auto", "default", "lookback", "rolling").contains(startRaw.toLowerCase)) startRaw = ""
    if (Set("auto", "default", "yesterday").contains(endRaw.toLowerCase)) endRaw = ""

    if (startRaw.nonEmpty) {
      val start = parseIsoDate(startRaw, "start-date")
      val end = if (endRaw.nonEmpty) parseIsoDate(endRaw, "end-date") else today.minusDays(1)
      if (start.isAfter(end))
        throw new IllegalArgumentException(
          s"start-date must be on or before end-date. Got start-date=${start.format(Iso)} " +
            s"and end-date=${end.format(Iso)}.")
      (start, end, "explicit_date_range")
    } else {
      if (lookbackDays <= 0)
        throw new IllegalArgumentException("lookback-days must be greater than 0.")
      val end = today.minusDays(1)
      (end.minusDays(lookbackDays - 1L), end, "rolling_lookback")
    }
  }

  /** One Analytics API report call: Right(ok-payload with columnHeaders +
    * rows) or Left(error body). Mirrors `_query_reports` (`:152-177`) minus
    * the HTTP transport. */
  trait AnalyticsApiClient {
    def queryReports(params: Map[String, String]): Either[JVal, JObj]
  }

  private def paramsObj(params: Map[String, String]): JObj =
    JObj(params.toSeq.sortBy(_._1).map { case (k, v) => k -> (JStr(v): JVal) })

  /** Wrap a client result the way `_query_reports` annotates it: ok payloads
    * get `request`/`status`; errors get the error body + params. */
  def queryReports(client: AnalyticsApiClient, params: Map[String, String]): JObj =
    client.queryReports(params) match {
      case Right(ok) => JObj(ok.fields ++ Seq(
        "request" -> JObj.of("params" -> paramsObj(params)),
        "status" -> JStr("ok")))
      case Left(err) => JObj.of(
        "status" -> JStr("error"),
        "request" -> JObj.of("params" -> paramsObj(params)),
        "error" -> err)
    }

  /** 2-level primary/fallback (`_query_with_fallback`, `:179-204`). */
  def queryWithFallback(
      client: AnalyticsApiClient,
      primary: Map[String, String],
      fallback: Option[Map[String, String]]): JObj = {
    val first = queryReports(client, primary)
    if (first("status") == JStr("ok") || fallback.isEmpty) first
    else {
      val second = queryReports(client, fallback.get)
      if (second("status") == JStr("ok"))
        JObj(second.fields ++ Seq(
          "fallback_used" -> JBool(true),
          "primary_error" -> first("error")))
      else JObj.of(
        "status" -> JStr("error"),
        "primary_error" -> first("error"),
        "fallback_error" -> second("error"),
        "request" -> JObj.of(
          "primary_params" -> paramsObj(primary),
          "fallback_params" -> paramsObj(fallback.get)))
    }
  }

  /** N-level degradation chain (`_query_with_fallback_chain`, `:206-229`):
    * first ok wins, annotated with its fallback level + prior errors. */
  def queryWithFallbackChain(
      client: AnalyticsApiClient, paramsChain: Seq[Map[String, String]]): JObj = {
    require(paramsChain.nonEmpty, "params_chain must contain at least one query definition.")
    val errors = Vector.newBuilder[JVal]
    paramsChain.zipWithIndex.foreach { case (params, i) =>
      val payload = queryReports(client, params)
      if (payload("status") == JStr("ok")) {
        val annotated =
          if (i == 0) payload
          else JObj(payload.fields ++ Seq(
            "fallback_used" -> JBool(true),
            "fallback_level" -> JInt(i),
            "previous_errors" -> JArr(errors.result())))
        return annotated
      }
      errors += JObj.of("params" -> paramsObj(params), "error" -> payload("error"))
    }
    JObj.of(
      "status" -> JStr("error"),
      "errors" -> JArr(errors.result()),
      "request" -> JObj.of("params_chain" -> JArr(paramsChain.map(paramsObj))))
  }

  /** header name → value map for one row (`row_map` in the reference —
    * zip truncated to the shorter side). */
  private def rowMap(headerNames: Seq[String], row: Seq[JVal]): Map[String, JVal] =
    headerNames.zip(row).toMap

  private def headerNames(payload: JObj): Seq[String] = payload("columnHeaders") match {
    case JArr(hs) => hs.map { case o: JObj => o("name") match { case JStr(s) => s; case _ => "" }
                             case _ => "" }
    case _ => Seq.empty
  }

  private def rowsOf(payload: JObj): Seq[Seq[JVal]] = payload("rows") match {
    case JArr(rs) => rs.map { case JArr(cells) => cells; case _ => Seq.empty }
    case _ => Seq.empty
  }

  private def header(name: String, colType: String, dataType: String): JVal =
    JObj.of("name" -> JStr(name), "columnType" -> JStr(colType), "dataType" -> JStr(dataType))

  private def dimensionHeaders(dimensionName: String): JVal = JArr(Seq(
    header("video", "DIMENSION", "STRING"),
    header("day", "DIMENSION", "STRING"),
    header(dimensionName, "DIMENSION", "STRING"),
    header("views", "METRIC", "INTEGER"),
    header("estimatedMinutesWatched", "METRIC", "INTEGER")))

  /** Channel daily metrics — single query, no fallback
    * (`_query_channel_daily`, `:232-243`). */
  def queryChannelDaily(client: AnalyticsApiClient, start: LocalDate, end: LocalDate): JObj =
    queryReports(client, Map(
      "ids" -> "channel==MINE",
      "startDate" -> start.format(Iso),
      "endDate" -> end.format(Iso),
      "metrics" -> "views,likes,comments,estimatedMinutesWatched,subscribersGained,subscribersLost",
      "dimensions" -> "day",
      "sort" -> "day"))

  /** Per-dimension video report (`_query_video_dimension_per_video`,
    * `:255-431`): 4-level bulk degradation chain; on bulk success re-map
    * rows to the canonical 5-column matrix; else fall back to a per-video
    * loop with its own 3-level chain, accumulating rows + errors into an
    * ok / partial_error / error payload. */
  def queryVideoDimensionPerVideo(
      client: AnalyticsApiClient, start: LocalDate, end: LocalDate,
      videoIds: Seq[String], dimensionName: String): JObj = {
    val s = start.format(Iso); val e = end.format(Iso)
    def bulkParams(metrics: String, dims: String) = Map(
      "ids" -> "channel==MINE", "startDate" -> s, "endDate" -> e,
      "metrics" -> metrics, "dimensions" -> dims, "sort" -> dims)
    val bulk = queryWithFallbackChain(client, Seq(
      bulkParams("views,estimatedMinutesWatched", s"day,video,$dimensionName"),
      bulkParams("views", s"day,video,$dimensionName"),
      bulkParams("views,estimatedMinutesWatched", s"video,$dimensionName"),
      bulkParams("views", s"video,$dimensionName")))

    if (bulk("status") == JStr("ok")) {
      val names = headerNames(bulk)
      val outRows = rowsOf(bulk).map { row =>
        val m = rowMap(names, row)
        JArr(Seq("video", "day", dimensionName, "views", "estimatedMinutesWatched")
          .map(k => m.getOrElse(k, JNull)))
      }
      return JObj.of(
        "status" -> JStr("ok"),
        "columnHeaders" -> dimensionHeaders(dimensionName),
        "rows" -> JArr(outRows),
        "bulk_query_used" -> JBool(true),
        "request" -> JObj.of(
          "startDate" -> JStr(s), "endDate" -> JStr(e),
          "dimension" -> JStr(dimensionName),
          "strategy" -> JStr("channel_level_video_dimension")))
    }

    if (videoIds.isEmpty)
      return JObj.of(
        "status" -> JStr("ok"),
        "columnHeaders" -> dimensionHeaders(dimensionName),
        "rows" -> JArr(Seq.empty),
        "request" -> JObj.of(
          "video_count" -> JInt(0),
          "startDate" -> JStr(s), "endDate" -> JStr(e),
          "dimension" -> JStr(dimensionName)))

    val outRows = Vector.newBuilder[JVal]
    val errors = Vector.newBuilder[JVal]
    var anyRows = false
    var anyErrors = false
    videoIds.foreach { videoId =>
      def perVideoParams(metrics: String, dims: String) = Map(
        "ids" -> "channel==MINE", "startDate" -> s, "endDate" -> e,
        "metrics" -> metrics, "dimensions" -> dims,
        "filters" -> s"video==$videoId", "sort" -> dims)
      val payload = queryWithFallbackChain(client, Seq(
        perVideoParams("views,estimatedMinutesWatched", s"day,$dimensionName"),
        perVideoParams("views", s"day,$dimensionName"),
        perVideoParams("views", dimensionName)))
      if (payload("status") != JStr("ok")) {
        anyErrors = true
        errors += JObj.of("video_id" -> JStr(videoId), "errors" -> payload("errors"))
      } else {
        val names = headerNames(payload)
        rowsOf(payload).foreach { row =>
          val m = rowMap(names, row)
          anyRows = true
          outRows += JArr(JStr(videoId) +: Seq("day", dimensionName, "views", "estimatedMinutesWatched")
            .map(k => m.getOrElse(k, JNull)))
        }
      }
    }
    val status = if (!anyErrors) "ok" else if (anyRows) "partial_error" else "error"
    JObj.of(
      "status" -> JStr(status),
      "columnHeaders" -> dimensionHeaders(dimensionName),
      "rows" -> JArr(outRows.result()),
      "errors" -> JArr(errors.result()),
      "bulk_query_error" -> bulk("errors"),
      "request" -> JObj.of(
        "video_count" -> JInt(videoIds.size),
        "startDate" -> JStr(s), "endDate" -> JStr(e),
        "dimension" -> JStr(dimensionName),
        "filters" -> JStr("video==VIDEO_ID (per request)")))
  }

  private val videoDailyHeaders: JVal = JArr(Seq(
    header("video", "DIMENSION", "STRING"),
    header("day", "DIMENSION", "STRING"),
    header("views", "METRIC", "INTEGER"),
    header("likes", "METRIC", "INTEGER"),
    header("comments", "METRIC", "INTEGER"),
    header("estimatedMinutesWatched", "METRIC", "INTEGER"),
    header("averageViewDuration", "METRIC", "FLOAT")))

  /** Video daily metrics, per video with metric degradation
    * (`_query_video_daily_per_video`, `:495-606`): primary 5-metric query,
    * fallback 2-metric; rows re-mapped into the canonical 7-column matrix
    * (absent metrics → null). */
  def queryVideoDailyPerVideo(
      client: AnalyticsApiClient, start: LocalDate, end: LocalDate,
      videoIds: Seq[String]): JObj = {
    val s = start.format(Iso); val e = end.format(Iso)
    if (videoIds.isEmpty)
      return JObj.of(
        "status" -> JStr("ok"),
        "columnHeaders" -> videoDailyHeaders,
        "rows" -> JArr(Seq.empty),
        "request" -> JObj.of(
          "video_count" -> JInt(0), "startDate" -> JStr(s), "endDate" -> JStr(e)))

    val outRows = Vector.newBuilder[JVal]
    val errors = Vector.newBuilder[JVal]
    var anyRows = false
    var anyErrors = false
    videoIds.foreach { videoId =>
      def params(metrics: String) = Map(
        "ids" -> "channel==MINE", "startDate" -> s, "endDate" -> e,
        "metrics" -> metrics, "dimensions" -> "day",
        "filters" -> s"video==$videoId", "sort" -> "day")
      val payload = queryWithFallback(client,
        params("views,likes,comments,estimatedMinutesWatched,averageViewDuration"),
        Some(params("views,estimatedMinutesWatched")))
      if (payload("status") != JStr("ok")) {
        anyErrors = true
        errors += JObj.of(
          "video_id" -> JStr(videoId),
          "primary_error" -> payload("primary_error"),
          "fallback_error" -> payload("fallback_error"))
      } else {
        val names = headerNames(payload)
        rowsOf(payload).foreach { row =>
          val m = rowMap(names, row)
          anyRows = true
          outRows += JArr(JStr(videoId) +:
            Seq("day", "views", "likes", "comments", "estimatedMinutesWatched", "averageViewDuration")
              .map(k => m.getOrElse(k, JNull)))
        }
      }
    }
    val status = if (!anyErrors) "ok" else if (anyRows) "partial_error" else "error"
    JObj.of(
      "status" -> JStr(status),
      "columnHeaders" -> videoDailyHeaders,
      "rows" -> JArr(outRows.result()),
      "errors" -> JArr(errors.result()),
      "request" -> JObj.of(
        "video_count" -> JInt(videoIds.size),
        "startDate" -> JStr(s), "endDate" -> JStr(e),
        "dimensions" -> JStr("day"),
        "filters" -> JStr("video==VIDEO_ID (per request)")))
  }

  /** The full Analytics ingest as a [[Bronze.PayloadSource]]: 5 report
    * payloads → 5 bronze tables, one envelope row each (reference
    * `main()`, `:627-779`). `videoIds` comes from the latest `videos_raw`
    * payload (see [[DataApiIngest.latestVideoIds]]). */
  final class AnalyticsPayloadSource(
      client: AnalyticsApiClient, start: LocalDate, end: LocalDate, mode: String,
      lookbackDays: Int, videoIds: Seq[String]) extends Bronze.PayloadSource {

    private def withWindow(payload: JObj): String =
      JObj(payload.fields :+ ("window" -> (JObj.of(
        "start_date" -> JStr(start.format(Iso)),
        "end_date" -> JStr(end.format(Iso)),
        "lookback_days" -> JInt(lookbackDays),
        "mode" -> JStr(mode)): JVal))).render

    def payloads(ctx: Bronze.RunContext): Map[String, Seq[String]] = Map(
      "analytics_channel_daily_raw" ->
        Seq(withWindow(queryChannelDaily(client, start, end))),
      "analytics_video_daily_raw" ->
        Seq(withWindow(queryVideoDailyPerVideo(client, start, end, videoIds))),
      "analytics_video_traffic_source_daily_raw" ->
        Seq(withWindow(queryVideoDimensionPerVideo(client, start, end, videoIds, "insightTrafficSourceType"))),
      "analytics_video_country_daily_raw" ->
        Seq(withWindow(queryVideoDimensionPerVideo(client, start, end, videoIds, "country"))),
      "analytics_video_device_daily_raw" ->
        Seq(withWindow(queryVideoDimensionPerVideo(client, start, end, videoIds, "deviceType"))))
  }
}
