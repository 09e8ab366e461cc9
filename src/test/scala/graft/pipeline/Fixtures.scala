package graft.pipeline

import java.sql.{Date, Timestamp}

/** Fixture payload builders mirroring FIXTURES.md §3-4: Data API item
  * payloads and Analytics API report matrices, including the degraded
  * shapes silver must absorb (shuffled headers, missing columns, lowercase
  * dims, empty dims, error payloads).
  */
object Fixtures {

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  def d(s: String): Date = Date.valueOf(s)

  def channelPayload(id: String, title: String, viewCount: Long, subs: Long): String =
    s"""{"items": [{"id": "$id",
       |  "snippet": {"title": "$title", "description": "desc of $title",
       |              "customUrl": "@$id", "country": "PH",
       |              "publishedAt": "2019-05-01T10:00:00Z"},
       |  "statistics": {"viewCount": "$viewCount", "subscriberCount": "$subs",
       |                 "hiddenSubscriberCount": false, "videoCount": "2"},
       |  "contentDetails": {"relatedPlaylists": {"uploads": "UU_$id"}}}]}""".stripMargin

  /** One video item with full metadata + statistics (serves all three
    * silver readers of videos_raw). */
  def videoItem(id: String, channelId: String, title: String, views: Long,
      description: String = "vdesc", privacy: String = "public"): String =
    s"""{"id": "$id",
       |  "snippet": {"channelId": "$channelId", "title": "$title",
       |              "description": "$description",
       |              "publishedAt": "2024-03-01T08:00:00Z",
       |              "defaultLanguage": "en", "defaultAudioLanguage": "en"},
       |  "statistics": {"viewCount": "$views", "likeCount": "${views / 10}",
       |                 "favoriteCount": "0", "commentCount": "${views / 20}"},
       |  "contentDetails": {"duration": "PT4M13S", "dimension": "2d",
       |                     "definition": "hd", "caption": "false",
       |                     "licensedContent": true, "projection": "rectangular"},
       |  "status": {"uploadStatus": "processed", "privacyStatus": "$privacy",
       |             "embeddable": true, "publicStatsViewable": true,
       |             "madeForKids": false, "selfDeclaredMadeForKids": false},
       |  "topicDetails": {"topicCategories":
       |    ["https://en.wikipedia.org/wiki/Technology", "https://en.wikipedia.org/wiki/Music"]}}""".stripMargin

  def videosPayload(items: String*): String = s"""{"items": [${items.mkString(", ")}]}"""

  /** Analytics report matrix payload. */
  def report(headers: Seq[(String, String, String)], rows: Seq[Seq[String]]): String = {
    val hs = headers.map { case (n, ct, dt) =>
      s"""{"name": "$n", "columnType": "$ct", "dataType": "$dt"}"""
    }.mkString("[", ", ", "]")
    val rs = rows.map(_.map(v => s""""$v"""").mkString("[", ", ", "]")).mkString("[", ", ", "]")
    s"""{"columnHeaders": $hs, "rows": $rs, "status": "ok",
       | "window": {"start_date": "2025-05-30", "end_date": "2025-06-02",
       |            "lookback_days": 7, "mode": "rolling_lookback"}}""".stripMargin
  }

  def dim(n: String) = (n, "DIMENSION", "STRING")
  def met(n: String) = (n, "METRIC", "INTEGER")

  /** API error payload — no columnHeaders/rows at all (FIXTURES §4(f)). */
  val errorPayload: String =
    """{"status": "error", "errors": [{"reason": "quotaExceeded"}]}"""
}
