package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

import Json._

/** Scala port of the reference's Data-API driver-side ingestion logic:
  * `nextPageToken` pagination with item accumulation, 50-id chunked video
  * fetches, uploads-playlist-id extraction, and video-id collection
  * (reference `job_tasks/bronze/ingest_data_api_to_bronze.py:115-182` and
  * the main-flow wiring `:227-287`).
  *
  * HTTP stays behind [[DataApiClient]] (the reference's `_api_get_json`);
  * everything here is pure collection code except [[latestVideoIds]], which
  * is the one Spark read-back the reference also does (`ORDER BY ... LIMIT 1`
  * + driver JSON parse — `ingest_analytics_api_to_bronze.py:469-492`).
  */
object DataApiIngest {

  /** One Data API GET returning the parsed JSON body; HTTP failures throw
    * (the reference's `raise_for_status`). */
  trait DataApiClient {
    def getJson(path: String, params: Map[String, String]): JObj
  }

  val ChunkSize = 50

  /** Hard ceiling on pagination (the reference loops unbounded — `:131`).
    * A server echoing the same `nextPageToken`, or cycling tokens, would
    * otherwise hang the driver and grow the item buffer without limit;
    * failing loudly beats both. 10,000 pages × 50 items is far beyond any
    * real uploads playlist. */
  val MaxPages = 10000

  /** Page through `playlistItems` accumulating every page's items
    * (`_fetch_all_playlist_items`, `:126-155`): follow `nextPageToken`
    * until absent/empty, count pages, and wrap with the bookkeeping keys
    * the reference records. */
  def fetchAllPlaylistItems(client: DataApiClient, uploadsPlaylistId: String): JObj = {
    val items = Vector.newBuilder[JVal]
    var itemCount = 0
    var nextPageToken = ""
    var pageCount = 0
    var done = false
    while (!done) {
      if (pageCount >= MaxPages)
        throw new IllegalStateException(
          s"playlistItems pagination exceeded $MaxPages pages for playlist " +
            s"'$uploadsPlaylistId' — token loop or runaway listing")
      val base = Map(
        "part" -> "snippet,contentDetails,status",
        "playlistId" -> uploadsPlaylistId,
        "maxResults" -> "50")
      val params = if (nextPageToken.nonEmpty) base + ("pageToken" -> nextPageToken) else base
      val page = client.getJson("playlistItems", params)
      page("items") match {
        case JArr(xs) => items ++= xs; itemCount += xs.size
        case _ => // non-list items ignored, like the reference's isinstance check
      }
      pageCount += 1
      nextPageToken = page("nextPageToken") match {
        case JStr(t) => t
        case _ => ""
      }
      if (nextPageToken.isEmpty) done = true
    }
    JObj.of(
      "items" -> JArr(items.result()),
      "item_count" -> JInt(itemCount),
      "page_count" -> JInt(pageCount),
      "playlist_id" -> JStr(uploadsPlaylistId))
  }

  /** Fetch full video metadata in chunks of 50 ids
    * (`_fetch_videos_by_ids`, `:158-182`). */
  def fetchVideosByIds(client: DataApiClient, videoIds: Seq[String]): JObj = {
    val items = Vector.newBuilder[JVal]
    var itemCount = 0
    videoIds.grouped(ChunkSize).foreach { chunk =>
      val page = client.getJson("videos", Map(
        "part" -> "id,snippet,contentDetails,statistics,status,topicDetails",
        "id" -> chunk.mkString(","),
        "maxResults" -> "50"))
      page("items") match {
        case JArr(xs) => items ++= xs; itemCount += xs.size
        case _ =>
      }
    }
    JObj.of(
      "items" -> JArr(items.result()),
      "item_count" -> JInt(itemCount),
      "requested_video_count" -> JInt(videoIds.size),
      "chunk_size" -> JInt(ChunkSize))
  }

  /** [[fetchVideosByIds]] through the partition-per-chunk
    * [[graft.sources.RestVideosSource]] DataSourceV2: the chunk requests
    * fire from EXECUTORS in parallel instead of walking sequentially on
    * the driver — the at-scale ingest shape (SURVEY §2.1/S1). Returns the
    * rendered envelope BYTE-IDENTICAL to `fetchVideosByIds(...).render`
    * given the same client responses: item rows are reassembled in
    * (chunk_idx, item_idx) order and spliced into the same sorted-key
    * JSON layout, so bronze rows are indistinguishable between the two
    * paths (ApiIngestSpec pins this). The driver collect mirrors the
    * sequential path's accumulation — at a scale where collecting items
    * is unreasonable, keep the source's DataFrame distributed and land it
    * as item rows instead. */
  def fetchVideosByIdsParallel(spark: SparkSession,
      clientFactory: () => DataApiClient, videoIds: Seq[String]): String = {
    val key = graft.sources.RestClientRegistry.register(clientFactory)
    try {
      val items = spark.read.format("graft.sources.RestVideosSource")
        .option("clientKey", key)
        .option("videoIds", videoIds.mkString(","))
        .option("chunkSize", ChunkSize.toString)
        .load()
        .orderBy(col("chunk_idx"), col("item_idx"))
        .select(col("item_json"))
        .collect().map(_.getString(0))
      // JObj.render sorts keys — splice the pre-rendered items into the
      // same alphabetical envelope layout
      s"""{"chunk_size":$ChunkSize,"item_count":${items.length},""" +
        s""""items":[${items.mkString(",")}],"requested_video_count":${videoIds.size}}"""
    } finally graft.sources.RestClientRegistry.unregister(key)
  }

  /** `items[0].contentDetails.relatedPlaylists.uploads`, else ""
    * (main-flow extraction, `:241-249`). */
  def uploadsPlaylistIdFrom(channelsResponse: JObj): String =
    channelsResponse("items") match {
      case JArr((first: JObj) +: _) => (for {
        cd <- first.get("contentDetails").collect { case o: JObj => o }
        rp <- cd.get("relatedPlaylists").collect { case o: JObj => o }
        up <- rp.get("uploads").collect { case JStr(s) => s }
      } yield up).getOrElse("")
      case _ => ""
    }

  /** Distinct sorted `contentDetails.videoId` over playlist items
    * (main-flow collection, `:269-275`). */
  def videoIdsFromPlaylist(playlistPayload: JObj): Seq[String] = {
    val ids = playlistPayload("items") match {
      case JArr(xs) => xs.collect { case item: JObj =>
        item("contentDetails") match {
          case cd: JObj => cd("videoId") match { case JStr(s) if s.nonEmpty => Some(s); case _ => None }
          case _ => None
        }
      }.flatten
      case _ => Seq.empty
    }
    ids.distinct.sorted
  }

  /** The one cluster→driver read-back: latest `videos_raw` payload → video
    * ids (`_latest_video_ids_for_channel`,
    * `ingest_analytics_api_to_bronze.py:469-492`). JSON parsing happens in
    * Spark (`from_json` with an explicit minimal schema — never inference),
    * and only the id list crosses to the driver. */
  def latestVideoIds(lake: Lakehouse): Seq[String] = {
    if (!lake.exists("bronze", "videos_raw")) return Seq.empty
    val idsSchema = new StructType()
      .add("items", ArrayType(new StructType().add("id", StringType)))
    val rows = lake.table("bronze", "videos_raw")
      .orderBy(col("snapshot_date").desc, col("ingest_ts_utc").desc)
      .limit(1)
      .select(explode_outer(from_json(col("payload"), idsSchema).getField("items")).as("item"))
      .select(col("item.id").as("id"))
      .filter(col("id").isNotNull && col("id") =!= "")
      .collect()
    rows.map(_.getString(0)).toSeq.distinct.sorted
  }

  /** The full Data API ingest as a [[Bronze.PayloadSource]]: channels →
    * uploads playlist pages → chunked videos, with the reference's
    * missing-playlist / no-videos warning payloads (main flow, `:227-287`).
    *
    * `parallelVideos`: when a SparkSession and client factory are
    * supplied, the chunked video fetch goes through the partition-per-
    * chunk [[graft.sources.RestVideosSource]] (executors issue the chunk
    * requests concurrently) instead of the sequential driver walk; the
    * bronze envelope is byte-identical either way (spec-pinned), so this
    * is purely a throughput switch for large video inventories. */
  final class DataApiPayloadSource(client: DataApiClient,
      parallelVideos: Option[(SparkSession, () => DataApiClient)] = None)
      extends Bronze.PayloadSource {
    def payloads(ctx: Bronze.RunContext): Map[String, Seq[String]] = {
      val channels = client.getJson("channels",
        Map("part" -> "id,snippet,contentDetails,statistics", "mine" -> "true"))
      val uploadsId = uploadsPlaylistIdFrom(channels)
      val playlist =
        if (uploadsId.nonEmpty) fetchAllPlaylistItems(client, uploadsId)
        else JObj.of(
          "items" -> JArr(Seq.empty),
          "warning" -> JStr("uploads playlist id missing from channels response."))
      val videoIds = videoIdsFromPlaylist(playlist)
      val videos: String =
        if (videoIds.isEmpty)
          JObj.of(
            "items" -> JArr(Seq.empty),
            "warning" -> JStr("no video ids found in playlist items response.")).render
        else parallelVideos match {
          case Some((spark, factory)) => fetchVideosByIdsParallel(spark, factory, videoIds)
          case None                   => fetchVideosByIds(client, videoIds).render
        }
      Map(
        "channels_raw" -> Seq(channels.render),
        "playlist_items_raw" -> Seq(playlist.render),
        "videos_raw" -> Seq(videos))
    }
  }
}
