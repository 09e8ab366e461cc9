package graft.pipeline

import org.apache.spark.sql.types._

/** Schema contract for the medallion lakehouse (SURVEY.md §1).
  *
  * The bronze envelope is fixed and contract-validated; payload interiors are
  * declared at read time as DDL strings handed to `from_json` — never
  * inferred (reference `lakeflow/bootstrap_unity_catalog.sql:16-24`,
  * `bronze_to_silver_pipeline.sql:20,85,144,311,383`).
  */
object Schemas {

  /** The 7-column bronze envelope shared by every raw table. */
  val bronzeEnvelope: StructType = StructType(Seq(
    StructField("snapshot_date", DateType, nullable = false),
    StructField("ingest_ts_utc", TimestampType, nullable = false),
    StructField("source_system", StringType, nullable = false),
    StructField("request_id", StringType, nullable = false),
    StructField("schema_version", StringType, nullable = false),
    StructField("run_id", StringType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** The nine bronze raw tables (reference `bootstrap_unity_catalog.sql:16-110`
    * + `init_run_context.py:109-124`). */
  val bronzeTables: Seq[String] = Seq(
    "channels_raw", "playlist_items_raw", "videos_raw",
    "analytics_channel_daily_raw", "analytics_video_daily_raw",
    "analytics_video_traffic_source_daily_raw",
    "analytics_video_country_daily_raw", "analytics_video_device_daily_raw",
    "run_context_log")

  /** Data API channels payload (reference `bronze_to_silver_pipeline.sql:20`). */
  val channelsPayloadDdl: String =
    """STRUCT<items: ARRAY<STRUCT<
      |  id: STRING,
      |  snippet: STRUCT<title: STRING, description: STRING, customUrl: STRING,
      |                  country: STRING, publishedAt: STRING>,
      |  statistics: STRUCT<viewCount: STRING, subscriberCount: STRING,
      |                     hiddenSubscriberCount: BOOLEAN, videoCount: STRING>>>>"""
      .stripMargin

  /** Video statistics reader of the videos payload (reference `:85`). */
  val videoStatsPayloadDdl: String =
    """STRUCT<items: ARRAY<STRUCT<
      |  id: STRING,
      |  snippet: STRUCT<channelId: STRING>,
      |  statistics: STRUCT<viewCount: STRING, likeCount: STRING,
      |                     favoriteCount: STRING, commentCount: STRING>>>>"""
      .stripMargin

  /** Full video metadata reader — 3-level nesting + string array
    * (reference `:144`). */
  val videoMetadataPayloadDdl: String =
    """STRUCT<items: ARRAY<STRUCT<
      |  id: STRING,
      |  snippet: STRUCT<channelId: STRING, title: STRING, description: STRING,
      |                  publishedAt: STRING, defaultLanguage: STRING,
      |                  defaultAudioLanguage: STRING>,
      |  contentDetails: STRUCT<duration: STRING, dimension: STRING,
      |                         definition: STRING, caption: STRING,
      |                         licensedContent: BOOLEAN, projection: STRING>,
      |  status: STRUCT<uploadStatus: STRING, privacyStatus: STRING,
      |                 embeddable: BOOLEAN, publicStatsViewable: BOOLEAN,
      |                 madeForKids: BOOLEAN, selfDeclaredMadeForKids: BOOLEAN>,
      |  topicDetails: STRUCT<topicCategories: ARRAY<STRING>>>>>"""
      .stripMargin

  /** Slim videos reader (reference `:311`). */
  val videosSlimPayloadDdl: String =
    """STRUCT<items: ARRAY<STRUCT<
      |  id: STRING,
      |  snippet: STRUCT<channelId: STRING, title: STRING, publishedAt: STRING>,
      |  status: STRUCT<privacyStatus: STRING, uploadStatus: STRING>>>>"""
      .stripMargin

  /** Analytics API report matrix — dynamic-width table as header/rows arrays,
    * parsed with primitivesAsString (reference `:383-385`). */
  val analyticsReportDdl: String =
    """STRUCT<columnHeaders: ARRAY<STRUCT<name: STRING, columnType: STRING,
      |                                   dataType: STRING>>,
      |       rows: ARRAY<ARRAY<STRING>>>"""
      .stripMargin

  /** Accepted device types (reference `dbt/models/schema.yml:90-98`). */
  val acceptedDeviceTypes: Seq[String] =
    Seq("DESKTOP", "MOBILE", "TABLET", "TV", "GAME_CONSOLE", "UNKNOWN")

  /** The 22 known traffic-source ids
    * (reference `dbt/tests/warn_new_traffic_source_ids.sql:9-33`). */
  val knownTrafficSources: Seq[String] = Seq(
    "ADVERTISING", "ANNOTATION", "CAMPAIGN_CARD", "END_SCREEN", "EXT_URL",
    "HASHTAGS", "LIVE_REDIRECT", "NO_LINK_EMBEDDED", "NO_LINK_OTHER",
    "NOTIFICATION", "PLAYLIST", "PRODUCT_PAGE", "PROMOTED", "SHORTS",
    "SOUND_PAGE", "SUBSCRIBER", "VIDEO_REMIXES", "YT_CHANNEL",
    "YT_OTHER_PAGE", "YT_SEARCH", "YT_WATCH_PAGE", "UNKNOWN")
}
