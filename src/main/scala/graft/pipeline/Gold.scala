package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold layer: the five dbt models re-expressed as DataFrame functions
  * (reference `dbt model SQL files` — each ≤16 lines of SQL). Fact-side scans
  * dominate; the video/dim lookups are broadcast (silver_videos and the
  * dims are small relative to facts at any scale; if silver_videos grows
  * past broadcast size the hint drops out and AQE picks a shuffle join).
  */
object Gold {

  final case class Model(name: String, deps: Seq[String], build: Lakehouse => DataFrame)

  /** reference `dbt/models/gold_channel_daily_summary.sql`:
    * net_subscribers = gained − lost. */
  val channelDailySummary: Model = Model("gold_channel_daily_summary",
    Seq("fact_channel_daily_metrics"), lake =>
      lake.table("silver", "fact_channel_daily_metrics")
        .select(
          col("channel_id"), col("date"), col("views"), col("likes"), col("comments"),
          col("estimated_minutes_watched"), col("subscribers_gained"), col("subscribers_lost"),
          (col("subscribers_gained") - col("subscribers_lost")).as("net_subscribers"),
          col("snapshot_date"), col("ingest_ts_utc")))

  /** reference `dbt/models/gold_video_daily_summary.sql`. */
  val videoDailySummary: Model = Model("gold_video_daily_summary",
    Seq("fact_video_daily_metrics", "silver_videos"), lake => {
      val f = lake.table("silver", "fact_video_daily_metrics")
      val v = lake.table("silver", "silver_videos").select(col("video_id"), col("channel_id"))
      f.join(broadcast(v), Seq("video_id"), "left")
        .select(
          col("video_id"), col("channel_id"), col("date"), col("views"), col("likes"),
          col("comments"), col("estimated_minutes_watched"),
          col("average_view_duration_seconds"), col("snapshot_date"), col("ingest_ts_utc"))
    })

  /** Shared star shape of the three per-dimension summaries
    * (reference `dbt/models/gold_video_{country,device,traffic_source}_daily_summary.sql`):
    * fact LEFT JOIN silver_videos LEFT JOIN dim, estimated_minutes_watched
    * coalesced to 0. */
  private def dimensionalSummary(
      factTable: String, dimTable: String, dimKey: String, dimName: String): Lakehouse => DataFrame =
    lake => {
      val f = lake.table("silver", factTable)
      val v = lake.table("silver", "silver_videos").select(col("video_id"), col("channel_id"))
      val d = lake.table("silver", dimTable).select(col(dimKey), col(dimName))
      f.join(broadcast(v), Seq("video_id"), "left")
        .join(broadcast(d), Seq(dimKey), "left")
        .select(
          col("video_id"), col("channel_id"), col("date"), col(dimKey), col(dimName),
          col("views"),
          coalesce(col("estimated_minutes_watched"), lit(0L)).as("estimated_minutes_watched"),
          col("snapshot_date"), col("ingest_ts_utc"))
    }

  val videoCountryDailySummary: Model = Model("gold_video_country_daily_summary",
    Seq("fact_video_country_metrics", "silver_videos", "dim_country"),
    dimensionalSummary("fact_video_country_metrics", "dim_country", "country_code", "country_name"))

  val videoDeviceDailySummary: Model = Model("gold_video_device_daily_summary",
    Seq("fact_video_device_metrics", "silver_videos", "dim_device"),
    dimensionalSummary("fact_video_device_metrics", "dim_device", "device_type", "device_name"))

  val videoTrafficSourceDailySummary: Model = Model("gold_video_traffic_source_daily_summary",
    Seq("fact_video_traffic_source_metrics", "silver_videos", "dim_traffic_source"),
    dimensionalSummary("fact_video_traffic_source_metrics", "dim_traffic_source", "source_id", "source_name"))

  val models: Seq[Model] = Seq(
    channelDailySummary, videoDailySummary, videoCountryDailySummary,
    videoDeviceDailySummary, videoTrafficSourceDailySummary)

  /** Materialize all gold models (silver must be refreshed first). */
  def refresh(lake: Lakehouse): Seq[String] = {
    models.foreach(m => lake.materialize("gold", m.name, m.build(lake)))
    models.map(_.name)
  }
}
