package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table access for the graft engine.
  *
  * Design notes (100 TB posture): the session pins UTC (the reference pins
  * UTC semantics in data — reference `job_tasks/bronze/init_run_context.py:76,94`),
  * enables AQE for runtime re-planning (skew joins, shuffle coalescing), and
  * keeps `spark.sql.shuffle.partitions` sized to the local core count — on a
  * real cluster this would be set to ~2-3x total executor cores or left to AQE
  * via `spark.sql.adaptive.coalescePartitions`.
  */
object Graft {

  def session(appName: String = "graft", master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); Spark 4 rejects it unless
      // read as a long — eventsTable() converts back to TimestampType.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Write timestamps as µs, not INT96: the SCD2 open-ended sentinel
      // 9999-12-31 23:59:59.999999 overflows int64 *nanoseconds*, so arrow-based
      // readers of INT96 parquet wrap it to 1816 — µs encoding round-trips it
      // exactly through every reader.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Read one of the driver-provided parquet tables under `sfDir`.
    * Plain `spark.read.parquet` so Catalyst pushes filters + prunes columns
    * into the scan (verify with `.explain`: PushedFilters / ReadSchema).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") eventsTable(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` stores `ts` as TIMESTAMP(NANOS); with nanosAsLong it
    * arrives as nanos-since-epoch BIGINT. Convert to TimestampType by
    * truncating to micros (floor division — identical to DuckDB's ns→µs cast)
    * so both engines see the same microsecond values.
    */
  def eventsTable(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
