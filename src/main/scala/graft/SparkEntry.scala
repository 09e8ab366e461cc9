package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, ClusterQueries, CurationQueries, DedupQueries, Extended, GraftQuery, MultimodalQueries, Relational, SimilarityQueries, StorageQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 inventory +
  * large-scale training-data extensions); `oracleSql` carries the DuckDB
  * equivalent for the driver's hash-match correctness gate.
  */
object SparkEntry {

  /** All registered operator queries. */
  def registry: Seq[GraftQuery] =
    Relational.all ++ Extended.all ++ Advanced.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
      CurationQueries.all ++ ClusterQueries.all ++ StorageQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
