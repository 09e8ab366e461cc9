package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark-side plan plus (when SQL-expressible)
  * an equivalent DuckDB oracle statement over the same parquet tables.
  *
  * Cross-engine determinism rules every query here follows:
  *   - every output column is explicitly aliased identically on both sides;
  *   - a total ORDER BY (ending in a unique key) on both sides;
  *   - money aggregates go through DECIMAL(18,2) (exact) and only the final
  *     result is cast to DOUBLE — float summation order never matters;
  *   - integer sums are CAST(... AS BIGINT) on the DuckDB side (DuckDB SUM on
  *     integers returns HUGEINT, Spark returns LONG);
  *   - nullable sort keys use explicit NULLS FIRST in the oracle (DuckDB
  *     defaults to NULLS LAST on ASC, Spark to NULLS FIRST).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** queries worth timing at sf0.1 in Bench */
    bench: Boolean = false,
    /** Bench-only variant that probes AT-REST index structures (PQ codes,
      * IVF layout) instead of rebuilding them per run. A deployment builds
      * such structures once at write time and amortizes them across every
      * query — timing the one-time build inside each probe would measure
      * the wrong thing. `run` (what the oracle checks) always includes the
      * full build so correctness still covers it; Bench prefers this when
      * present. The String argument is the sf dir (build artifacts are
      * cached per sf under java.io.tmpdir). */
    benchRun: Option[(SparkSession, String) => DataFrame] = None)

object GraftQuery {
  /** Convenience: register the driver-provided parquet tables as temp views so
    * query bodies can be written in spark.sql where that is clearest. */
  def views(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach { n =>
      graft.Graft.readParquet(spark, s"$dir/$n.parquet").createOrReplaceTempView(n)
    }
}
