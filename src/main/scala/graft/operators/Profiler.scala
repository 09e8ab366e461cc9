package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the ANALYZE/summary surface a lakehouse
  * needs for freshness checks, CBO statistics, and data-quality gates
  * (the reference runs assertion queries per table after every load;
  * this is that shape generalized to any column list).
  *
  * ONE aggregation over the table computes every column's stats; the
  * result unpivots to a tall (column, stats…) frame via `stack`. Counts
  * partial-aggregate map-side. `countDistinct` is exact — it plans an
  * Expand (one stream per profiled column); at 100 TB swap in
  * `approx_count_distinct` (same call shape, single stream, HLL ±2%) the
  * way c11 documents its approx_percentile swap-in. min/max are cast to
  * string so heterogeneous column types share one output schema.
  */
object Profiler {

  /** Profile `cols` of `df`: (column, n_rows, n_nonnull, n_distinct,
    * min_str, max_str), one row per profiled column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(c.matches("[A-Za-z0-9_]+"), s"unsafe column name: $c"))
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols
      .map(c => s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c")
      .mkString(", ")
    one.select(
      expr(s"stack(${cols.size}, $stacked) AS (column, n_nonnull, n_distinct, min_str, max_str)"),
      col("__n").as("n_rows"))
      .select(col("column"), col("n_rows"), col("n_nonnull"), col("n_distinct"),
        col("min_str"), col("max_str"))
  }
}
