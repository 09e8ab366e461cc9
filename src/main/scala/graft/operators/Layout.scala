package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout: Z-order (Morton) clustering.
  *
  * A table range-partitioned and sorted on ONE column prunes scans on that
  * column only — a filter on any other dimension reads every file. Sorting
  * by the interleaved-bit Morton code of two dimensions keeps BOTH
  * dimensions locally clustered: every run of consecutive rows spans a
  * small rectangle in (x, y) space, so each parquet row group's min/max
  * envelope is narrow on x AND y, and the reader's row-group statistics
  * pruning skips most of the file for a selective filter on either column.
  * This is the layout idea behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * re-expressed as a plain sort key any writer can use.
  *
  * The code is pure integer arithmetic over built-ins (shift/and/sum —
  * whole-stage codegen, no UDF), and deliberately engine-portable so an
  * external oracle can recompute codes bit-for-bit.
  */
object Layout {

  /** Morton (Z-order) code: interleaves the low `bits` bits of two
    * non-negative int columns, x in even positions, y in odd. Inputs are
    * masked to `bits` (callers bucket/clamp first — layout keys, not
    * values, so masking loses nothing a sort key needs). ≤ 31 bits per
    * dimension keeps the result in a positive long. */
  def mortonCode(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Cluster a frame for multi-dimensional scans: range-partition by the
    * Morton code of (x, y), sort within partitions by it. Writing the
    * result produces files AND row groups whose (x, y) envelopes are small
    * rectangles — statistics pruning then works for filters on either
    * dimension. `partitions` is the output file-count lever (at 100 TB:
    * total size / target file size). */
  def zorderBy(df: DataFrame, x: Column, y: Column, bits: Int = 16,
      partitions: Int = 0): DataFrame = {
    val code = mortonCode(x, y, bits)
    val ranged =
      if (partitions > 0) df.repartitionByRange(partitions, code)
      else df.repartitionByRange(code)
    ranged.sortWithinPartitions(code)
  }

  /** N-DIMENSIONAL Morton code: interleaves the low `bits` bits of K
    * non-negative columns — column j contributes its bit i at position
    * i*K + j, so K=2 reproduces [[mortonCode]] bit-for-bit. K·bits ≤ 62
    * keeps the result a positive long; at the default 3-4 cluster keys a
    * deployment actually uses, 12-15 bits per dimension remain — plenty,
    * since layout keys are bucketed/clamped ranks, not raw values. */
  def mortonCodeN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"need at least 2 dimensions, got ${cols.size}")
    require(bits >= 1 && cols.size * bits <= 62,
      s"${cols.size} dims x $bits bits exceeds a positive long (need K*bits <= 62)")
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _)
  }

  /** [[zorderBy]] for K dimensions: range-partition + in-partition sort by
    * the K-dim Morton code, so every file AND row group's envelope is a
    * small K-box — statistics pruning works for a selective filter on ANY
    * of the K columns. The per-dimension resolution shrinks as K grows
    * (62/K bits); 3-4 dims is the practical sweet spot, the same guidance
    * Delta/Iceberg give for ZORDER BY. */
  def zorderByN(df: DataFrame, cols: Seq[Column], bits: Int = 0,
      partitions: Int = 0): DataFrame = {
    val b = if (bits > 0) bits else math.min(16, 62 / cols.size)
    val code = mortonCodeN(cols, b)
    val ranged =
      if (partitions > 0) df.repartitionByRange(partitions, code)
      else df.repartitionByRange(code)
    ranged.sortWithinPartitions(code)
  }

  /** Hilbert-curve code for (x, y) on a 2^bits grid — the clustering key
    * table formats moved to AFTER Z-order: no diagonal jumps, so runs of
    * consecutive codes span tighter rectangles and row-group min/max
    * pruning skips more (measured vs Morton in LayoutSpec). Native codegen
    * expression ([[graft.sql.HilbertIndex]]) because the per-level
    * rotation is stateful — a Column composition would nest ~4× per bit. */
  def hilbertCode(x: Column, y: Column, bits: Int = 16): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.sql.HilbertIndex(
        org.apache.spark.sql.graft.ColumnShim.expression(x.cast("long")),
        org.apache.spark.sql.graft.ColumnShim.expression(y.cast("long")),
        bits))

  /** [[zorderBy]] with the Hilbert key: range-partition + in-partition sort
    * by the curve position. Same file-count lever, tighter envelopes. */
  def hilbertBy(df: DataFrame, x: Column, y: Column, bits: Int = 16,
      partitions: Int = 0): DataFrame = {
    val code = hilbertCode(x, y, bits)
    val ranged =
      if (partitions > 0) df.repartitionByRange(partitions, code)
      else df.repartitionByRange(code)
    ranged.sortWithinPartitions(code)
  }

  /** Materialize `df` as a BUCKETED + sorted catalog table at `path` and
    * return it re-read through the catalog (bucket metadata only survives
    * `saveAsTable`). Standalone sibling of `Lakehouse.materializeBucketed`
    * for frames outside the medallion layers.
    *
    * This is THE shuffle-elimination layout for 100 TB fact-to-fact joins:
    * hash-partition both sides into the same `buckets` on the join key once
    * at write time, and every subsequent equi-join or aggregation on that
    * key skips its Exchange entirely — Spark's `SortMergeJoin` consumes the
    * bucketed scans directly (`PlanAuditSpec` pins the Exchange-free plan).
    * One-time write cost amortizes across every downstream query; the
    * alternative — shuffling both fact tables per query — is the single
    * largest recurring cost in a star-join warehouse. */
  def bucketedTable(
      spark: org.apache.spark.sql.SparkSession, df: DataFrame, name: String,
      keyCols: Seq[String], buckets: Int, path: String): DataFrame = {
    require(keyCols.nonEmpty, "bucketedTable needs at least one key column")
    df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .option("path", path)
      .saveAsTable(name)
    spark.table(name)
  }
}
