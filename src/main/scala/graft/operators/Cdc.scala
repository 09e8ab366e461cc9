package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot change-data-capture: diff two snapshots of a keyed table into
  * the change rows a transactional format's change feed would emit (the
  * reference gets this from Delta CDF; here it is derived from the
  * snapshots themselves, which also works between ANY two materialized
  * versions of a table — e.g. yesterday's and today's silver layer).
  *
  * Change vocabulary follows the Delta CDF convention:
  * `insert` (key only in the new snapshot), `delete` (key only in the old),
  * `update_preimage` + `update_postimage` (key in both, any non-key column
  * differs). Unchanged rows emit nothing, so downstream consumers process
  * only the delta.
  *
  * 100 TB posture: ONE full-outer hash join on the key — the same shuffle
  * MERGE does — and change detection is a per-row struct comparison (null-
  * safe `<=>`), no second pass. If both snapshots are bucketed on the key
  * ([[Layout.bucketedTable]]) the join plans with no exchange at all; with
  * date-partitioned tables, partition pruning restricts the diff to
  * affected partitions. The pre/post split is a generator-free
  * `explode(array(...))` over the matched rows — map-side, no extra
  * shuffle.
  */
object Cdc {

  /** Change rows between `oldSnap` and `newSnap` (same schema, unique per
    * `keyCol`): (key, all data columns, change_type). Update rows emit the
    * preimage (old values) and postimage (new values) as separate rows. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String): DataFrame = {
    require(oldSnap.columns.toSet == newSnap.columns.toSet,
      s"snapshot schemas differ: ${oldSnap.columns.toSeq} vs ${newSnap.columns.toSeq}")
    val dataCols = oldSnap.columns.filter(_ != keyCol).toSeq
    val o = dataCols.foldLeft(oldSnap)((d, c) => d.withColumnRenamed(c, s"o_$c"))
      .withColumn("o_present", lit(true))
    val n = dataCols.foldLeft(newSnap)((d, c) => d.withColumnRenamed(c, s"n_$c"))
      .withColumn("n_present", lit(true))
    val joined = o.join(n, Seq(keyCol), "full_outer")
    val changed = dataCols
      .map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))

    val oldRow = struct(dataCols.map(c => col(s"o_$c").as(c)) :+
      lit("update_preimage").as("change_type"): _*)
    val newRow = struct(dataCols.map(c => col(s"n_$c").as(c)) :+
      lit("update_postimage").as("change_type"): _*)

    val images = joined
      .filter(col("o_present").isNull || col("n_present").isNull || changed)
      .select(
        col(keyCol),
        explode(
          when(col("o_present").isNull,
            array(struct(dataCols.map(c => col(s"n_$c").as(c)) :+
              lit("insert").as("change_type"): _*)))
          .when(col("n_present").isNull,
            array(struct(dataCols.map(c => col(s"o_$c").as(c)) :+
              lit("delete").as("change_type"): _*)))
          .otherwise(array(oldRow, newRow))
        ).as("chg"))
    images.select(col(keyCol) +: dataCols.map(c => col(s"chg.$c").as(c))
      :+ col("chg.change_type").as("change_type"): _*)
  }

  /** Incremental view maintenance for distributive COUNT/SUM group-bys:
    * apply [[snapshotDiff]] change rows to the MATERIALIZED aggregate —
    * the base table is never rescanned. insert/update_postimage rows
    * contribute +1, delete/update_preimage −1; a group-key update migrates
    * mass between groups naturally (preimage subtracts from the old group,
    * postimage adds to the new one). Groups whose count reaches 0 drop out.
    *
    * 100 TB posture: the nightly delta aggregates to ≤ one row per TOUCHED
    * group, then ONE outer join against the standing aggregate — for a
    * small delta that is a broadcast join against a table that is itself
    * tiny relative to the base. This is the update path that turns a
    * full-scan refresh (minutes over 100 TB) into seconds over the delta;
    * the correctness algebra is oracle-proven (q58's oracle recomputes the
    * aggregate from scratch and must hash-match the incremental result). */
  def incrementAggregate(agg: DataFrame, changes: DataFrame, keyCol: String,
      valueCol: String, cntCol: String, sumCol: String): DataFrame = {
    val sign = when(col("change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("change_type").isin("delete", "update_preimage"), lit(-1L))
      .otherwise(raise_error(concat(lit("unknown change_type: "), col("change_type")))
        .cast("bigint"))
    val delta = changes.groupBy(col(keyCol))
      .agg(sum(sign).as("__dn"), sum(sign * col(valueCol)).as("__ds"))
    agg.join(delta, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col(cntCol), lit(0L)) + coalesce(col("__dn"), lit(0L))).as(cntCol),
        (coalesce(col(sumCol), lit(0)) + coalesce(col("__ds"), lit(0))).as(sumCol))
      .filter(col(cntCol) > 0)
  }
}
