package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO (upsert) semantics without a transactional table format —
  * the lakehouse write primitive the reference gets from Delta
  * (`MERGE INTO silver ... WHEN MATCHED UPDATE ... WHEN NOT MATCHED
  * INSERT`), re-expressed as a pure DataFrame transform the caller writes
  * back atomically (write-new-then-swap, as `Lakehouse` does).
  *
  * 100 TB posture: one full-outer hash join on the merge key — the same
  * shuffle a format-native MERGE performs for its matched-row scan. When
  * the source batch is small relative to the target (the common CDC case)
  * the anti-join + union plan in [[upsertSmallSource]] touches the target
  * once and BROADCASTS the source twice — no target shuffle at all, which
  * is the plan to prefer for daily increments into a 100 TB table (combine
  * with partition pruning so only affected partitions rewrite).
  */
object Merge {

  /** Full-outer upsert: rows present in `source` replace the matching
    * `target` rows column-by-column (source wins on every shared non-key
    * column); source-only keys are inserted; target-only rows pass through.
    * `source` must be unique per key (pre-deduped — enforce with a
    * latest-wins window upstream, as q50 does). */
  def upsert(target: DataFrame, source: DataFrame, keyCol: String): DataFrame = {
    val dataCols = target.columns.filter(_ != keyCol)
    require(source.columns.toSet == target.columns.toSet,
      s"source/target schemas differ: ${source.columns.toSeq} vs ${target.columns.toSeq}")
    val t = dataCols.foldLeft(target)((d, c) => d.withColumnRenamed(c, s"t_$c"))
    val s = dataCols.foldLeft(source)((d, c) => d.withColumnRenamed(c, s"s_$c"))
      .withColumn("s_present", lit(true))
    t.join(s, Seq(keyCol), "full_outer")
      .select(col(keyCol) +: dataCols.map(c =>
        when(col("s_present"), col(s"s_$c")).otherwise(col(s"t_$c")).as(c)): _*)
  }

  /** Same result for a SMALL source: target-side anti-join (broadcast
    * source) ∪ source — the target is never shuffled. Row-identical to
    * [[upsert]] when every source row's columns are non-null; spec-checked. */
  def upsertSmallSource(target: DataFrame, source: DataFrame, keyCol: String): DataFrame = {
    require(source.columns.toSet == target.columns.toSet,
      s"source/target schemas differ: ${source.columns.toSeq} vs ${target.columns.toSeq}")
    val cols = target.columns.map(col)
    target.join(broadcast(source.select(col(keyCol))), Seq(keyCol), "left_anti")
      .select(cols: _*)
      .unionByName(source.select(cols: _*))
  }
}
