package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): candidate pairs come from an
  * equi-join on a cheap BLOCKING key, then an edit-distance predicate keeps
  * true fuzzy matches — the classic two-stage ER shape (never the O(n²)
  * cross product).
  *
  * 100 TB posture: the only shuffle is the hash join on the blocking key;
  * pair volume is Σ_block |block|² — bounded by the blocking function, not
  * the corpus. A skewed (hot) block is visible up front from the block
  * histogram ([[blockHistogram]]) and is handled like any hot join key:
  * refine the blocking function (add a second key column, e.g. a length
  * bucket) or salt the block. Levenshtein itself is a codegen'd built-in,
  * evaluated only on in-block pairs.
  */
object EntityResolution {

  /** Candidate pairs within each block with levenshtein(name_a, name_b) ≤
    * `maxDist`, ordered pairs (id_a < id_b). Input: (idCol, nameCol) plus a
    * blocking expression; output: (id_a, id_b, name_a, name_b, edit_dist).
    */
  def blockedLevenshteinPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val a = df.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      blockKey.as("block"))
    val b = df.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
      blockKey.as("block"))
    a.join(b, "block")
      .filter(col("id_a") < col("id_b"))
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("edit_dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"), col("edit_dist"))
  }

  /** Block-size histogram — the skew diagnostic run before the join. */
  def blockHistogram(df: DataFrame, blockKey: Column): DataFrame =
    df.groupBy(blockKey.as("block"))
      .agg(count(lit(1)).as("block_size"))
}
