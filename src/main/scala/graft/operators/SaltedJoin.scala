package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting — the manual counterpart of
  * AQE's skew-join split, for when the skew is known up front (one hot key
  * holding a double-digit share of a 100 TB fact) or AQE is unavailable
  * (streaming joins, non-adaptive plans).
  *
  * Shape: the skewed (big) side appends a salt `pmod(hash(whole row), S)`
  * to its join key, splitting each hot key's rows across S shuffle
  * partitions; the dimension (small) side is exploded ×S so every salted
  * key finds its match. Join output is row-identical to the unsalted join —
  * only the partitioning changes. Cost: the small side shuffles S copies,
  * which is why the technique applies to big⋈small joins; big⋈big skew
  * wants AQE's split instead (which this engine leaves on).
  */
object SaltedJoin {

  /** Inner/left equi-join of `big ⋈ small` on `key`, salted ×`saltFactor`.
    * Output columns = the unsalted `big.join(small, Seq(key), joinType)`. */
  def join(
      big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"salting preserves semantics for inner/left joins, got $joinType")
    // random salt, not a hash of the row: fully identical hot rows (event
    // logs without a unique id column) would all hash to ONE salt and the
    // hot partition would survive unsplit. The salt needs no
    // reproducibility — the small side matches every salt value — so task
    // retries re-rolling it cannot change the output.
    val saltedBig = big.withColumn("__salt",
      floor(rand() * saltFactor).cast("int"))
    val explodedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedBig.join(explodedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
