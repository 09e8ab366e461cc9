package graft.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.util.sketch.BloomFilter

/** Spark's runtime-filter bloom machinery surfaced as library operators.
  *
  * `InjectRuntimeFilter` builds exactly this pair of expressions —
  * [[BloomFilterAggregate]] on the build side, [[BloomFilterMightContain]]
  * probing a scalar subquery on the stream side — when it decides a join
  * deserves a bloom runtime filter. Neither is SQL-registered in a stock
  * session, so the library exposes them as Columns: the aggregate
  * partial-aggregates (each task ORs its k-bit slice; the merged sketch is
  * a few MB for 10⁶ items), and the probe side pays one broadcast of the
  * sketch instead of a shuffle of the probe stream.
  *
  * Determinism: a bloom filter is an OR of bit positions — insertion order
  * and merge tree are irrelevant — and Spark's sketch seeds its hash
  * statically, so `mightContain` results are a pure function of (item set,
  * sketch size). No false negatives, ever; false-positive rate is the
  * sized-for `fpp`.
  */
object Bloom {

  /** Bloom-filter aggregate over a LONG column (pre-hash strings with
    * `xxhash64`, as Spark's own runtime filter does). `expectedItems` and
    * `fpp` size the sketch: bits = n·ln(fpp)/ln(2)² via the standard
    * formula (`BloomFilter.optimalNumOfBits`). Returns the serialized
    * sketch as one BINARY value. */
  def bloomFilterAgg(h: Column, expectedItems: Long, fpp: Double = 0.03): Column = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need expectedItems > 0 and fpp in (0,1), got $expectedItems, $fpp")
    val bits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    ColumnShim.column(new BloomFilterAggregate(
      ColumnShim.expression(h), Literal(expectedItems), Literal(bits))
      .toAggregateExpression())
  }

  /** Probe: `sketch` must be a scalar (one-row) BINARY column — pass
    * `sketchDf.scalar()` so the sketch plan rides along as a scalar
    * subquery, exactly the shape `InjectRuntimeFilter` emits. */
  def mightContain(sketch: Column, h: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      ColumnShim.expression(sketch), ColumnShim.expression(h)))
}
