package graft.sql

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of an `array<float>` column as `array<double>` — the
  * centroid-recomputation kernel for distributed k-means (Lloyd step).
  *
  * A `TypedImperativeAggregate`, so it PARTIAL-aggregates: each map task
  * ships ONE dim-length double vector per group to the shuffle. The
  * alternative spelling (`posexplode` → groupBy(group, pos) → sum →
  * re-assemble) multiplies shuffle rows by the embedding dimension and adds
  * a second shuffle to re-collect positions into an array; this kernel is
  * the difference between shuffling k·dim doubles per map task and
  * shuffling every element of every vector.
  *
  * Null handling: null arrays and arrays containing a null element are
  * SKIPPED (they contribute nothing — the matching row count for a mean
  * must therefore count the same predicate). A length mismatch against the
  * first vector seen is an error: silently zero-padding would corrupt
  * centroids. Empty-group eval returns null.
  */
case class FloatVecSumAgg(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_sum"

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // empty buffer sentinel: zero-length array (no vector seen yet)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = vec.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) { // null element => skip the whole row (partial vectors lie)
      if (a.isNullAt(i)) return buf
      i += 1
    }
    val acc = if (buf.length == 0) new Array[Double](n) else buf
    require(acc.length == n,
      s"$prettyName: vector length $n != ${acc.length} seen earlier in the group")
    i = 0
    while (i < n) { acc(i) += a.getFloat(i).toDouble; i += 1 }
    acc
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.length == 0) return buf
    if (buf.length == 0) return other
    require(buf.length == other.length,
      s"$prettyName: merging vector sums of length ${other.length} and ${buf.length}")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null
    else new GenericArrayData(buf.clone()) // Array[Double] overload: no boxing

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeDouble(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FloatVecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FloatVecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FloatVecSumAgg =
    copy(vec = newChildren(0))
}
