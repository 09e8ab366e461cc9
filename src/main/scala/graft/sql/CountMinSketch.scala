package graft.sql

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–min sketch (Cormode & Muthukrishnan 2005): `depth` rows of
  * `width` counters; item x increments one counter per row at position
  * h_i(x), and estimate(x) = min_i counter[i][h_i(x)].
  *
  * Guarantees over N total items, deterministic given the fixed hash
  * family (no RNG — the affine permutations from [[Defaults]], which an
  * external SQL oracle restates verbatim):
  *   - estimate(x) ≥ f(x) always (counters only ever add);
  *   - the overcount is exactly the collision mass
  *     min_i Σ_{y≠x, h_i(y)=h_i(x)} f(y) — a pure function of the exact
  *     frequency table, so the oracle reproduces the ESTIMATES bit-for-bit,
  *     not just a bound.
  *
  * Merge is elementwise vector addition — commutative and associative, so
  * the sketch is identical under ANY merge tree / partitioning, which is
  * both the 100 TB contract (map-side partials, one depth×width long array
  * per task to the shuffle, vs shuffling every token occurrence for an
  * exact count) and what makes the aggregate oracle-checkable at all.
  *
  * Complement to [[MisraGries]] in the sketch family: MG answers "which
  * items are heavy" (top-k set, underestimates), CMS answers point
  * frequency queries for ANY item (overestimates), in width·depth longs.
  *
  * Item hashing: portable polynomial hash of the string (fold
  * acc·31 + charcode mod 1e9+7 — the [[Defaults.P]] family), then row i
  * buckets at ((A_i·h + B_i) mod P) mod width.
  *
  * Output: array<bigint> of depth·width counters, row-major.
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= Defaults.MinhashA.length,
    s"depth must be in [1, ${Defaults.MinhashA.length}], got $depth")
  require(width >= 2, s"width must be >= 2, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var h = 0L
      var j = 0
      while (j < s.length) {
        h = (h * 31L + s.charAt(j).toInt) % Defaults.P
        j += 1
      }
      var i = 0
      while (i < depth) {
        val b = ((Defaults.MinhashA(i) * h + Defaults.MinhashB(i)) % Defaults.P % width).toInt
        buf(i * width + b) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinSketch =
    copy(child = newChildren(0))
}
