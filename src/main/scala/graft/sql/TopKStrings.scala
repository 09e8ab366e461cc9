package graft.sql

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** [[TopKPairs]] for string keys: keeps the k highest-scoring (score, key)
  * pairs per group in a size-k min-heap — partial-aggregating, so each map
  * task ships at most k pairs per group to the shuffle where the window
  * idiom (`row_number() OVER ... <= k`) shuffles EVERY input row first.
  *
  * Tie-break mirrors `ORDER BY score DESC, key ASC` with binary (UTF-8
  * byte-wise) key comparison — identical to codepoint order, which is what
  * both Spark's and DuckDB's default string ordering produce on these keys —
  * so results match the window plan row for row. Score comparisons use the
  * `Double.compare` total order (NaN greatest, like Spark's sort), so NaN
  * cannot poison the heap or break the output sort. Null scores/keys are
  * skipped (see TopKPairs for the fewer-than-k-non-null caveat).
  *
  * Output: `array<struct<score double, key string>>`, sorted best-first.
  */
case class TopKStrings(
    score: Expression,
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, UTF8String)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, key)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_strings"

  override def checkInputDataTypes(): TypeCheckResult = (score.dataType, key.dataType) match {
    case (DoubleType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (s, i) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, string), got ${s.catalogString}, ${i.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("key", StringType, nullable = false))),
    containsNull = false)

  // min-heap: head = worst = (lowest score, largest key) — evicted first.
  // Double.compare total order throughout (NaN greatest): an IEEE `>` gate
  // would let one NaN at the head reject every later insert.
  private def heapOrdering: Ordering[(Double, UTF8String)] = new Ordering[(Double, UTF8String)] {
    def compare(x: (Double, UTF8String), y: (Double, UTF8String)): Int = {
      val c = java.lang.Double.compare(y._1, x._1) // lower score = higher priority
      if (c != 0) c else x._2.compareTo(y._2)      // then larger key first
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, UTF8String)] =
    mutable.PriorityQueue.empty(heapOrdering)

  override def update(
      buf: mutable.PriorityQueue[(Double, UTF8String)],
      input: InternalRow): mutable.PriorityQueue[(Double, UTF8String)] = {
    val s = score.eval(input)
    if (s != null) {
      val v = key.eval(input)
      // clone: the evaluated UTF8String may point into a reused row buffer
      if (v != null) insert(buf, s.asInstanceOf[Double], v.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, UTF8String)],
      other: mutable.PriorityQueue[(Double, UTF8String)]): mutable.PriorityQueue[(Double, UTF8String)] = {
    other.foreach { case (s, v) => insert(buf, s, v) }
    buf
  }

  private def insert(buf: mutable.PriorityQueue[(Double, UTF8String)], s: Double, v: UTF8String): Unit = {
    if (buf.size < k) buf.enqueue((s, v))
    else {
      val (ws, wv) = buf.head
      // strictly better than the current worst? (higher score, or same
      // score with smaller key) — total-order compare, see heapOrdering
      val c = java.lang.Double.compare(s, ws)
      if (c > 0 || (c == 0 && v.compareTo(wv) < 0)) {
        buf.dequeue()
        buf.enqueue((s, v))
      }
    }
  }

  override def eval(buf: mutable.PriorityQueue[(Double, UTF8String)]): Any = {
    // ascending by heapOrdering = best-first (better elements compare
    // less); a total order even with NaN present (sortWith on IEEE `>`
    // would violate transitivity and TimSort throws on non-total
    // comparators)
    val sorted = buf.toArray.sorted(heapOrdering)
    new GenericArrayData(sorted.map { case (s, v) =>
      InternalRow(s, v)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, v) =>
      out.writeDouble(s)
      val bytes = v.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.enqueue((s, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStrings =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStrings =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKStrings =
    copy(score = newChildren(0), key = newChildren(1))
}
