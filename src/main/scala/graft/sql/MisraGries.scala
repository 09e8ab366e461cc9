package graft.sql

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012): at most `k` counters
  * over a string stream, O(k) memory regardless of stream length.
  *
  * Guarantees, for true frequency f(x) over N total items — and these hold
  * under ANY merge tree, so partial aggregation across 1000 executors gives
  * the same bounds as a single pass:
  *   - estimate(x) ∈ [f(x) − N/(k+1), f(x)]  (never overcounts);
  *   - every x with f(x) > N/(k+1) is present in the summary.
  * Both properties are deterministic (no hashing, no randomness), which is
  * what lets an external oracle check the sketch: the heavy-hitter set and
  * the estimate bounds are decidable from exact counts alone.
  *
  * The scale story is the plan shape: `explode(tokens) → MG-aggregate`
  * partial-aggregates on the map side, so each task ships ONE k-entry map
  * to the shuffle — where the exact `explode → groupBy(token)` spelling
  * shuffles every token occurrence in the corpus to count them all, then
  * throws away everything below the bar.
  *
  * Update is the classic decrement-all-when-full (amortized O(1): each
  * decrement round pays off k prior inserts); merge sums counters then
  * subtracts the (k+1)-th largest count from all, keeping positives — the
  * PODS 2012 rule that preserves the error bound additively.
  *
  * Output: map<string, bigint> of surviving counters (estimate lower bounds).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k =>
          // clone: the UTF8String may point into a reused row buffer
          buf.update(key.clone(), 1L)
        case None =>
          // full and unseen: decrement every counter, drop zeros (the new
          // item's own +1 and −1 cancel — it is not inserted)
          decrementAll(buf, 1L)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, keep positives:
      // at most k survive and each estimate drops by ≤ that count, which the
      // mergeable-summaries bound absorbs
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(counts.length - (k + 1)))
    }
    buf
  }

  private def decrementAll(buf: mutable.HashMap[UTF8String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    buf.foreach { case (key, c) =>
      if (c - by <= 0) dead += key else buf.update(key, c - by)
    }
    dead.foreach(buf.remove)
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray
    ArrayBasedMapData(entries.map(_._1), entries.map(_._2))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0))
}
