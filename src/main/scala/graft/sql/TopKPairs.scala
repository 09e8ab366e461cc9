package graft.sql

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Bounded top-k aggregate: keeps the k highest-scoring (score, id) pairs
  * per group in a size-k min-heap — a `TypedImperativeAggregate`, so it
  * PARTIAL-aggregates: each map task ships at most k pairs per group to the
  * shuffle, where the window-function top-k idiom (`row_number() OVER ... <=
  * k`) must shuffle EVERY input row to its key's partition first. For
  * top-k-neighbors over a large corpus that is the difference between a
  * shuffle linear in corpus size and one linear in k × partitions.
  *
  * Deterministic under score ties: the heap evicts (lowest score, then
  * LARGEST id) first, and the output sorts (score desc, id asc) — exactly
  * the window idiom's `ORDER BY score DESC, id ASC` tie-break, so results
  * match `row_number` filtering row for row. All score comparisons use the
  * `Double.compare` total order (NaN greatest — Spark's own sort order), so
  * NaN scores rank first instead of poisoning the heap. Null scores are
  * SKIPPED — one deliberate divergence from the window spelling, which
  * would emit null-score rows at ranks ≤ k whenever a group has fewer than
  * k non-null scores (a zero-norm embedding makes `cosine` null via
  * divide-by-zero): top-k-neighbors semantics want those rows absent.
  *
  * Output: `array<struct<score double, id bigint>>`, sorted best-first.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def checkInputDataTypes(): TypeCheckResult = (score.dataType, id.dataType) match {
    case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (s, i) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint), got ${s.catalogString}, ${i.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  // min-heap: head = worst = (lowest score, largest id) — evicted first.
  // Double.compare everywhere: the IEEE `>` operator makes NaN compare
  // false against everything, so a NaN entering a full heap would sit at
  // the head and reject every later insert (heap poisoning). Double.compare
  // is the total order Spark's own sort uses (NaN greatest), so NaN scores
  // rank FIRST — exactly the window idiom's ORDER BY score DESC.
  private def heapOrdering: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(x._1, y._1) // lower score = higher priority
      if (c != 0) -c else java.lang.Long.compare(x._2, y._2) // then larger id first
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => insert(buf, s, i) }
    buf
  }

  private def insert(buf: mutable.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      // strictly better than the current worst? (higher score, or same
      // score with smaller id) — total-order compare, see heapOrdering
      val c = java.lang.Double.compare(s, ws)
      if (c > 0 || (c == 0 && i < wi)) {
        buf.dequeue()
        buf.enqueue((s, i))
      }
    }
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending by heapOrdering = best-first (better elements compare less)
    val sorted = buf.toArray.sorted(heapOrdering)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
}
