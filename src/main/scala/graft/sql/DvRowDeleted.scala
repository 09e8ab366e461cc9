package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector membership test over a parquet scan's metadata columns:
  * `DvRowDeleted(_metadata.file_path, _metadata.row_index)` is true iff the
  * row's physical position is in its file's deletion vector. Reads over
  * DV-carrying tables filter on the NEGATION — the merge-on-read subtract
  * (Delta's deletion-vector scan filter;
  * [[graft.pipeline.Lakehouse]] wires it in `readEntriesWithDv`).
  *
  * The vector map (data-file relPath → sorted deleted positions) is a
  * plan-embedded reference object: it ships once per task with the
  * serialized plan, sized O(deleted rows in the scanned files) — bounded by
  * the OPTIMIZE purge discipline, not by table history. Per row the work is
  * one cached key resolve + one binary search, inside whole-stage codegen
  * (a static call, same shape as [[FloatVecDot]]); the file-path → relPath
  * key derivation (last two path segments) is computed once per distinct
  * path per thread, not per row, because a parquet scan delivers rows
  * file-contiguously.
  */
case class DvRowDeleted(left: Expression, right: Expression,
    dv: Map[String, Array[Long]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string file_path, long row_index), got " +
        s"${l.catalogString}, ${r.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_row_deleted"

  @transient private lazy val javaMap: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]](dv.size * 2)
    dv.foreach { case (k, v) => m.put(k, v) }
    m
  }

  override def nullSafeEval(path: Any, idx: Any): Any =
    DvRowDeleted.deleted(javaMap, path.asInstanceOf[UTF8String],
      idx.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("dvMap", javaMap,
      classOf[java.util.HashMap[String, Array[Long]]].getName)
    nullSafeCodeGen(ctx, ev, (p, i) =>
      s"${ev.value} = graft.sql.DvRowDeleted.deleted($mapRef, $p, $i);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvRowDeleted =
    copy(left = newLeft, right = newRight)
}

object DvRowDeleted {

  // (owning vector map, last seen file path, its resolved vector) — rows
  // arrive file-contiguously from a parquet scan, so one entry per thread
  // makes the key derivation amortized O(1) per file, not per row. The
  // cache MUST be keyed on the map identity as well as the path: executor
  // threads outlive queries, and two scans of the same file under
  // different table versions carry different vectors for the same path —
  // a path-only key would silently reuse the older vector.
  //
  // Both the map and the resolved vector are held WEAKLY: executor threads
  // are pooled and outlive queries, so a strong ThreadLocal reference would
  // pin the last query's O(deleted rows) vector map until the next
  // DV-filtered scan happens to land on the same thread. During a scan the
  // map is strongly reachable from the running plan (and the map holds its
  // vectors), so the weak refs can never clear mid-query — they clear
  // exactly when the plan is gone and the memory is garbage.
  private val lastFile = new ThreadLocal[(
    java.lang.ref.WeakReference[java.util.HashMap[String, Array[Long]]],
    UTF8String, java.lang.ref.WeakReference[Array[Long]])]

  private val Empty = Array.emptyLongArray

  /** relPath key = the last two path segments of the scan's file path
    * (append-dir/file-name), matching the manifest's relPath convention. */
  def relPathKey(path: String): String = {
    val i2 = path.lastIndexOf('/')
    if (i2 < 0) return path
    val i1 = path.lastIndexOf('/', i2 - 1)
    path.substring(i1 + 1)
  }

  def deleted(map: java.util.HashMap[String, Array[Long]],
      path: UTF8String, idx: Long): Boolean = {
    val e = lastFile.get()
    var arr: Array[Long] =
      if (e != null && (e._1.get() eq map) && e._2.equals(path)) e._3.get()
      else null
    if (arr == null) {
      val a = map.get(relPathKey(path.toString))
      arr = if (a == null) Empty else a
      lastFile.set((new java.lang.ref.WeakReference(map), path.clone(),
        new java.lang.ref.WeakReference(arr)))
    }
    java.util.Arrays.binarySearch(arr, idx) >= 0
  }
}
