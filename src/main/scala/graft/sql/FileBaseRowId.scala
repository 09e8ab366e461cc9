package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-file BASE ROW ID lookup over a parquet scan's `_metadata.file_path`:
  * a row's stable logical id is `FileBaseRowId(file_path) +
  * _metadata.row_index` for files whose base rides the log
  * ([[graft.pipeline.Lakehouse]] row tracking — Delta's `baseRowId`).
  * Files rewritten by OPTIMIZE/DELETE carry the ids as a physical column
  * instead and never reach this expression.
  *
  * Same execution shape as [[DvRowDeleted]]: the relPath→base map is a
  * plan-embedded reference object (O(live files), shipped once per task),
  * per row one cached key resolve + one hash lookup inside whole-stage
  * codegen; the file-path → relPath key derivation is computed once per
  * distinct path per thread because a parquet scan delivers rows
  * file-contiguously. A path absent from the map yields NULL (callers
  * treat it as a read-set/manifest mismatch, never a silent id).
  */
case class FileBaseRowId(child: Expression, bases: Map[String, Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string file_path, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "file_base_row_id"

  @transient private lazy val javaMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](bases.size * 2)
    bases.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  override def nullSafeEval(path: Any): Any =
    FileBaseRowId.base(javaMap, path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("baseMap", javaMap,
      classOf[java.util.HashMap[String, java.lang.Long]].getName)
    nullSafeCodeGen(ctx, ev, p => s"""
      java.lang.Long b = graft.sql.FileBaseRowId.base($mapRef, $p);
      if (b == null) { ${ev.isNull} = true; } else { ${ev.value} = b.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): FileBaseRowId =
    copy(child = newChild)
}

object FileBaseRowId {

  // per-thread (map, path, base) cache: the key derivation and hash lookup
  // run once per distinct file per thread, not per row. Weak refs on the
  // map so a pooled executor thread never retains a finished query's state
  // (the DvRowDeleted lifecycle discipline).
  private val lastFile =
    new ThreadLocal[(java.lang.ref.WeakReference[java.util.HashMap[String, java.lang.Long]],
      UTF8String, java.lang.Long)]()

  def base(map: java.util.HashMap[String, java.lang.Long],
      path: UTF8String): java.lang.Long = {
    val e = lastFile.get()
    if (e != null && (e._1.get() eq map) && e._2.equals(path)) return e._3
    val b = map.get(DvRowDeleted.relPathKey(path.toString))
    lastFile.set((new java.lang.ref.WeakReference(map), path.clone(), b))
    b
  }
}
