package graft.pipeline

/** Minimal immutable JSON tree + serializer for the driver-side API payload
  * plumbing (reference payloads are Python dicts serialized with
  * `json.dumps(payload, sort_keys=True)` — reference
  * `job_tasks/bronze/ingest_data_api_to_bronze.py:190`). Self-contained on
  * purpose: the payload builders are pure collection code, and the only JSON
  * *parsing* in the pipeline happens in Spark (`from_json` in silver), so a
  * serializer is all the Scala side needs.
  */
object Json {

  sealed trait JVal {
    /** Compact serialization; object keys sorted (reference parity). */
    def render: String = this match {
      case JNull => "null"
      case JBool(b) => if (b) "true" else "false"
      case JInt(n) => n.toString
      case JDouble(d) =>
        if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) s"${d.toLong}.0" else d.toString
      case JStr(s) => quote(s)
      case JArr(xs) => xs.map(_.render).mkString("[", ",", "]")
      case JObj(fields) =>
        fields.sortBy(_._1).map { case (k, v) => s"${quote(k)}:${v.render}" }
          .mkString("{", ",", "}")
    }
  }
  case object JNull extends JVal
  final case class JBool(b: Boolean) extends JVal
  final case class JInt(n: Long) extends JVal
  final case class JDouble(d: Double) extends JVal
  final case class JStr(s: String) extends JVal
  final case class JArr(xs: Seq[JVal]) extends JVal
  final case class JObj(fields: Seq[(String, JVal)]) extends JVal {
    def get(key: String): Option[JVal] = fields.collectFirst { case (`key`, v) => v }
    def apply(key: String): JVal = get(key).getOrElse(JNull)
  }

  object JObj {
    def of(fields: (String, JVal)*): JObj = JObj(fields.toVector)
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }
}
