package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional 3rd arg: comma-separated query names (fast iteration)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val spark = Graft.session(appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // Dump TIMESTAMP (instant) columns as TIMESTAMP_NTZ wall-clock-in-UTC:
      // NTZ parquet is µs with no UTC-adjustment annotation, which every
      // reader (pyarrow, DuckDB) decodes as naive microseconds — the SCD2
      // sentinel 9999-12-31 23:59:59.999999 survives exactly (INT96 wraps in
      // ns readers) and no reader re-renders values as "+00:00"-suffixed
      // instants (µs-LTZ parquet does, and the oracle side is naive).
      // Session timezone is pinned UTC, so the cast is value-preserving.
      try {
        val df = fn(spark, sfDir)
        val dumped = df.schema.fields.filter(_.dataType == TimestampType)
          .foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast(TimestampNTZType)))
        dumped.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
