package graft.queries

import graft.Graft.table
import org.apache.spark.sql.functions._

/** Binary-column queries over document bytes — the oracle-checkable half of
  * the multimodal surface (typed decode/feature plumbing lives in
  * `graft.multimodal` with its own spec; decoding is stubbed there because
  * this environment ships no codecs).
  */
object MultimodalQueries {

  /** Opaque binary handling: cast to bytes, octet length, content digest,
    * first byte — the operations a 100 TB binary-asset table needs pushed to
    * executors (never the driver). */
  val m01BinaryStats = GraftQuery(
    "m01_binary_stats",
    (s, dir) =>
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          octet_length(col("text").cast("binary")).as("n_bytes"),
          md5(col("text").cast("binary")).as("content_md5"),
          ascii(substring(col("text"), 1, 1)).cast("int").as("first_byte"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             md5(text) AS content_md5,
             CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte
      FROM documents
      ORDER BY doc_id"""))

  val all: Seq[GraftQuery] = Seq(m01BinaryStats)
}
