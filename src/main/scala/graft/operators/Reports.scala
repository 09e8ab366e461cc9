package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance for corpus-level reports (the c27 dataset-card
  * statistics) — the 100 TB shape: the standing corpus is NEVER rescanned.
  *
  * The at-rest state is one count index with a row per distinct
  * `(source, lang, fp, n_tok)` combination (fp = the d01 normalized-text
  * fingerprint, n_tok = whitespace token count). Every report statistic is
  * derivable from it exactly:
  *
  *   - doc/token volume: frequency-weighted sums;
  *   - exact-dup rate: distinct fp count vs weighted doc count;
  *   - language breadth: distinct lang per source;
  *   - token-length mean AND the exact interpolated median: n_tok is a
  *     bounded small-int domain, so the index doubles as an exact
  *     per-source histogram (`percentile(n_tok, 0.5, cnt)` — frequency-
  *     weighted, identical to the percentile over the expanded corpus).
  *
  * Index maintenance is a pure COUNT MERGE: `merge(standing, fresh-batch
  * index)` is one union + re-aggregate on the index's own (tiny) key space
  * — associative and commutative, so batches can land in any grouping/order
  * (the ReportsSpec pins merge-equals-rebuild and report-equals-c27).
  * A streaming deployment folds this into foreachBatch exactly like
  * `Streams.nearDupGate` maintains the LSH index.
  */
object Reports {

  /** Build the count index from a documents frame: one shuffle, grouped on
    * the index key; output size is bounded by the distinct-combination
    * count, not the corpus. */
  def corpusReportIndex(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("lang"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tok"))
      .groupBy(col("source"), col("lang"), col("fp"), col("n_tok"))
      .agg(count(lit(1)).as("cnt"))

  /** Fold a fresh batch into the standing index — the only work a refresh
    * does. Union + re-aggregate on the index key: cost scales with
    * |standing index| + |batch|, never the standing corpus. */
  def mergeCorpusReportIndex(standing: DataFrame, freshDocs: DataFrame): DataFrame =
    standing.unionByName(corpusReportIndex(freshDocs))
      .groupBy(col("source"), col("lang"), col("fp"), col("n_tok"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Derive the c27 report from the index — must equal
    * `c27_corpus_report` over the corresponding corpus EXACTLY (spec-pinned):
    * same column names, same rounding, same exact interpolated median via
    * the frequency-weighted percentile. */
  def corpusReportFromIndex(index: DataFrame): DataFrame =
    index.groupBy(col("source"))
      .agg(
        sum(col("cnt")).as("n_docs"),
        sum(col("n_tok") * col("cnt")).as("n_tokens"),
        round(sum(col("n_tok") * col("cnt")).cast("double")
          / sum(col("cnt")).cast("double"), 6).as("mean_tokens"),
        round(percentile(col("n_tok"), lit(0.5), col("cnt")), 6).as("p50_tokens"),
        round((sum(col("cnt")) - countDistinct(col("fp"))).cast("double")
          / sum(col("cnt")).cast("double"), 6).as("exact_dup_rate"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("source"))
}
