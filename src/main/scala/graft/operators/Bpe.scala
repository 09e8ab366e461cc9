package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE tokenizer training (Sennrich et al. 2016): learn the
  * merge table from corpus statistics. Each merge round is ONE distributed
  * pair-count aggregation (map-side combined, vocabulary²-bounded — tiny
  * next to the corpus) plus a per-row merge application; only the single
  * winning pair crosses to the driver per round. The corpus of symbol
  * sequences persists between rounds and is re-derived incrementally, so
  * round cost is a cached-scan + small shuffle, not a re-tokenize.
  *
  * Word-level pre-tokenization (whitespace), character-level start symbols
  * with a `</w>` end-of-word marker — the original BPE recipe. Ties break
  * deterministically by (count DESC, left ASC, right ASC), making the merge
  * sequence a pure function of the corpus — engine/partitioning/rerun
  * invariant (the spec replays it against an independent local trainer).
  *
  * 100 TB posture: tokenizer training conventionally runs on a sampled
  * subset (hash-sample the corpus with [[Curation.hashSample]] first); the
  * learned merges then broadcast to encode the full corpus. The loop here
  * is the sampled-subset trainer, distributed so "sampled" can still be
  * billions of words.
  */
object Bpe {

  /** One learned merge: rank order, the adjacent pair joined, and the
    * pair's corpus frequency when it won. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Apply one merge (left, right) → left+right over a symbol sequence,
    * left-to-right non-overlapping — the standard BPE apply step. */
  private[operators] def applyMerge(sym: IndexedSeq[String], left: String, right: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == left && sym(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += sym(i)
        i += 1
      }
    }
    out.toIndexedSeq
  }

  /** Learn `numMerges` merges from `textCol` of `docs`. Stops early when no
    * pair occurs at least `minFreq` times. */
  def train(docs: DataFrame, textCol: String, numMerges: Int, minFreq: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var corpus: Dataset[Seq[String]] = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .as[String]
      .map(w => (w.map(_.toString) :+ "</w>"): Seq[String])
    corpus.persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val best = corpus
        .flatMap(sym => sym.iterator.sliding(2).withPartial(false)
          .map(p => (p.head, p(1))))
        .toDF("left", "right")
        .groupBy("left", "right").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("left"), col("right"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      best.headOption.filter(_._3 >= minFreq) match {
        case Some((l, r, f)) =>
          merges += Merge(rank, l, r, f)
          val next = corpus.map(s => applyMerge(s.toIndexedSeq, l, r): Seq[String])
          next.persist(StorageLevel.MEMORY_AND_DISK)
          next.count() // materialize before dropping the parent
          corpus.unpersist()
          corpus = next
          rank += 1
        case None => done = true
      }
    }
    corpus.unpersist()
    merges.toSeq
  }

  /** Encode `textCol` with a learned merge table: per-row application of
    * the merges in rank order (broadcast-sized table, map-only — this is
    * the full-corpus pass that scales independently of training). Output:
    * original columns + `bpe_tokens array<string>`. */
  def encode(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val bc = spark.sparkContext.broadcast(ordered)
    val enc = udf { (text: String) =>
      val toks = Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty)
      toks.flatMap { w =>
        var sym: IndexedSeq[String] = w.map(_.toString) :+ "</w>"
        bc.value.foreach { case (l, r) => sym = applyMerge(sym, l, r) }
        sym
      }.toSeq
    }
    docs.withColumn("bpe_tokens", enc(col(textCol)))
  }
}
