package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent in-memory BPE trainer (textbook implementation, no shared
    * code with the operator beyond the task definition). */
  private def refTrain(words: Seq[String], n: Int, minFreq: Long = 2L): Seq[(String, String, Long)] = {
    var corpus: Seq[IndexedSeq[String]] = words.map(w => (w.map(_.toString) :+ "</w>").toIndexedSeq)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (out.size < n && continue) {
      val counts = corpus.flatMap(_.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val best = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minFreq =>
          out += ((l, r, c))
          corpus = corpus.map { sym =>
            val b = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < sym.length) {
              if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) { b += l + r; i += 2 }
              else { b += sym(i); i += 1 }
            }
            b.toIndexedSeq
          }
        case _ => continue = false
      }
    }
    out.toSeq
  }

  test("distributed trainer replays the textbook merge sequence (ties and all)") {
    val text = "low low low low low lower lower newest newest newest newest newest newest widest widest widest"
    val df = Seq(text).toDF("text")
    val got = Bpe.train(df, "text", numMerges = 8)
      .map(m => (m.left, m.right, m.freq))
    val want = refTrain(text.split(" ").toSeq, 8)
    assert(got == want, s"\ngot  $got\nwant $want")
    // the classic corpus learns 'est</w>' early (newest+widest dominate)
    assert(got.exists { case (l, r, _) => l + r == "est</w>" || l + r == "est" })
  }

  test("trainer stops when no pair reaches minFreq; unique-word corpus learns nothing") {
    val df = Seq("abc def ghi").toDF("text")
    assert(Bpe.train(df, "text", numMerges = 5).isEmpty)
  }

  test("encode applies merges in rank order and reconstructs words on join") {
    val train = Seq("banana banana banana bandana").toDF("text")
    val merges = Bpe.train(train, "text", numMerges = 6)
    assert(merges.nonEmpty)
    val enc = Bpe.encode(Seq((1L, "banana bandana"), (2L, "")).toDF("id", "text"), "text", merges)
      .select("id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    // lossless: stripping merge structure recovers the original words
    val rebuilt = enc(1L).mkString.split("</w>").filter(_.nonEmpty).toSeq
    assert(rebuilt == Seq("banana", "bandana"))
    assert(enc(2L).isEmpty)
    // compression: encoded symbol count is below character count
    assert(enc(1L).length < "banana bandana".replace(" ", "").length + 2)
  }
}
