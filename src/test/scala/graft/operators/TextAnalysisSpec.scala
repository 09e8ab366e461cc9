package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenizer drops empty tokens and counts correctly") {
    val df = Seq("  hello   world  ", "", "one").toDF("text")
    val counts = df.select(TextAnalysis.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(counts.toSeq == Seq(2, 0, 1))
  }

  test("array_remove tokenizer is value-identical to the HOF filter spelling") {
    // tokens() moved from the interpreted filter(split, _ =!= "") HOF to
    // codegen'd array_remove(split, "") — equivalence must hold on every
    // whitespace shape (leading/trailing/mixed/tabs/newlines/only-ws)
    val df = Seq(
      "", " ", "\t\n", "a", " a", "a ", "  a  b  ", "a\tb\nc", "a  b",
      "wörd ünïcode  mix", "trailing newline\n").toDF("text")
    val cmp = df.select(
      TextAnalysis.tokens(col("text")).as("fast"),
      filter(split(col("text"), "\\s+"), t => t =!= lit("")).as("hof"))
    cmp.collect().foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("language id picks the dominant stopword list; und when nothing matches") {
    val df = Seq(
      ("the cat sat on the mat and it is fine", "en"),
      ("el gato es de la casa y se fue", "es"),
      ("der hund ist ein tier und das ist gut", "de"),
      ("le chat est dans la maison et les oiseaux", "fr"),
      ("zzz qqq xxx", "und")
    ).toDF("text", "expected")
    val got = df.select(TextAnalysis.langId(col("text")).as("got"), col("expected")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("quality score is bounded in [0,1] and favors natural prose") {
    val df = Seq(
      "the cat is on the mat and it is a fine day for all of us to be here",
      ";;;;;;;!!!!???..."
    ).toDF("text")
    val scores = df.select(TextAnalysis.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("fingerprint is whitespace- and case-insensitive") {
    val df = Seq(("a  B\tc", "A B C"), ("x", "y")).toDF("t1", "t2")
    val eq = df.select(
      (TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(col("t2"))).as("same"))
      .collect().map(_.getBoolean(0))
    assert(eq.toSeq == Seq(true, false))
  }
}
