package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of which 90% share ONE key — the hot-key shape that melts a
  // plain shuffle join partition
  private lazy val big = (1 to 10000).map { i =>
    (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong)
  }.toDF("key", "payload")
  private lazy val small = (Seq("HOT") ++ (0 until 7).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("key", "dim_value")

  test("salted inner join is row-identical to the plain join") {
    val plain = big.join(small, Seq("key"), "inner")
      .orderBy("key", "payload").collect().toSeq
    val salted = SaltedJoin.join(big, small, "key", saltFactor = 8)
      .orderBy("key", "payload").collect().toSeq
    assert(salted == plain)
  }

  test("salted left join preserves unmatched rows with null dims") {
    val bigger = big.union(Seq(("NO_MATCH", 0L)).toDF("key", "payload"))
    val plain = bigger.join(small, Seq("key"), "left")
      .orderBy("key", "payload").collect().toSeq
    val salted = SaltedJoin.join(bigger, small, "key", saltFactor = 5, joinType = "left")
      .orderBy("key", "payload").collect().toSeq
    assert(salted == plain)
  }

  test("salt spreads even FULLY IDENTICAL hot rows, and their join is exact") {
    // the pathological shape: 10k byte-identical rows (no unique column) —
    // a deterministic row-hash salt would put them all in ONE salt bucket
    val identical = Seq.fill(10000)(("HOT", 1L)).toDF("key", "payload")
    val spread = identical
      .withColumn("__salt", floor(rand() * 8).cast("int"))
      .select("__salt").distinct().count()
    assert(spread == 8L, s"identical rows spread over $spread salts")
    // and the salted join of identical rows is still row-exact
    val out = SaltedJoin.join(identical, small, "key", saltFactor = 8)
    assert(out.count() == 10000L)
    assert(out.select("dim_value").distinct().collect().map(_.getString(0)).toSeq == Seq("dim0"))
  }
}
