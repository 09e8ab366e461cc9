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

  test("salt actually spreads the hot key across partitions") {
    // after salting, the hot key's rows must occupy saltFactor distinct
    // (key, salt) shuffle keys rather than one
    val saltFactor = 8
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(saltFactor)))
    val spread = salted.filter(col("key") === "HOT")
      .select("__salt").distinct().count()
    assert(spread == saltFactor.toLong, s"hot key spread over $spread salts")
  }
}
