package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Misra–Gries guarantees are deterministic, so they are asserted
  * exactly — over a Zipf-ish stream whose vocabulary (200) is far larger
  * than the counter budget (k=10), i.e. under constant eviction, and under
  * several partition layouts so the PODS-2012 merge rule is exercised with
  * different merge trees (estimates may shift between layouts; the BOUNDS
  * may not). */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def mg(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      MisraGries(org.apache.spark.sql.graft.ColumnShim.expression(c), k)
        .toAggregateExpression())

  private val K = 10

  // Zipf-ish: token i appears ceil(600/i) times, i = 1..200; N ≈ 3550.
  // Deterministic interleave (sort by md5 of (token, occurrence)) so the
  // stream order is fixed but heavy tokens are spread across the stream.
  private lazy val stream: Seq[String] =
    (1 to 200).flatMap(i => Seq.fill(math.ceil(600.0 / i).toInt)(s"tok$i"))
      .zipWithIndex
      .sortBy { case (t, j) => java.util.UUID.nameUUIDFromBytes(s"$t#$j".getBytes).toString }
      .map(_._1)

  private lazy val exact: Map[String, Long] =
    stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  private def summaryFor(partitions: Int): Map[String, Long] =
    stream.toDF("token").repartition(partitions)
      .agg(mg($"token", K).as("mg"))
      .select($"mg").as[Map[String, Long]].head()

  test("bounds hold under eviction pressure for every merge tree") {
    val n = stream.size.toLong
    val maxErr = n / (K + 1) // estimate may undercount by at most N/(k+1)
    for (p <- Seq(1, 7, 32)) {
      val summary = summaryFor(p)
      assert(summary.size <= K, s"p=$p: ${summary.size} counters > k=$K")
      summary.foreach { case (t, est) =>
        val f = exact(t)
        assert(est <= f, s"p=$p: $t overcounted ($est > $f) — MG never overcounts")
        assert(est >= f - maxErr, s"p=$p: $t estimate $est below $f - $maxErr")
      }
      // completeness: every provably-heavy token is present
      exact.foreach { case (t, f) =>
        if (f * (K + 1) > n)
          assert(summary.contains(t), s"p=$p: heavy hitter $t (f=$f > N/${K + 1}) missing")
      }
    }
  }

  test("small vocabularies fit entirely and count exactly") {
    // vocab 3 ≤ k: no evictions ever fire, so MG degenerates to exact counts
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("token")
    val summary = df.repartition(4).agg(mg($"token", K).as("mg"))
      .select($"mg").as[Map[String, Long]].head()
    assert(summary == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("null inputs are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("token")
    val summary = df.agg(mg($"token", K).as("mg"))
      .select($"mg").as[Map[String, Long]].head()
    assert(summary == Map("a" -> 2L, "b" -> 1L))
  }
}
