package graft.queries

import graft.SparkSpec

/** Parity gate for the bench's at-rest probe variants: a `benchRun` must
  * return EXACTLY the rows of the oracle-checked `run` it stands in for —
  * otherwise the bench would be timing a different query than the one
  * correctness verifies. Covers every registered benchRun (s02 LSH
  * postings, s05 IVF index, s06 PQ codes) against the sf0.001 fixtures,
  * exercising both the build-and-cache path (first call) and the re-read
  * path (second call).
  */
class BenchIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  for (q <- graft.SparkEntry.registry.filter(_.benchRun.isDefined)) {
    test(s"${q.name}: benchRun (at-rest index probe) matches run row-for-row") {
      val expected = rows(q.run(spark, dir))
      assert(expected.nonEmpty, s"${q.name} run returned no rows")
      val first = rows(q.benchRun.get(spark, dir))   // builds + caches index
      val second = rows(q.benchRun.get(spark, dir))  // re-reads cached index
      assert(first == expected, s"${q.name} benchRun diverges from run")
      assert(second == expected, s"${q.name} cached-index benchRun diverges from run")
    }
  }
}
