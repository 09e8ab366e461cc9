package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CI proof that AQE's RUNTIME re-planning actually fires in this engine's
  * configuration — the runtime complement to PlanAuditSpec's static audits.
  * At 100 TB these are the mechanisms that absorb what static planning
  * cannot know: real key distributions (skew-join split) and real shuffle
  * sizes (partition coalescing). [[SaltedJoin]] remains the manual fallback
  * for aggregation skew, which AQE's join-time splitting does not cover.
  */
class AdaptiveSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0") {
      // one celebrity key carrying ~95% of the left side
      val big = spark.range(0, 200000)
        .select(when(col("id") < 190000, lit(0L)).otherwise(col("id")).as("k"),
          concat(lit("payload_"), col("id")).as("v"))
      val dim = spark.range(0, 11000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = big.join(dim, "k")
      // execute THIS plan (collect, not a derived count plan) so the
      // AdaptiveSparkPlan is final when inspected
      assert(joined.collect().length == 190000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${finalPlan.take(4000)}")
    }
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    // 32 configured shuffle partitions over ~200 tiny groups: bytes per
    // partition are far below the advisory size, so AQE fuses them
    val agg = spark.range(0, 1000)
      .select((col("id") % 200).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    assert(agg.collect().length == 200)
    val finalPlan = agg.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead coalesced"),
      s"no coalesced AQE shuffle read:\n${finalPlan.take(4000)}")
    val parts = agg.rdd.getNumPartitions
    val configured = spark.sessionState.conf.numShufflePartitions
    assert(parts < configured, s"still $parts partitions (configured $configured)")
  }

  test("runtime bloom filter from a selective dim prunes the fact scan side") {
    // The third runtime mechanism next to skew-split and coalesce: when a
    // dim carries a selective filter, the optimizer builds a bloom filter
    // over the dim's join keys at runtime and injects might_contain() on
    // the fact side BEFORE its shuffle — at 100 TB this is what keeps a
    // selective star join from shuffling the whole fact table. Thresholds
    // are lowered so the mechanism fires at test scale; files (not
    // LocalRelations) so the injection site is a real scan.
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloom_").toString
    spark.range(0, 200000)
      .select(col("id").as("k"), concat(lit("p"), col("id")).as("v"))
      .write.mode("overwrite").parquet(s"$tmp/fact")
    spark.range(0, 20000)
      .select(col("id").as("k"), (col("id") % 100).as("cat"))
      .write.mode("overwrite").parquet(s"$tmp/dim")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB") {
      val fact = spark.read.parquet(s"$tmp/fact")
      val dim = spark.read.parquet(s"$tmp/dim").filter(col("cat") === 7)
      val joined = fact.join(dim, "k")
      assert(joined.collect().length == 200)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("might_contain"),
        s"no runtime bloom filter injected:\n${finalPlan.take(4000)}")
    }
  }
}
