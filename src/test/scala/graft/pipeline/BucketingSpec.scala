package graft.pipeline

import java.nio.file.Files

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: both sides written with the same bucketing
  * join WITHOUT a shuffle — the 100 TB technique for fact tables repeatedly
  * joined on a stable key. */
class BucketingSpec extends SparkSpec {

  private lazy val lake = new Lakehouse(spark, Files.createTempDirectory("graft-buckets").toString)

  test("join of two same-bucketed tables runs with zero exchanges") {
    val dir = "/root/testdata/sf0.001"
    val orders = Graft.table(spark, dir, "orders")
    val lineitem = Graft.table(spark, dir, "lineitem")
    lake.materializeBucketed("silver", "orders_b", orders, Seq("o_orderkey"), 8)
    lake.materializeBucketed("silver", "lineitem_b", lineitem
      .withColumnRenamed("l_orderkey", "o_orderkey"), Seq("o_orderkey"), 8)

    val joined = lake.bucketedTable("silver", "lineitem_b")
      .join(lake.bucketedTable("silver", "orders_b"), "o_orderkey")
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    // disable broadcast so the join would otherwise need a full shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side\n$plan")
      // the bucket-key aggregation rides the same distribution: no exchange
      assert(!plan.contains("Exchange"), plan)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed results equal the unbucketed join") {
    val dir = "/root/testdata/sf0.001"
    val expect = Graft.table(spark, dir, "lineitem")
      .join(Graft.table(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    val got = lake.bucketedTable("silver", "lineitem_b")
      .join(lake.bucketedTable("silver", "orders_b"), "o_orderkey")
      .count()
    assert(got == expect)
  }
}
