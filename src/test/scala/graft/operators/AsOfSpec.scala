package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")), // before any right row
    (2L, 10L, ts("2024-01-01 12:00:00")), // exactly at right r1 (inclusive)
    (3L, 10L, ts("2024-01-01 15:00:00")), // between r1 and r2
    (4L, 10L, ts("2024-01-02 00:00:00")), // after r2
    (5L, 99L, ts("2024-01-01 12:00:00"))  // key with no right rows
  ).toDF("event_id", "user_id", "ts")

  private lazy val right = Seq(
    (101L, 10L, ts("2024-01-01 12:00:00"), "r1"),
    (102L, 10L, ts("2024-01-01 18:00:00"), "r2")
  ).toDF("ref_id", "user_id", "ref_ts", "tag")

  private lazy val joined = AsOf.join(left, right, key = "user_id",
    leftTime = "ts", rightTime = "ref_ts", tieCol = "ref_id",
    payload = Seq("ref_id", "tag"))
    .collect().map(r => r.getAs[Long]("event_id") ->
      (Option(r.getAs[java.lang.Long]("asof_ref_id")).map(_.toLong), r.getAs[String]("asof_tag")))
    .toMap

  test("probe before any reference row gets nulls") {
    assert(joined(1L) == ((None, null)))
  }

  test("as-of is inclusive: probe at exactly the reference timestamp matches it") {
    assert(joined(2L) == ((Some(101L), "r1")))
  }

  test("probe between reference rows picks the latest at-or-before") {
    assert(joined(3L) == ((Some(101L), "r1")))
    assert(joined(4L) == ((Some(102L), "r2")))
  }

  test("key with no reference rows yields nulls, not dropped rows") {
    assert(joined.contains(5L))
    assert(joined(5L) == ((None, null)))
  }

  test("equal-timestamp reference ties resolve to the highest tie column (last wins)") {
    val dupRight = right.unionByName(
      Seq((103L, 10L, ts("2024-01-01 12:00:00"), "r1b")).toDF("ref_id", "user_id", "ref_ts", "tag"))
    val j = AsOf.join(left, dupRight, "user_id", "ts", "ref_ts", "ref_id", Seq("ref_id", "tag"))
      .filter(col("event_id") === 2L).collect().head
    assert(j.getAs[Long]("asof_ref_id") == 103L)
    assert(j.getAs[String]("asof_tag") == "r1b")
  }
}
