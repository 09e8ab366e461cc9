package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

import Fixtures.{d, ts}

/** Storage-layer behaviors: compaction (the OPTIMIZE parity op) and the
  * delete-everything edge of the idempotent re-run primitive. */
class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  test("compact rewrites a fragmented table to the target file count, data unchanged") {
    val lake = new Lakehouse(spark, Files.createTempDirectory("graft-compact").toString)
    // 40 tiny writes → a fragmented table (the small-files problem OPTIMIZE fixes)
    val df = (1 to 200).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(40)
    lake.materialize("silver", "frag", df)
    def partFiles = Files.list(Paths.get(lake.root, "silver", "frag")).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    assert(partFiles > 10, s"fixture not fragmented: $partFiles files")
    val before = lake.table("silver", "frag").orderBy("id").collect().toSeq
    lake.compact("silver", "frag", numFiles = 2)
    assert(partFiles <= 2, s"compaction left $partFiles files")
    assert(lake.table("silver", "frag").orderBy("id").collect().toSeq == before)
  }

  test("deleteByRunId that removes every row leaves a readable empty table") {
    val lake = new Lakehouse(spark, Files.createTempDirectory("graft-delall").toString)
    val ctx = Bronze.RunContext("only-run", "r1", d("2025-06-01"), ts("2025-06-01 10:00:00"))
    Bronze.ingest(lake, ctx, _ => Map("channels_raw" -> Seq("""{"items": []}""")))
    assert(lake.table("bronze", "channels_raw").count() == 1)
    // the run covered ALL rows: a partitioned empty rewrite would leave an
    // unreadable directory (no data files to infer a schema from)
    lake.deleteByRunId("channels_raw", "only-run")
    val t = lake.table("bronze", "channels_raw")
    assert(t.count() == 0)
    assert(t.columns.contains("payload") && t.columns.contains("snapshot_date"))
    // and the table keeps accepting appends afterwards
    val ctx2 = Bronze.RunContext("run2", "r2", d("2025-06-02"), ts("2025-06-02 10:00:00"))
    Bronze.ingest(lake, ctx2, _ => Map("channels_raw" -> Seq("""{"items": []}""")))
    assert(lake.table("bronze", "channels_raw").count() == 1)
  }

  test("schema override re-points a logical layer at a different physical schema") {
    // dbt-style indirection (reference dbt/models/schema.yml): the same code
    // writes to silver_dev when the override is set, silver when it isn't —
    // and the two tables are independent
    val root = Files.createTempDirectory("graft-schema").toString
    val dev = new Lakehouse(spark, root, Map("silver" -> "silver_dev"))
    val prod = new Lakehouse(spark, root)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    dev.materialize("silver", "t", df)
    assert(Files.exists(Paths.get(root, "silver_dev", "t")))
    assert(!Files.exists(Paths.get(root, "silver", "t")))
    assert(dev.table("silver", "t").count() == 2)
    assert(dev.exists("silver", "t") && !prod.exists("silver", "t"))
    prod.materialize("silver", "t", df.limit(1))
    assert(prod.table("silver", "t").count() == 1)
    assert(dev.table("silver", "t").count() == 2)
  }

  test("envSchemaOverrides parses GRAFT_SCHEMA_* vars, ignoring unset layers") {
    val env = Map("GRAFT_SCHEMA_SILVER" -> "silver_ci", "GRAFT_SCHEMA_GOLD" -> "gold_blue")
    assert(Lakehouse.envSchemaOverrides(env.get) ==
      Map("silver" -> "silver_ci", "gold" -> "gold_blue"))
    assert(Lakehouse.envSchemaOverrides(_ => None) == Map.empty)
  }
}
