package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive fixture readers: the driver regenerates the testdata
  * between rounds and has already re-encoded column types once (r05:
  * events `ts` TIMESTAMP(NANOS)→timestamp[us], which killed every events
  * query at ANALYSIS time). These tests pin that each reader normalizes
  * every encoding generation to the engine's canonical type, so a future
  * regen degrades to a visible value diff instead of a dead query.
  */
class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeEventTs: nanos-as-long, NTZ, and native timestamp all read identically") {
    val dir = Files.createTempDirectory("graft-ts").toString
    // 2025-06-01 12:00:00.123456 UTC, expressed three ways
    val micros = 1748779200123456L
    Seq(micros * 1000).toDF("ts").write.parquet(s"$dir/longs")
    val asLong = Graft.normalizeEventTs(spark.read.parquet(s"$dir/longs"))
    Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$dir/ntz")
    val asNtz = Graft.normalizeEventTs(spark.read.parquet(s"$dir/ntz"))
    val asTs = Graft.normalizeEventTs(
      Seq(micros).toDF("us").select(timestamp_micros(col("us")).as("ts")))
    for (df <- Seq(asLong, asNtz, asTs)) {
      assert(df.schema("ts").dataType == TimestampType, df.schema)
      assert(df.select(unix_micros(col("ts"))).as[Long].head() == micros)
    }
  }

  test("embeddingsTable: a float64-encoded vector column normalizes to array<float>") {
    val dir = Files.createTempDirectory("graft-emb").toString
    Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(0.5, 0.25, 0.125)))
      .toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val df = Graft.table(spark, dir, "embeddings")
    assert(df.schema("embedding").dataType == ArrayType(FloatType, containsNull = true)
      || df.schema("embedding").dataType == ArrayType(FloatType, containsNull = false),
      df.schema)
    // the native float-vector expression family must accept the result
    val dot = df.filter(col("vec_id") === 1L)
      .select(graft.operators.Similarity.dot(col("embedding"), col("embedding")))
      .as[Double].head()
    assert(math.abs(dot - 14.0) < 1e-6)
  }

  test("embeddingsTable: the real fixture still reads as array<float> untouched") {
    val df = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    assert(df.schema("embedding").dataType.isInstanceOf[ArrayType])
    assert(df.schema("embedding").dataType.asInstanceOf[ArrayType].elementType == FloatType)
    assert(df.count() > 0)
  }
}
