package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The count–min sketch is deterministic given the fixed hash family, so
  * everything is asserted exactly: the sketch array is a pure function of
  * the exact frequency table (independent of stream order AND merge tree),
  * and every estimate equals exact + its per-row minimum collision mass. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val Depth = 4
  private val Width = 32 // narrow on purpose: collisions guaranteed

  private def cms(c: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      CountMinSketch(org.apache.spark.sql.graft.ColumnShim.expression(c), Depth, Width)
        .toAggregateExpression())

  // Zipf-ish stream over a 120-token vocabulary (vocab >> width)
  private lazy val stream: Seq[String] =
    (1 to 120).flatMap(i => Seq.fill(math.ceil(240.0 / i).toInt)(s"tok$i"))

  private lazy val exact: Map[String, Long] =
    stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((acc, ch) => (acc * 31L + ch.toInt) % Defaults.P)

  private def bucket(i: Int, h: Long): Int =
    ((Defaults.MinhashA(i) * h + Defaults.MinhashB(i)) % Defaults.P % Width).toInt

  /** Independent reference sketch from the exact frequency table alone. */
  private lazy val refSketch: Array[Long] = {
    val arr = new Array[Long](Depth * Width)
    exact.foreach { case (t, c) =>
      val h = polyHash(t)
      (0 until Depth).foreach(i => arr(i * Width + bucket(i, h)) += c)
    }
    arr
  }

  private def sketchFor(partitions: Int): Array[Long] =
    stream.toDF("token").repartition(partitions)
      .agg(cms($"token").as("cms"))
      .select($"cms").as[Array[Long]].head()

  test("sketch equals the frequency-table reference under every merge tree") {
    for (p <- Seq(1, 7, 32)) {
      assert(sketchFor(p).sameElements(refSketch), s"p=$p: sketch differs from reference")
    }
  }

  test("estimates: never undercount, and equal exact + min collision mass") {
    val sketch = sketchFor(8)
    exact.foreach { case (t, f) =>
      val h = polyHash(t)
      val est = (0 until Depth).map(i => sketch(i * Width + bucket(i, h))).min
      assert(est >= f, s"$t: estimate $est < exact $f — CMS never undercounts")
      val collision = (0 until Depth).map { i =>
        exact.collect {
          case (u, c) if u != t && bucket(i, polyHash(u)) == bucket(i, h) => c
        }.sum
      }.min
      assert(est == f + collision, s"$t: est $est != exact $f + collision $collision")
    }
    // the narrow width must actually produce collisions, or the exactness
    // assertions above are vacuous
    assert(exact.exists { case (t, f) =>
      val h = polyHash(t)
      (0 until Depth).map(i => sketchFor(1)(i * Width + bucket(i, h))).min > f
    }, "no colliding term — widen the vocabulary or narrow the sketch")
  }

  test("count_min_sketch is callable from SQL text") {
    stream.toDF("token").createOrReplaceTempView("cms_stream")
    val arr = spark.sql(
      s"SELECT count_min_sketch(token, $Depth, $Width) AS s FROM cms_stream")
      .select($"s").as[Array[Long]].head()
    assert(arr.sameElements(refSketch))
  }
}
