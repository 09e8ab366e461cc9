package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine extension wiring (`spark.sql.extensions=graft.sql.GraftExtensions`):
  * registers the native expressions with the function registry so they are
  * first-class in SQL text as well as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => ShingleHashes(s, 5)
        case Seq(s, Literal(n: Int, _)) => ShingleHashes(s, n)
        case other => throw new IllegalArgumentException(
          s"shingle_hashes(str[, n literal int]); got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(h) => MinHashSignature(h,
          graft.sql.Defaults.MinhashA, graft.sql.Defaults.MinhashB)
        case other => throw new IllegalArgumentException(
          s"minhash_signature(array<bigint>); got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_band_keys"),
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "minhash_band_keys"),
      (args: Seq[Expression]) => args match {
        case Seq(h) => MinHashBandKeys(h,
          graft.sql.Defaults.MinhashA, graft.sql.Defaults.MinhashB, rowsPerBand = 4)
        case other => throw new IllegalArgumentException(
          s"minhash_band_keys(array<bigint>); got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_from_tokens"),
      new ExpressionInfo(classOf[SimHashFromTokens].getName, "simhash_from_tokens"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHashFromTokens(t)
        case other => throw new IllegalArgumentException(
          s"simhash_from_tokens(array<string>); got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "token_counts"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => TokenCounts(t)
        case other => throw new IllegalArgumentException(
          s"token_counts(array<string>); got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => FloatVecDot(a, b)
        case other => throw new IllegalArgumentException(
          s"float_vec_dot(array<float>, array<float>); got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => SortedIntersectSize(a, b)
        case other => throw new IllegalArgumentException(
          s"sorted_intersect_size(array<bigint>, array<bigint>); got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("sentence_split"),
      new ExpressionInfo(classOf[SentenceSplit].getName, "sentence_split"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => SentenceSplit(s)
        case other => throw new IllegalArgumentException(
          s"sentence_split(str); got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("cdc_chunk_hashes"),
      new ExpressionInfo(classOf[CdcChunkHashes].getName, "cdc_chunk_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => CdcChunkHashes(s, 16, 64L)
        case Seq(s, Literal(w: Int, _), Literal(d: Int, _)) => CdcChunkHashes(s, w, d.toLong)
        case other => throw new IllegalArgumentException(
          s"cdc_chunk_hashes(str[, window literal int, divisor literal int]); got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("hashed_linear_score"),
      new ExpressionInfo(classOf[HashedLinearScore].getName, "hashed_linear_score"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => HashedLinearScore(t, 1024)
        case Seq(t, Literal(d: Int, _)) => HashedLinearScore(t, d)
        case other => throw new IllegalArgumentException(
          s"hashed_linear_score(array<string>[, dim literal int]); got ${other.size} args")
      }))
    // aggregates: the analyzer wraps a bare AggregateFunction returned by a
    // registry builder in its AggregateExpression, same as the built-ins
    ext.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (args: Seq[Expression]) => args match {
        case Seq(c, Literal(k: Int, _)) => MisraGries(c, k)
        case other => throw new IllegalArgumentException(
          s"misra_gries(str_expr, k literal int); got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("count_min_sketch"),
      new ExpressionInfo(classOf[CountMinSketch].getName, "count_min_sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(c, Literal(d: Int, _), Literal(w: Int, _)) => CountMinSketch(c, d, w)
        case other => throw new IllegalArgumentException(
          s"count_min_sketch(str_expr, depth literal int, width literal int); got ${other.size} args")
      }))
    // Spark's own runtime-filter bloom pair, absent from the stock registry
    ext.injectFunction((
      new FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, items) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, items)
        case Seq(c, items, bits) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, items, bits)
        case other => throw new IllegalArgumentException(
          s"bloom_filter_agg(xxhash64_long[, items[, bits]]); got ${other.size} args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (args: Seq[Expression]) => args match {
        case Seq(bf, v) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(bf, v)
        case other => throw new IllegalArgumentException(
          s"might_contain(sketch binary, xxhash64_long); got ${other.size} args")
      }))
  }
}
