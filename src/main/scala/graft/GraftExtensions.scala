package graft

import graft.functions.{ArrayDotProduct, ArraySqDist, CharNgrams, KmvDistinct, KmvHash, PngIhdr, RollingHash, ShingleHashSet, SimHash64, SortedIntersectCount, TokenStats, WordNgrams}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the graft expressions (SURVEY §2.7: a
  * FunctionRegistry thin wrapper instead of custom UDT/strategy work).
  *
  * Two entry points:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` registers the
  *    functions at session build (the standard extension mechanism);
  *  - programmatic: `GraftExtensions.registerAll(spark)` for an already
  *    running session.
  *
  * After either, plain SQL can call `graft_rolling_hash(text)`,
  * `graft_simhash64(tokens)`, `graft_array_dot(a, b)`,
  * `graft_sorted_intersect_count(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def unary(f: Expression => Expression): Seq[Expression] => Expression =
    args => { require(args.length == 1, "expected 1 argument"); f(args.head) }
  private def binary(f: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    args => { require(args.length == 2, "expected 2 arguments"); f(args(0), args(1)) }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_rolling_hash",
      info("graft_rolling_hash", "polynomial rolling hash of a string, mod 1e9+7"),
      unary(RollingHash)),
    ("graft_simhash64",
      info("graft_simhash64", "64-bit SimHash sketch of a token array"),
      unary(SimHash64)),
    ("graft_array_dot",
      info("graft_array_dot", "sequential-fold dot product of two double arrays"),
      binary(ArrayDotProduct)),
    ("graft_array_sqdist",
      info("graft_array_sqdist", "sequential-fold squared L2 distance of two double arrays"),
      binary(ArraySqDist)),
    ("graft_sorted_intersect_count",
      info("graft_sorted_intersect_count",
        "intersection size of two ascending-sorted bigint arrays"),
      binary(SortedIntersectCount)),
    ("graft_shingle_hash_set",
      info("graft_shingle_hash_set",
        "sorted distinct rolling hashes of word n-gram shingles (n literal)"),
      args => {
        require(args.length == 2, "expected (tokens, n)")
        ShingleHashSet(args.head, litInt(args(1)))
      }),
    ("graft_char_ngrams",
      info("graft_char_ngrams", "all character n-grams of a string (n literal)"),
      args => {
        require(args.length == 2, "expected (string, n)")
        CharNgrams(args.head, litInt(args(1)))
      }),
    ("graft_word_ngrams",
      info("graft_word_ngrams", "word n-grams of a string, with repeats (n literal)"),
      args => {
        require(args.length == 2, "expected (string, n)")
        WordNgrams(args.head, litInt(args(1)))
      }),
    ("graft_token_stats",
      info("graft_token_stats",
        "fused token statistics struct(tc, sc, cl, bpe) with the standard stopword set"),
      unary(e => TokenStats(e, graft.ops.TextAnalysis.Stopwords))),
    ("graft_kmv_hash",
      info("graft_kmv_hash", "KMV sketch hash of a string, uniform in [0, 2^63)"),
      unary(KmvHash)),
    ("graft_png_ihdr",
      info("graft_png_ihdr",
        "PNG IHDR header decode: struct(width, height, bit_depth, color_type), null for non-PNG bytes"),
      unary(PngIhdr)),
    ("graft_kmv_distinct",
      info("graft_kmv_distinct",
        "KMV distinct-count sketch aggregate over kmv hashes (k literal): struct(kth, est)"),
      args => {
        require(args.length == 2, "expected (hash, k)")
        KmvDistinct(args.head, litInt(args(1))).toAggregateExpression()
      }))

  private def litInt(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
  }

  /** Register into a live session (temp functions, session-scoped). */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, i, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
