package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{TextFunctions, VectorFunctions}
import graft.plans.TopKStrategy

/** SparkSessionExtensions entry point: makes the graft engine a
  * first-class Spark extension —
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic
  *   // or spark.sql.extensions=graft.GraftExtensions  // config-driven
  *
  * Injects:
  *  - the TopKPerKey planning strategy (custom operator, graft.plans);
  *  - SQL-callable registrations of the native expressions, so a pure
  *    SQL user can write
  *    `SELECT cosine_sim(a.embedding, b.embedding) FROM ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def fn(name: String, builder: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name), builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectFunction(fn("cosine_sim",
      args => VectorFunctions.CosineSimilarity(args(0), args(1))))
    e.injectFunction(fn("dot_product",
      args => VectorFunctions.DotProduct(args(0), args(1))))
    e.injectFunction(fn("l2_norm",
      args => VectorFunctions.L2Norm(args(0))))
    e.injectFunction(fn("hyperplane_lsh",
      args => VectorFunctions.HyperplaneLsh(args(0),
        args(1).eval().asInstanceOf[Int])))
    e.injectFunction(fn("simhash64",
      args => TextFunctions.SimHash64(args(0))))
    e.injectFunction(fn("minhash_sig",
      args => TextFunctions.MinHashSignature(args(0),
        args(1).eval().asInstanceOf[Int])))
    e.injectFunction(fn("shingle_hashes",
      args => TextFunctions.ShingleHashes(args(0),
        args(1).eval().asInstanceOf[Int])))
    e.injectFunction(fn("positional_shingle_hashes",
      args => TextFunctions.PositionalShingleHashes(args(0),
        args(1).eval().asInstanceOf[Int])))
    e.injectFunction(fn("rolling_hash_min",
      args => TextFunctions.RollingHashMin(args(0),
        args(1).eval().asInstanceOf[Int])))
    e.injectFunction(fn("lang_id",
      args => TextFunctions.LangIdGuess(args(0))))
    e.injectFunction(fn("interleave_bits",
      args => graft.functions.LayoutFunctions.InterleaveBits(args(0), args(1))))
    e.injectFunction(fn("token_counts",
      args => TextFunctions.TokenCounts(args(0))))
    e.injectFunction(fn("deflate_ratio",
      args => TextFunctions.DeflateRatio(args(0))))
    e.injectFunction(fn("bigram_buckets",
      args => TextFunctions.BigramBuckets(args(0),
        args(1).eval().asInstanceOf[Int])))
    e.injectFunction(fn("quantize8",
      args => VectorFunctions.Quantize8(args(0))))
    e.injectFunction(fn("int8_cosine_sim",
      args => VectorFunctions.Int8CosineSim(args(0), args(1))))
    // aggregate: approx_top_k(col, k[, slack]) — literal ints
    e.injectFunction(fn("approx_top_k",
      args => (if (args.length > 2)
        graft.functions.AggFunctions.HeavyHittersAgg(args(0),
          args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])
      else // 2-arg form: the case class default owns the slack value
        graft.functions.AggFunctions.HeavyHittersAgg(args(0),
          args(1).eval().asInstanceOf[Int]))
        .toAggregateExpression()))
  }
}
