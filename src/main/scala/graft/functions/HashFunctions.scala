package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic 64-bit integer mixing as a native expression.
  *
  * Exists because Spark 4 runs ANSI mode by default: the DataFrame `*`
  * operator THROWS on long overflow, but a cross-engine shuffle key
  * needs Java's wrapping mod-2⁶⁴ semantics — the same value DuckDB
  * reproduces with HUGEINT arithmetic (`(x*A + C) % 2^64`, probed
  * bit-identical in round 6), which is what makes seeded shuffles and
  * hash lotteries ORACLE-CHECKABLE instead of engine-private. */
object HashFunctions {

  /** lcg64(x): one 64-bit LCG step over `x + seed` (Knuth's MMIX
    * multiplier/increment) with wrapping arithmetic. Bijective on
    * Long — distinct ids never collide, so ordering by the key is a
    * permutation. Low bits are statistically weak (LCG); consumers
    * order by the full key or take the TOP bits. */
  case class Lcg64(child: Expression, seed: Long) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"lcg64 needs a bigint, got ${child.dataType.sql}")

    override def nullSafeEval(x: Any): Any =
      (x.asInstanceOf[Long] + seed) * 6364136223846793005L + 1442695040888963407L

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"($c + ${seed}L) * 6364136223846793005L + 1442695040888963407L")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "lcg64"
  }

  def lcg64(x: Column, seed: Long): Column =
    GraftColumn.apply(Lcg64(GraftColumn.expression(x), seed))
}
